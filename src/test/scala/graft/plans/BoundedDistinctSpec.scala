package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Lake
import graft.crawler.Profiler

class BoundedDistinctSpec extends SparkSpecBase {

  test("exact below cap across many partitions (merge path)") {
    import spark.implicits._
    // 10k rows, 100 distinct keys, 8 partitions → partial sets must merge
    val df = spark.range(10000).repartition(8)
      .select((col("id") % 100).as("k"), concat(lit("v"), col("id") % 37).as("s"))
    val row = df.agg(
      BoundedDistinct.bounded_distinct(col("k"), 1000).as("bk"),
      BoundedDistinct.bounded_distinct(col("s"), 1000).as("bs")).head()
    assert(row.getLong(0) == 100L && row.getLong(1) == 37L)
  }

  test("null (overflow) once distinct exceeds cap; exact at cap boundary") {
    val df = spark.range(500).repartition(4).select(col("id"))
    val atCap = df.agg(BoundedDistinct.bounded_distinct(col("id"), 500)).head()
    assert(!atCap.isNullAt(0) && atCap.getLong(0) == 500L)
    val overCap = df.agg(BoundedDistinct.bounded_distinct(col("id"), 499)).head()
    assert(overCap.isNullAt(0), "over-cap distinct must degrade to null")
  }

  test("per-group, nulls skipped, works on array columns") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", None), ("b", Some(1L)))
      .toDF("g", "v")
    val rows = df.groupBy(col("g"))
      .agg(BoundedDistinct.bounded_distinct(col("v"), 10).as("d"))
      .orderBy(col("g")).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 2L), ("b", 1L)))
    val emb = Lake.table(spark, sf0001, "embeddings")
    val arr = emb.agg(BoundedDistinct.bounded_distinct(col("embedding"), 1000)).head()
    assert(arr.getLong(0) == 500L)
  }

  test("profiler is single-pass and degrades to HLL estimate over threshold") {
    val events = Lake.table(spark, sf0001, "events")
    // tiny threshold: event_id (1000 distinct) must overflow → HLL, inexact
    val profs = Profiler.profile(spark, events, "events", exactDistinctThreshold = 50)
    val byCol = profs.map(p => p.column -> p).toMap
    assert(!byCol("event_id").distinctIsExact)
    assert(byCol("event_id").ndistinct > 900 && byCol("event_id").ndistinct < 1100)
    // event_type (5 distinct) stays exact in the same pass
    assert(byCol("event_type").distinctIsExact && byCol("event_type").ndistinct == 5L)
  }
}
