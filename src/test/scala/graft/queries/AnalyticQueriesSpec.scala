package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Lake

class AnalyticQueriesSpec extends SparkSpecBase {

  test("approx_percentile tracks exact percentile within 1% (scale path)") {
    val rows = Lake.table(spark, sf0001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_extendedprice"), lit(0.5)).as("exact"),
        approx_percentile(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getDouble(1); val a = r.getDouble(2)
      assert(math.abs(a - e) / e <= 0.01, s"flag ${r.get(0)}: $a vs $e")
    }
  }

  test("pivot emits zero (not null) for empty cells") {
    val out = AnalyticQueries.a7Pivot(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach(r => (1 until r.length).foreach(i => assert(!r.isNullAt(i))))
  }

  test("unpivot is the exact inverse shape of the wide aggregate") {
    val wide = Lake.table(spark, sf0001, "lineitem")
      .select(col("l_returnflag")).distinct().count()
    assert(AnalyticQueries.a9Unpivot(spark, sf0001).count() === wide * 2)
  }

  test("a11 integer-sum corr/stddev equal the built-in aggregates") {
    val formula = AnalyticQueries.a11Stats(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val builtin = Lake.table(spark, sf0001, "events")
      .select(col("event_type"),
        (round(col("value") * 100) / 100.0).as("v"), col("user_id").as("y"))
      .groupBy(col("event_type"))
      .agg(corr(col("v"), col("y")).as("c"), stddev_pop(col("v")).as("sd"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(formula.keySet === builtin.keySet)
    formula.foreach { case (k, (c, sd)) =>
      assert(math.abs(c - builtin(k)._1) < 1e-9, s"$k corr")
      assert(math.abs(sd - builtin(k)._2) < 1e-9, s"$k stddev")
    }
  }

  test("stratified sample hits every stratum near its fraction") {
    val out = AnalyticQueries.a10StratifiedSample(spark, sf0001).collect()
    assert(out.length === 5)
    out.foreach(r => assert(r.getBoolean(2), s"stratum ${r.getString(0)}"))
  }
}
