package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.plans.CountMinAgg.{cm_estimate, count_min_agg}

class CountMinSpec extends SparkSpecBase {
  import spark.implicits._

  test("wide sketch with few keys is exact") {
    val df = (Seq.fill(100)(1L) ++ Seq.fill(40)(2L) ++ Seq.fill(7)(3L)).toDF("k")
    val sk = df.agg(count_min_agg(col("k"), 1 << 14, 4).as("sk"))
    val est = Seq(1L, 2L, 3L, 999L).toDF("q").crossJoin(sk)
      .select(cm_estimate(col("sk"), col("q"), 1 << 14, 4)).as[Long].collect()
    assert(est.toSeq === Seq(100L, 40L, 7L, 0L))
  }

  test("distributed build == serial build (merge is elementwise add)") {
    val df = spark.range(0, 5000).select((col("id") % 97).as("k"))
    def sketch(d: org.apache.spark.sql.DataFrame) =
      d.agg(count_min_agg(col("k"), 256, 4)).head().getSeq[Long](0)
    assert(sketch(df.coalesce(1)) === sketch(df.repartition(11)))
  }

  test("estimate never undercounts, and overcount is within 3N/width") {
    val n = 20000L
    val df = spark.range(0, n).select((col("id") % 501).as("k")) // heavy collisions
    val width = 128 // much smaller than key count: forces collisions
    val sk = df.agg(count_min_agg(col("k"), width, 4).as("sk"))
    val exact = df.groupBy("k").agg(count(lit(1)).as("c"))
    val checked = exact.crossJoin(sk)
      .select(col("c"),
        cm_estimate(col("sk"), col("k"), width, 4).as("est"))
      .collect()
    val bound = 3 * n / width
    checked.foreach { r =>
      val (c, est) = (r.getLong(0), r.getLong(1))
      assert(est >= c, s"undercount: $est < $c")
      assert(est <= c + bound, s"overcount: $est > $c + $bound")
    }
  }

  test("per-group sketches are independent") {
    val df = Seq(("a", 1L), ("a", 1L), ("b", 1L)).toDF("g", "k")
    val out = df.groupBy("g")
      .agg(count_min_agg(col("k"), 64, 2).as("sk"))
      .select(col("g"), cm_estimate(col("sk"), lit(1L), 64, 2).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 2L, "b" -> 1L))
  }

  test("null keys are skipped, not counted") {
    val df = Seq(Option(5L), Option(5L), Option.empty[Long]).toDF("k")
    val est = df.agg(count_min_agg(col("k"), 64, 2).as("sk"))
      .select(cm_estimate(col("sk"), lit(5L), 64, 2)).as[Long].head()
    assert(est === 2L)
  }
}
