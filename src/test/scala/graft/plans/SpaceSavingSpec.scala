package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class SpaceSavingSpec extends SparkSpecBase {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, cap: Int) =
    df.agg(SpaceSaving.space_saving(col("w"), cap).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.count"), col("e.error"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("capacity >= distinct items -> exact counts, zero error") {
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("w")
    val got = sketch(df, 10)
    assert(got === Map("a" -> (3L, 0L), "b" -> (2L, 0L), "c" -> (1L, 0L)))
  }

  test("guarantees hold in the approximate regime under any partitioning") {
    // Zipf-ish: item i appears ~ n/i times; 200 distinct, capacity 32.
    val rows = (1 to 200).flatMap(i => Seq.fill(4000 / i)(s"w$i"))
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val cap = 32
    for (parts <- Seq(1, 16)) {
      val got = sketch(rows.toDF("w").repartition(parts), cap)
      assert(got.size <= cap)
      // (1) every sketch estimate is an overcount bounded by its error
      got.foreach { case (item, (c, e)) =>
        val t = truth.getOrElse(item, 0L)
        assert(c >= t, s"$item undercounted: $c < $t (parts=$parts)")
        assert(c - e <= t, s"$item error bound broken: $c-$e > $t (parts=$parts)")
      }
      // (2) every item with true freq > n/cap is present
      truth.filter(_._2 > n / cap).keys.foreach { hh =>
        assert(got.contains(hh), s"heavy hitter $hh missing (parts=$parts)")
      }
    }
  }

  test("non-string input is rejected at analysis time") {
    val ex = intercept[Exception] {
      Seq(1L, 2L).toDF("w").agg(SpaceSaving.space_saving(col("w"), 4)).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("string") ||
      ex.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
