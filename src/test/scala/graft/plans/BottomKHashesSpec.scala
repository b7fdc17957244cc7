package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class BottomKHashesSpec extends SparkSpecBase {
  import spark.implicits._

  test("k smallest distinct values, independent of partitioning") {
    val data = (1L to 1000L) ++ (1L to 1000L) // duplicates everywhere
    val expected = (1L to 5L).toSeq
    Seq(1, 7, 32).foreach { parts =>
      val got = data.toDF("v").repartition(parts)
        .agg(BottomKHashes.bottom_k_hashes(col("v"), 5).as("s"))
        .head().getSeq[Long](0).toSeq
      assert(got == expected, s"parts=$parts")
    }
  }

  test("fewer than k distinct values → all of them, sorted") {
    val got = Seq(9L, 3L, 3L, 7L).toDF("v")
      .agg(BottomKHashes.bottom_k_hashes(col("v"), 10))
      .head().getSeq[Long](0).toSeq
    assert(got == Seq(3L, 7L, 9L))
  }

  test("nulls are ignored") {
    val got = Seq(Some(5L), None, Some(2L)).toDF("v")
      .agg(BottomKHashes.bottom_k_hashes(col("v"), 3))
      .head().getSeq[Long](0).toSeq
    assert(got == Seq(2L, 5L))
  }

  test("grouped sketches are per-group") {
    val got = Seq(("a", 1L), ("a", 2L), ("b", 9L)).toDF("g", "v")
      .groupBy("g").agg(BottomKHashes.bottom_k_hashes(col("v"), 2).as("s"))
      .orderBy("g").collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq)
    assert(got.toSeq == Seq("a" -> Seq(1L, 2L), "b" -> Seq(9L)))
  }
}
