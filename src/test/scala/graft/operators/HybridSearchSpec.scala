package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Reciprocal rank fusion: rank arithmetic, one-list-only candidates,
  * and tie-breaking — the fusion layer under the oracle-pinned l40. */
class HybridSearchSpec extends SparkSpecBase {
  import spark.implicits._

  test("rrfFuse: overlap sums both terms, one-list candidates keep one, " +
    "ties break on id") {
    val lex = Seq((10L, 5.0), (20L, 4.0), (30L, 3.0)).toDF("doc_id", "score")
    val vec = Seq((20L, 0.9), (40L, 0.8)).toDF("vec_id", "sim")
    val got = HybridSearch
      .rrfFuse(lex, "doc_id", "score", vec, "vec_id", "sim", k = 10)
      .select("id", "rrf").as[(Long, Double)].collect().toMap
    def t(r: Int): Double =
      BigDecimal(1.0 / (60 + r)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    assert(got(20L) == t(2) + t(1), "doc 20: lex rank 2 + vec rank 1")
    assert(got(10L) == t(1) && got(30L) == t(3) && got(40L) == t(2))
    // 20 (two lists) outranks everything; 10 and 40 tie-free ordering
    val order = HybridSearch
      .rrfFuse(lex, "doc_id", "score", vec, "vec_id", "sim", k = 10)
      .select("id").as[Long].collect().toSeq
    assert(order.head == 20L)
    // equal scores in one list: rank (and thus rrf) breaks ties on id
    val tied = Seq((2L, 1.0), (1L, 1.0)).toDF("doc_id", "score")
    val empty = Seq.empty[(Long, Double)].toDF("vec_id", "sim")
    val ranks = HybridSearch
      .rrfFuse(tied, "doc_id", "score", empty, "vec_id", "sim", k = 10)
      .select("id", "lex_rank").as[(Long, Int)].collect().toMap
    assert(ranks(1L) == 1 && ranks(2L) == 2)
  }
}
