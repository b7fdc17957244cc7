package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HYBRID retrieval: fuse a lexical (BM25) ranking and a vector
  * (cosine) ranking into one list by RECIPROCAL RANK FUSION —
  * `rrf(d) = Σ_lists 1 / (k0 + rank_d(list))` — the standard
  * RAG-retrieval shape (both signals matter; scores are incomparable
  * across systems, ranks are not).
  *
  * Scale shape: each candidate list is produced by its own
  * already-scalable retrieval path (term-pruned BM25 over the text
  * index, IVF/brute cosine over the vectors) and is top-`depth`
  * BOUNDED — the fusion below joins two ≤depth-row frames, so the
  * single-partition rank windows and the outer join are metadata-
  * scale by construction, never corpus-scale. At 100 TB the corpus
  * work lives entirely in the candidate generators.
  *
  * Determinism: ranks are taken over (score desc, id) with scores
  * 6dp-rounded by the generators, and each rank's RRF term is
  * 6dp-rounded and DECIMAL-summed — bit-exact against a SQL replay.
  */
object HybridSearch {

  /** Attach dense 1-based ranks to a (id, score) candidate list. */
  private def ranked(list: DataFrame, idCol: String,
      scoreCol: String): DataFrame =
    list.select(col(idCol).as("id"),
      row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol))).as("r"))

  /** Fuse two candidate lists (each `(idCol, scoreCol)`-shaped,
    * top-depth bounded) into the RRF top-`k`. Output: (id, rrf,
    * lex_rank, vec_rank) — null rank = absent from that list. */
  def rrfFuse(lex: DataFrame, lexId: String, lexScore: String,
      vec: DataFrame, vecId: String, vecScore: String,
      k: Int, k0: Int = 60): DataFrame = {
    val a = ranked(lex, lexId, lexScore).withColumnRenamed("r", "lex_rank")
    val b = ranked(vec, vecId, vecScore).withColumnRenamed("r", "vec_rank")
    def term(r: Column): Column =
      coalesce(round(lit(1.0) / (lit(k0) + r), 6), lit(0.0))
        .cast("decimal(18,6)")
    a.join(b, Seq("id"), "full_outer")
      .select(col("id"),
        (term(col("lex_rank")) + term(col("vec_rank")))
          .cast("double").as("rrf"),
        col("lex_rank"), col("vec_rank"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(k)
  }

  /** One-call hybrid: BM25 candidates from `docs` + cosine candidates
    * from `emb` (ids in the same space), RRF-fused top-`k`. `depth` is
    * the per-list candidate budget (the usual 2–5× k). */
  def hybridTopK(docs: DataFrame, idCol: String, textCol: String,
      emb: DataFrame, vecIdCol: String, vecCol: String,
      queryTerms: Seq[String], queryVec: Seq[Float],
      k: Int, depth: Int, k0: Int = 60): DataFrame = {
    val lex = Keywords.bm25TopK(docs, idCol, textCol, queryTerms, depth)
    val vec = Similarity.bruteTopK(emb, queryVec, depth,
      idCol = vecIdCol, vecCol = vecCol)
    rrfFuse(lex, "doc_id", "score", vec, vecIdCol, "sim", k, k0)
  }
}
