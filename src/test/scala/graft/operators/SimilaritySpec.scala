package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Lake

/** Exactness and recall properties for the similarity-search paths over
  * the sf0.001 embeddings (500 × 64-d float vectors).
  */
class SimilaritySpec extends SparkSpecBase {

  private lazy val emb = Lake.table(spark, sf0001, "embeddings")
  private lazy val query: Seq[Float] =
    emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0)
  private lazy val corpus = emb.filter(col("vec_id") =!= 0)

  test("bruteTopK returns k descending, ids unique") {
    val rows = Similarity.bruteTopK(corpus, query, 10).collect()
    assert(rows.length == 10)
    val sims = rows.map(_.getDouble(1))
    assert(sims.sameElements(sims.sorted.reverse))
    assert(rows.map(_.getLong(0)).distinct.length == 10)
  }

  test("lshTopK with full probing equals brute force exactly") {
    val brute = Similarity.bruteTopK(corpus, query, 10).collect().toSeq
    val full = Similarity.lshTopK(corpus, query, 10,
      bits = 8, probeHamming = 8).collect().toSeq
    assert(full == brute)
  }

  test("lshTopK partial probing has reasonable recall vs brute") {
    val brute = Similarity.bruteTopK(corpus, query, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.lshTopK(corpus, query, 10,
      bits = 8, probeHamming = 3).collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(approx).size / 10.0
    assert(recall >= 0.2, s"recall $recall")
  }

  test("ivfTopK probing all lists equals brute force exactly") {
    val brute = Similarity.bruteTopK(corpus, query, 10).collect().toSeq
    val ivf = Similarity.ivfTopK(corpus, query, 10,
      nlist = 4, nprobe = 4).collect().toSeq
    assert(ivf == brute)
  }

  test("topSimilarPairs is symmetric-free (a<b) and sorted") {
    val rows = Similarity.topSimilarPairs(emb, 15).collect()
    assert(rows.length == 15)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    val sims = rows.map(_.getDouble(2))
    assert(sims.sameElements(sims.sorted.reverse))
  }

  test("knnJoin per-query results equal bruteTopK run per query") {
    val queries = emb.filter(col("vec_id") < 3)
    val corpus = emb.filter(col("vec_id") >= 3)
    val joined = Similarity.knnJoin(queries, corpus, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val perQuery = (0L until 3L).flatMap { qid =>
      val qv = emb.filter(col("vec_id") === qid)
        .select(col("embedding")).head().getSeq[Float](0)
      Similarity.bruteTopK(corpus, qv, 5)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(joined == perQuery)
  }

  test("knnJoinRows equals knnJoin plus a corpus re-join for the payload") {
    val queries = emb.filter(col("vec_id") < 3)
    val corpus = emb.filter(col("vec_id") >= 3)
    val got = Similarity.knnJoinRows(queries, corpus, 5, Seq("label"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getLong(4)))
      .toSet
    val expected = Similarity.knnJoin(queries, corpus, 5)
      .join(corpus.select(col("vec_id").as("n_id"), col("label")), Seq("n_id"))
      .select(col("q_id"), col("n_id"), col("label"), col("sim"), col("rnk"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getLong(4)))
      .toSet
    assert(got === expected)
  }

  test("lshNearDupPairs only returns pairs above threshold, deterministic") {
    val p1 = Similarity.lshNearDupPairs(emb, minSim = 0.3).collect().toSet
    val p2 = Similarity.lshNearDupPairs(emb, minSim = 0.3).collect().toSet
    assert(p1 == p2)
    assert(p1.forall(_.getDouble(2) >= 0.3))
  }
}
