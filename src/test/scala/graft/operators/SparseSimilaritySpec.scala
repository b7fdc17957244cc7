package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class SparseSimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b b c"), (2L, "b c d"), (3L, "x y z"), (4L, "a a b")).toDF("id", "txt")

  test("termFreqs counts multiplicity and drops empty tokens") {
    val tf = SparseSimilarity.termFreqs(docs, col("id"), col("txt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tf((1L, "b")) === 2L)
    assert(tf((4L, "a")) === 2L)
    assert(!tf.contains((1L, "")))
  }

  test("cosinePairs matches a hand computation; disjoint docs produce no pair") {
    val tf = SparseSimilarity.termFreqs(docs, col("id"), col("txt"))
    val pairs = SparseSimilarity.cosinePairs(tf, None)
      .select("da", "db", "dot", "na2", "nb2")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // doc1 (a:1,b:2,c:1) · doc2 (b:1,c:1,d:1) = 2 + 1 = 3; n1=6, n2=3
    assert(pairs((1L, 2L)) === ((3L, 6L, 3L)))
    // doc3 shares no term with anyone
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("maxDf >= corpus size is a no-op; small maxDf prunes hot terms from DOTS but not norms") {
    val tf = SparseSimilarity.termFreqs(docs, col("id"), col("txt"))
    val uncut = SparseSimilarity.cosinePairs(tf, None)
      .select("da", "db", "dot").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bigCap = SparseSimilarity.cosinePairs(tf, Some(100L))
      .select("da", "db", "dot").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(uncut === bigCap)
    // 'b' appears in 3 docs; maxDf=2 drops it from pair generation:
    // (1,4) shared only 'a' and 'b' -> dot falls to a-part only
    val cut = SparseSimilarity.cosinePairs(tf, Some(2L))
      .select("da", "db", "dot")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cut((1L, 4L)) === 2L) // a: 1*2, b dropped
    // norms keep ALL terms (exact vector lengths, cut or not)
    val n14 = SparseSimilarity.cosinePairs(tf, Some(2L))
      .filter(col("da") === 1L && col("db") === 4L)
      .select("na2", "nb2").head()
    assert((n14.getLong(0), n14.getLong(1)) === ((6L, 5L)))
  }
}
