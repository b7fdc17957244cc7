package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class KeywordsSpec extends SparkSpecBase {
  import spark.implicits._

  // 3 docs; "cat" appears in all (idf = ln(1) = 0), "dog" in one.
  private lazy val docs = Seq(
    (0L, "cat dog dog"),
    (1L, "cat fish"),
    (2L, "cat fish fish fish")
  ).toDF("doc_id", "text")

  test("tfidfTopK: hand-computed scores, ubiquitous terms score zero") {
    val out = Keywords.tfidfTopK(docs, "doc_id", "text", 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val ln3over1 = math.rint(2 * math.log(3.0) * 1e6) / 1e6   // dog: tf=2
    val ln3over2 = math.rint(math.log(3.0 / 2) * 1e6) / 1e6   // fish: tf=1
    val fish3 = math.rint(3 * math.log(3.0 / 2) * 1e6) / 1e6  // fish: tf=3
    assert(out === Set(
      (0L, "dog", ln3over1, 1), (0L, "cat", 0.0, 2),
      (1L, "fish", ln3over2, 1), (1L, "cat", 0.0, 2),
      (2L, "fish", fish3, 1), (2L, "cat", 0.0, 2)))
  }

  test("wordFrequencies counts every token occurrence") {
    val m = Keywords.wordFrequencies(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("cat" -> 3L, "dog" -> 2L, "fish" -> 4L))
  }

  test("postings: one row per (term, doc) with its tf") {
    val p = Keywords.postings(docs, "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(p === Map(
      ("cat", 0L) -> 1L, ("cat", 1L) -> 1L, ("cat", 2L) -> 1L,
      ("dog", 0L) -> 2L,
      ("fish", 1L) -> 1L, ("fish", 2L) -> 3L))
  }

  test("invertedIndex: df/tf_total and doc-ordered postings lists") {
    val ii = Keywords.invertedIndex(docs, "doc_id", "text").collect()
      .map { r =>
        val posts = r.getSeq[org.apache.spark.sql.Row](3)
          .map(p => (p.getLong(0), p.getLong(1)))
        r.getString(0) -> ((r.getLong(1), r.getLong(2), posts))
      }.toMap
    assert(ii === Map(
      "cat"  -> ((3L, 3L, Seq((0L, 1L), (1L, 1L), (2L, 1L)))),
      "dog"  -> ((1L, 2L, Seq((0L, 2L)))),
      "fish" -> ((2L, 4L, Seq((1L, 1L), (2L, 3L))))))
  }
}
