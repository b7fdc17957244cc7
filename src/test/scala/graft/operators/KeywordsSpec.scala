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
}
