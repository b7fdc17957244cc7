package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Property tests for the dedup family on planted duplicates
  * (SURVEY.md §5.4): exact dups must always pair; near-dups (one token
  * edited) must be recalled by MinHash and sit close in SimHash space.
  */
class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  /** 20 genuinely distinct docs (disjoint vocabularies) + exact dup of #0
    * + near dup of #1 (single token edited).
    */
  private lazy val docs = {
    val distinct = (0 until 20).map { i =>
      (i.toLong, (0 until 30).map(j => s"w${i}x$j").mkString(" "))
    }
    val exactDup = Seq((100L, distinct(0)._2))
    val nearDup  = Seq((101L, distinct(1)._2.replace("w1x29", "zzz")))
    (distinct ++ exactDup ++ nearDup).toDF("doc_id", "text")
  }

  test("exactDedup keeps exactly one row per distinct text, smallest id") {
    val out = Dedup.exactDedup(docs, md5(col("text")), col("doc_id"))
    assert(out.count() == 21) // 22 rows, one exact dup removed
    assert(out.filter(col("doc_id") === 100L).count() == 0)
    assert(out.filter(col("doc_id") === 0L).count() == 1)
  }

  test("exactDedup is idempotent") {
    val once = Dedup.exactDedup(docs, md5(col("text")), col("doc_id"))
    val twice = Dedup.exactDedup(once, md5(col("text")), col("doc_id"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("minhash recalls the exact dup and the planted near-dup") {
    val pairs = Dedup.minHashNearDups(docs, "text", "doc_id",
      shingleLen = 3, numHashTables = 8, maxDistance = 0.4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100L)), "exact dup pair missed")
    assert(pairs.contains((1L, 101L)), "planted near-dup pair missed")
  }

  test("simhash: identical texts hamming 0, near-dup close, others far") {
    val sigs = docs.select(col("doc_id"), Dedup.simHash(col("text")).as("sig"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(ham(0L, 100L) == 0)
    assert(ham(1L, 101L) <= 6, s"near-dup hamming ${ham(1L, 101L)}")
    val far = ham(2L, 3L)
    assert(far > ham(1L, 101L), s"unrelated docs ($far) not farther than near-dups")
  }

  test("simHashNearDups finds the exact-dup pair via banding") {
    val pairs = Dedup.simHashNearDups(docs, "text", "doc_id", maxHamming = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100L)))
  }

  test("resolveDupGroups: chains collapse to the min id, components separate") {
    // chain 1-2-3 (transitive), pair 10-11, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("a_id", "b_id")
    val groups = Dedup.resolveDupGroups(pairs)
      .as[(Long, Long)].collect().toMap
    assert(groups == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("resolveDupGroups: long chain converges within the iteration bound") {
    val chain = (1L until 20L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val groups = Dedup.resolveDupGroups(chain).as[(Long, Long)].collect().toMap
    assert(groups.values.toSet == Set(1L))
    assert(groups.size == 20)
  }

  test("applyUpserts: latest version wins, updates beat base, deletes remove") {
    val base = Seq(
      (1L, "a", 0L, false), (2L, "b", 0L, false), (3L, "c", 0L, false)
    ).toDF("k", "v", "version", "deleted")
    val updates = Seq(
      (1L, "a2", 1L, false),  // update
      (1L, "a3", 2L, false),  // later update wins
      (2L, "x", 1L, true),    // delete
      (4L, "d", 1L, false)    // insert
    ).toDF("k", "v", "version", "deleted")
    val out = Dedup.applyUpserts(base, updates, Seq("k"), "version",
        Some("deleted"))
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "a3", 3L -> "c", 4L -> "d"))
  }

  test("applyUpserts: update supersedes base at equal version") {
    val base = Seq((1L, "old", 5L)).toDF("k", "v", "version")
    val updates = Seq((1L, "new", 5L)).toDF("k", "v", "version")
    val out = Dedup.applyUpserts(base, updates, Seq("k"), "version")
      .select("v").as[String].collect().toSeq
    assert(out === Seq("new"))
  }

  test("ngramJaccard: exact dup = 1.0, near-dup high, reflexive bound") {
    val cand = Seq((0L, 100L), (1L, 101L), (2L, 3L)).toDF("a_id", "b_id")
    val j = Dedup.ngramJaccard(docs, cand, "text", "doc_id", n = 3)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(j((0L, 100L)) == 1.0)
    assert(j((1L, 101L)) > 0.8 && j((1L, 101L)) < 1.0)
    assert(j((2L, 3L)) < j((1L, 101L)))
  }

  test("minHashDedup keeps one survivor per collision COMPONENT") {
    import spark.implicits._
    // ids 10, 20, 30 share one text (a 3-cycle of collisions), 40 is
    // unique, 5 shares another text with 50 — survivors must be each
    // component's min: {10, 40, 5} and the transitive closure must fold
    // entire clusters, not just direct neighbors
    val t1 = "the quick brown fox jumps over the lazy dog tonight"
    val t2 = "pack my box with five dozen liquor jugs right now"
    val docs = Seq(
      10L -> t1, 20L -> t1, 30L -> t1,
      40L -> "a wholly unique document with plenty of words inside",
      5L -> t2, 50L -> t2).toDF("doc_id", "text")
    val kept = Dedup.minHashDedup(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 40L, 5L))
    // idempotent: deduping the survivors changes nothing
    val again = Dedup.minHashDedup(
      docs.join(kept.toSeq.toDF("doc_id"), "doc_id"), "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == kept)
  }
}
