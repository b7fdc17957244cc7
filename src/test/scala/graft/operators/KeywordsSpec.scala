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

  test("bm25TopK matches the hand-computed scores, rare terms score higher") {
    // N=3, avgdl=3; df(a)=df(c)=2 → idf=ln(1.6); contributions rounded
    // 6dp then DECIMAL-summed (values recomputed by hand/NumPy):
    //   d0 "a b a": a(tf2,dl3) → 0.646255
    //   d1 "a c":   a+c(tf1,dl2) → 0.544215·2 = 1.088430
    //   d2 "c c c c": c(tf4,dl4) → 0.752006
    import spark.implicits._
    val tiny = Seq((0L, "a b a"), (1L, "a c"), (2L, "c c c c"))
      .toDF("doc_id", "text")
    val got = Keywords.bm25TopK(tiny, "doc_id", "text", Seq("a", "c"), 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq === Seq((1L, 1.08843), (2L, 0.752006), (0L, 0.646255)))
    // k cuts the tail, order is (score desc, doc_id)
    val top1 = Keywords.bm25TopK(tiny, "doc_id", "text", Seq("a", "c"), 1)
      .collect().map(_.getLong(0))
    assert(top1.toSeq === Seq(1L))
    // docs without any query term never appear
    val none = Keywords.bm25TopK(tiny, "doc_id", "text", Seq("zzz"), 3)
    assert(none.count() === 0)
  }

  test("bm25PerQuery: each query's block equals the single-query ranking") {
    import spark.implicits._
    val tiny = Seq((0L, "a b a"), (1L, "a c"), (2L, "c c c c"))
      .toDF("doc_id", "text")
    val queries = Seq((7L, "a"), (7L, "c"), (9L, "c"))
      .toDF("query_id", "term")
    val got = Keywords.bm25PerQuery(tiny, queries, "doc_id", "text", 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // query 7 = the {a, c} query of the bm25TopK spec — same scores, but
    // df is shared over the term UNION {a, c} for both queries here
    val q7 = got.filter(_._1 == 7L).map(t => (t._2, t._3, t._4))
    assert(q7.toSeq === Seq((1L, 1.08843, 1L), (2L, 0.752006, 2L),
      (0L, 0.646255, 3L)))
    // query 9 only matches the c-docs, ranked by their c weight
    val q9 = got.filter(_._1 == 9L).map(t => (t._2, t._4))
    assert(q9.toSeq === Seq((2L, 1L), (1L, 2L)))
  }

  test("phraseMatches: postings intersection, overlaps, repeated terms") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b a"), // "a b"×2, "b a"×2, "a b a"×2 (overlapping)
      (1L, "b a"),
      (2L, "a a a"), // repeated-term self-join, overlapping pairs
      (3L, "x y z"))
      .toDF("doc_id", "text")
    def m(ph: String) =
      Keywords.phraseMatches(docs, "doc_id", "text", ph.split(" ").toSeq)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m("a b") === Map(0L -> 2L))
    assert(m("b a") === Map(0L -> 2L, 1L -> 1L))
    assert(m("a b a") === Map(0L -> 2L))
    assert(m("a a") === Map(2L -> 2L))
    assert(m("x z") === Map.empty[Long, Long]) // present but not adjacent
    assert(m("z") === Map(3L -> 1L))
  }

  test("phraseMatches equals a naive sliding-window count (seeded random)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alpha = Seq("a", "b", "c", "d")
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until (1 + rnd.nextInt(12)))
        .map(_ => alpha(rnd.nextInt(4))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    (0 until 10).foreach { _ =>
      val ph = (0 until (1 + rnd.nextInt(3))).map(_ => alpha(rnd.nextInt(4)))
      val got = Keywords.phraseMatches(df, "doc_id", "text", ph)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = docs.flatMap { case (id, text) =>
        val n = text.split(" ").toSeq.sliding(ph.size).count(_ == ph)
        if (n > 0) Some(id -> n.toLong) else None
      }.toMap
      assert(got === want, s"phrase '${ph.mkString(" ")}'")
    }
  }

  test("bigramLogProb: mean bigram log-prob, coherent beats incoherent") {
    // corpus: "a b a b", "b b", "x" → unigrams a=2 b=4 x=1 (V=3);
    // bigrams "a b"×2, "b a"×1, "b b"×1. ln p(t₂|t₁)=ln(c+1)−ln(c₁+V):
    //   lp(a b)=ln(3/5), lp(b a)=lp(b b)=ln(2/7)
    //   d0: (round(2·ln(3/5),6) + round(ln(2/7),6)) / 3 = -0.758138
    //   d1: round(ln(2/7),6) / 1                        = -1.252763
    import spark.implicits._
    val tiny = Seq((0L, "a b a b"), (1L, "b b"), (2L, "x"))
      .toDF("doc_id", "text")
    val got = Keywords.bigramLogProb(tiny, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // the 1-token doc has no bigrams and drops out (inner semantics)
    assert(got.toSeq === Seq((0L, -0.758138), (1L, -1.252763)))
    // the doc made of the corpus's dominant bigram scores higher than
    // the rare-transition doc — the coherence property the filter uses
    assert(got(0)._2 > got(1)._2)
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

  test("persisted index serves bit-identical results to the rescan path") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Seq("a", "b", "c", "d", "e", "f", "g", "rare")
    val corpus = (0 until 200).map { i =>
      (i.toLong, (0 until (2 + rnd.nextInt(20)))
        .map(_ => vocab(rnd.nextInt(if (i % 37 == 0) 8 else 7)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_kwidx").toString
    Keywords.buildIndex(corpus, "doc_id", "text", idx, nBuckets = 8)

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
    // single-query BM25: indexed == rescan, row for row
    val terms = Seq("rare", "b", "e")
    assert(rows(Keywords.bm25TopKIndexed(spark, idx, terms, 15)) ===
      rows(Keywords.bm25TopK(corpus, "doc_id", "text", terms, 15)))
    // batch BM25 (the path no gate covers): indexed == rescan
    val qs = Seq((0L, "rare"), (0L, "a"), (1L, "b"), (1L, "c"), (2L, "e"))
      .toDF("query_id", "term")
    assert(rows(Keywords.bm25PerQueryIndexed(spark, idx, qs, 5)) ===
      rows(Keywords.bm25PerQuery(corpus, qs, "doc_id", "text", 5)))
    // phrase search: indexed == rescan across phrase shapes
    Seq(Seq("a", "b"), Seq("rare"), Seq("c", "c"), Seq("e", "f", "g"))
      .foreach { ph =>
        assert(
          rows(Keywords.phraseMatchesIndexed(spark, idx, ph)
            .orderBy(col("doc_id"))) ===
          rows(Keywords.phraseMatches(corpus, "doc_id", "text", ph)
            .orderBy(col("doc_id"))),
          s"phrase ${ph.mkString(" ")}")
      }
    // the pruned read really prunes: only the query term's bucket
    // partition is scanned (inputFiles ignores partition pruning — the
    // executed scan's numPartitions metric is the truth)
    val probe = Keywords.readPostings(spark, idx, Seq("rare"))
    assert(probe.collect().nonEmpty) // executes probe's own plan → metrics
    def gather(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p.children ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(s.plan)
        case _ => Nil
      })).flatMap(gather)
    val partsRead = gather(probe.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numPartitions").value
    }.sum
    val expected = Keywords.termBuckets(spark, Seq("rare"), 8).size
    assert(partsRead == expected,
      s"scanned $partsRead bucket partitions, expected $expected of 8")

    // incremental growth: build-on-half + append-half must serve the
    // SAME results as the one-shot index (df and the additive corpus
    // stats fold across tranches)
    val idx2 = java.nio.file.Files
      .createTempDirectory("graft_kwidx2").toString
    Keywords.buildIndex(corpus.filter(col("doc_id") < 100),
      "doc_id", "text", idx2, nBuckets = 8)
    Keywords.appendToIndex(corpus.filter(col("doc_id") >= 100),
      "doc_id", "text", idx2)
    assert(rows(Keywords.bm25TopKIndexed(spark, idx2, terms, 15)) ===
      rows(Keywords.bm25TopKIndexed(spark, idx, terms, 15)))
    assert(rows(Keywords.phraseMatchesIndexed(spark, idx2, Seq("a", "b"))
        .orderBy(col("doc_id"))) ===
      rows(Keywords.phraseMatchesIndexed(spark, idx, Seq("a", "b"))
        .orderBy(col("doc_id"))))

    // compaction folds the tranche files (≤1 per bucket after) and
    // changes nothing served
    val before = rows(Keywords.bm25TopKIndexed(spark, idx2, terms, 15))
    Keywords.compactIndex(spark, idx2)
    val (livePost, liveStats) = Keywords.liveDirs(idx2)
    def bucketFiles(b: Int): Int = {
      val d = new java.io.File(s"$idx2/$livePost/bucket=$b")
      if (!d.isDirectory) 0
      else d.listFiles().count(_.getName.endsWith(".parquet"))
    }
    assert((0 until 8).forall(bucketFiles(_) <= 1),
      "compaction left multiple files in a bucket")
    assert(spark.read.parquet(s"$idx2/$liveStats").count() == 1)
    assert(rows(Keywords.bm25TopKIndexed(spark, idx2, terms, 15)) === before)
    assert(rows(Keywords.phraseMatchesIndexed(spark, idx2, Seq("a", "b"))
        .orderBy(col("doc_id"))) ===
      rows(Keywords.phraseMatchesIndexed(spark, idx, Seq("a", "b"))
        .orderBy(col("doc_id"))))
  }

  test("compactIndex crash windows NEVER leave the index headless; " +
    "recovery drops orphans only") {
    import spark.implicits._
    val corpus = (0 until 60).map(i =>
      (i.toLong, s"doc $i words alpha beta gamma tail$i")).toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_kwidx_crash").toString
    Keywords.buildIndex(corpus, "doc_id", "text", idx, nBuckets = 4)
    Keywords.appendToIndex(
      (60 until 80).map(i => (i.toLong, s"doc $i alpha extra tail$i"))
        .toDF("doc_id", "text"), "doc_id", "text", idx)
    val terms = Seq("alpha", "tail7")
    val before = Keywords.bm25TopKIndexed(spark, idx, terms, 10)
      .collect().toSeq
    def gens(): Set[String] = new java.io.File(idx).listFiles()
      .map(_.getName).filter(_.startsWith(".postings__g")).toSet
    // crash BEFORE the pointer publish: the live generation keeps
    // serving WITHOUT any recovery step — no headless window exists
    Keywords.compactStageHook = () => sys.error("crash before publish")
    try intercept[RuntimeException] { Keywords.compactIndex(spark, idx) }
    finally Keywords.compactStageHook = () => ()
    assert(Keywords.bm25TopKIndexed(spark, idx, terms, 10)
      .collect().toSeq == before,
      "a pre-publish crash must leave the index serving, unhealed")
    assert(gens().nonEmpty, "the orphaned staged generation exists")
    Keywords.recoverIndex(idx)
    assert(gens().isEmpty, "recovery must drop the unpublished staging")
    // crash AFTER the pointer flip, before the superseded drop: the
    // NEW generation serves immediately; old dirs are mere orphans
    Keywords.compactPublishHook = () => sys.error("crash after publish")
    try intercept[RuntimeException] { Keywords.compactIndex(spark, idx) }
    finally Keywords.compactPublishHook = () => ()
    assert(Keywords.bm25TopKIndexed(spark, idx, terms, 10)
      .collect().toSeq == before,
      "a post-publish crash must serve the new generation")
    assert(new java.io.File(s"$idx/postings").isDirectory,
      "the superseded plain dirs linger as orphans until recovery")
    Keywords.recoverIndex(idx)
    assert(!new java.io.File(s"$idx/postings").exists() &&
      !new java.io.File(s"$idx/stats").exists(),
      "recovery must drop the superseded plain dirs")
    assert(Keywords.bm25TopKIndexed(spark, idx, terms, 10)
      .collect().toSeq == before)
    // the next compaction (self-healing first) completes, chains the
    // generation, and still serves the same answers
    Keywords.compactIndex(spark, idx)
    assert(Keywords.bm25TopKIndexed(spark, idx, terms, 10)
      .collect().toSeq == before)
    assert(gens().size == 1, s"exactly one live generation: ${gens()}")
    // appends land INSIDE the live generation and keep serving
    Keywords.appendToIndex(
      (80 until 90).map(i => (i.toLong, s"doc $i alpha tail$i"))
        .toDF("doc_id", "text"), "doc_id", "text", idx)
    assert(Keywords.bm25TopKIndexed(spark, idx, Seq("tail85"), 3)
      .count() == 1)
    // legacy heal: an old-engine index with .postings__old holding the
    // only copy is restored (the pre-pointer recovery contract)
    val legacy = java.nio.file.Files
      .createTempDirectory("graft_kwidx_legacy").toString
    Keywords.buildIndex(corpus, "doc_id", "text", legacy, nBuckets = 4)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(legacy, "postings"),
      java.nio.file.Paths.get(legacy, ".postings__old"))
    Keywords.recoverIndex(legacy)
    assert(Keywords.bm25TopKIndexed(spark, legacy, terms, 10)
      .count() > 0, "the legacy sole copy must be restored")
  }
}
