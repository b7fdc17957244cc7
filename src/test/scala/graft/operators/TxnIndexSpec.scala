package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.TxnTable

/** The transactional text index, pinned:
  *  - the served BM25/phrase results are bit-identical to the rescan
  *    operators on the corpus's current logical state, across build,
  *    pure-append upsert, and re-ingest upsert (the df/tf/dl-correcting
  *    case the plain parquet index documents as unsafe);
  *  - one upsert is ONE commit (atomicity), old versions keep serving
  *    their own answers (snapshot isolation / time travel);
  *  - a serving read opens only the query terms' bucket files, not the
  *    corpus (footer-stats pruning on the clustered layout);
  *  - a doc whose text produced NO postings rows still corrects the
  *    stats fold on re-ingest (the doc-registry rows exist for this).
  */
class TxnIndexSpec extends SparkSpecBase {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def fresh(): String =
    Files.createTempDirectory("graft_txnidx_spec").toString + "/idx"

  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "pack my box with five dozen liquor jugs",
    3L -> "the five boxing wizards jump quickly",
    4L -> "quick zephyrs blow vexing daft jim",
    5L -> "fox and dog keep the quick pace")

  private def assertSameTopK(a: DataFrame, b: DataFrame): Unit = {
    // sort by rendered row: phrase results are set-shaped (no orderBy);
    // the ranked paths pin their own ordering in the l37 gates
    val ra = a.collect().toSeq.sortBy(_.toString)
    val rb = b.collect().toSeq.sortBy(_.toString)
    assert(ra == rb, s"served != rescan:\n  $ra\n  $rb")
  }

  test("build serves BM25 and phrases bit-identical to the rescan path") {
    val idx = fresh()
    val docs = docsDf(corpus)
    TxnIndex.build(docs, "doc_id", "text", idx, nBuckets = 8)
    assertSameTopK(
      TxnIndex.bm25TopK(spark, idx, Seq("quick", "fox"), 5),
      Keywords.bm25TopK(docs, "doc_id", "text", Seq("quick", "fox"), 5))
    assertSameTopK(
      TxnIndex.phraseMatches(spark, idx, Seq("the", "quick")),
      Keywords.phraseMatches(docs, "doc_id", "text", Seq("the", "quick")))
  }

  test("re-ingest upsert corrects df/tf/dl — equal to rescan of new state") {
    val idx = fresh()
    val docs = docsDf(corpus)
    TxnIndex.build(docs, "doc_id", "text", idx, nBuckets = 8)
    // doc 1 rewritten entirely, doc 6 brand new — one atomic commit
    val tranche = docsDf(Seq(
      1L -> "quick quick quick brown study",
      6L -> "a wholly new document about the quick fox"))
    val vBefore = TxnTable.currentVersion(idx)
    TxnIndex.upsert(tranche, "doc_id", "text", idx)
    assert(TxnTable.currentVersion(idx) == vBefore + 1, "upsert must be ONE commit")
    val newState = docsDf(
      corpus.filterNot(_._1 == 1L) ++ Seq(
        1L -> "quick quick quick brown study",
        6L -> "a wholly new document about the quick fox"))
    assertSameTopK(
      TxnIndex.bm25TopK(spark, idx, Seq("quick", "fox"), 10),
      Keywords.bm25TopK(newState, "doc_id", "text", Seq("quick", "fox"), 10))
    assertSameTopK(
      TxnIndex.phraseMatches(spark, idx, Seq("quick", "fox")),
      Keywords.phraseMatches(newState, "doc_id", "text", Seq("quick", "fox")))
  }

  test("snapshot isolation: the pre-upsert version keeps its answer") {
    val idx = fresh()
    val docs = docsDf(corpus)
    val v0 = TxnIndex.build(docs, "doc_id", "text", idx, nBuckets = 8)
    val before = TxnIndex.bm25TopK(spark, idx, Seq("quick"), 5).collect().toSeq
    TxnIndex.upsert(docsDf(Seq(1L -> "nothing relevant here")),
      "doc_id", "text", idx)
    val travel = TxnIndex.bm25TopK(spark, idx, Seq("quick"), 5, asOf = v0)
      .collect().toSeq
    assert(travel == before, "time-travel read drifted after upsert")
    val now = TxnIndex.bm25TopK(spark, idx, Seq("quick"), 5).collect().toSeq
    assert(now != before, "upsert changed doc 1, the live answer must move")
  }

  test("a doc with no postings rows still corrects stats on re-ingest") {
    val idx = fresh()
    // doc 7's text is empty: tokens("") == [""] -> dl = 1, ZERO postings
    // rows — only the registry knows its dl. Re-ingesting it must still
    // subtract that dl from the stats fold.
    val docs = docsDf(corpus :+ (7L -> ""))
    TxnIndex.build(docs, "doc_id", "text", idx, nBuckets = 8)
    val tranche = docsDf(Seq(7L -> "five quick words now appear"))
    TxnIndex.upsert(tranche, "doc_id", "text", idx)
    val newState = docsDf(corpus :+ (7L -> "five quick words now appear"))
    assertSameTopK(
      TxnIndex.bm25TopK(spark, idx, Seq("quick", "five"), 10),
      Keywords.bm25TopK(newState, "doc_id", "text", Seq("quick", "five"), 10))
  }

  test("batch BM25 from the index equals the rescan batch path") {
    import spark.implicits._
    val idx = fresh()
    val docs = docsDf(corpus)
    TxnIndex.build(docs, "doc_id", "text", idx, nBuckets = 8)
    val queries = Seq((0L, "quick"), (0L, "fox"), (1L, "five"), (1L, "box"))
      .toDF("query_id", "term")
    assertSameTopK(
      TxnIndex.bm25PerQuery(spark, idx, queries, 3),
      Keywords.bm25PerQuery(docs, queries, "doc_id", "text", 3))
  }

  test("a serving read opens only the query terms' bucket files") {
    import spark.implicits._
    val idx = fresh()
    // 64 docs of one distinct token each — every bucket is populated,
    // so the clustered layout has tight per-file bucket ranges
    val docs = (0 until 64).map(i => (i.toLong, s"tok$i")).toDF("doc_id", "text")
    TxnIndex.build(docs, "doc_id", "text", idx, nBuckets = 16)
    val total = TxnTable.snapshotFiles(idx).size
    assert(total >= 10, s"clustered build should be many-file, got $total")
    val posts = TxnIndex.readPostings(spark, idx, Seq("tok3"))
    val n = scannedFiles(posts)
    assert(n >= 1 && n <= 3,
      s"one term must read ~1 bucket file, read $n of $total")
  }

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    def gather(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p.children ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(s.plan)
        case _ => Nil
      })).flatMap(gather)
    gather(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.sum
  }

  test("empty corpus builds, serves empty, and accepts its first upsert") {
    val idx = fresh()
    TxnIndex.build(docsDf(Seq.empty), "doc_id", "text", idx, nBuckets = 4)
    assert(TxnIndex.bm25TopK(spark, idx, Seq("quick"), 5).count() == 0)
    TxnIndex.upsert(docsDf(corpus.take(2)), "doc_id", "text", idx)
    assertSameTopK(
      TxnIndex.bm25TopK(spark, idx, Seq("quick", "box"), 5),
      Keywords.bm25TopK(docsDf(corpus.take(2)), "doc_id", "text",
        Seq("quick", "box"), 5))
  }
}
