package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.crawler.{QualityChecks, SchemaDrift}

/** Empty-input behavior of the round-3 operators: a pipeline stage that
  * receives zero rows (empty partition, fully-filtered upstream) must
  * produce a well-defined empty-or-total result, never throw.
  */
class EmptyInputSpec extends SparkSpecBase {
  import spark.implicits._

  private def emptyKv = Seq.empty[(Long, Double)].toDF("k", "v")
  private def someKv = Seq((1L, 2.0), (2L, 3.0)).toDF("k", "v")

  test("QualityChecks.validate on an empty table: zero totals, every rule ok") {
    val r = QualityChecks.validate(emptyKv, Seq(
      QualityChecks.NotNull("nn", "k"), QualityChecks.Unique("u", "k"),
      QualityChecks.InRange("ir", "v", 0, 1)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(r.length === 3)
    assert(r.forall { case (_, viol, total, ok) => viol == 0 && total == 0 && ok })
  }

  test("SnapshotDiff against an empty side is all-inserts / all-deletes") {
    val ins = SnapshotDiff.diff(emptyKv, someKv, Seq("k"))
    assert(ins.select("op").distinct().as[String].collect().toSeq === Seq("insert"))
    val del = SnapshotDiff.diff(someKv, emptyKv, Seq("k"))
    assert(del.select("op").distinct().as[String].collect().toSeq === Seq("delete"))
    assert(SnapshotDiff.diff(emptyKv, emptyKv, Seq("k")).count() === 0)
  }

  test("winsorize of an empty frame and a 1-row group are well-defined") {
    val e = Curation.winsorize(emptyKv.withColumnRenamed("k", "g"), "v", Seq("g"), 0.05, 0.95)
    assert(e.count() === 0)
    val one = Curation.winsorize(Seq(("a", 5.0)).toDF("g", "v"), "v", Seq("g"), 0.05, 0.95)
      .select("v_w").as[Double].head()
    assert(one === 5.0) // p5 == p95 == the single value
  }

  test("round-7 text operators are total on empty corpora and queries") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val someDocs = Seq((0L, "a b"), (1L, "b c")).toDF("doc_id", "text")
    // empty corpus: every operator yields an empty frame, never throws
    assert(Keywords.bm25TopK(emptyDocs, "doc_id", "text", Seq("a"), 5)
      .count() === 0)
    assert(Keywords.bigramLogProb(emptyDocs, "doc_id", "text").count() === 0)
    assert(Keywords.phraseMatches(emptyDocs, "doc_id", "text", Seq("a", "b"))
      .count() === 0)
    assert(Keywords.positionalPostings(emptyDocs, "doc_id", "text")
      .count() === 0)
    // empty query set against a real corpus: no matches, no throw
    val emptyQ = Seq.empty[(Long, String)].toDF("query_id", "term")
    assert(Keywords.bm25PerQuery(someDocs, emptyQ, "doc_id", "text", 5)
      .count() === 0)
    // phrase absent from the vocabulary: empty, not an error
    assert(Keywords.phraseMatches(someDocs, "doc_id", "text", Seq("zzz"))
      .count() === 0)
  }

  test("round-8 index and stream-dedup are total on empty inputs") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val someDocs = Seq((0L, "a b c"), (1L, "b c d")).toDF("doc_id", "text")
    // an index built from an EMPTY corpus serves empty results (the
    // n=0 stats row makes avgdl NaN, which no row ever meets)
    val idx = java.nio.file.Files.createTempDirectory("graft_ei_idx").toString
    Keywords.buildIndex(emptyDocs, "doc_id", "text", idx, nBuckets = 4)
    assert(Keywords.bm25TopKIndexed(spark, idx, Seq("a"), 5).count() === 0)
    assert(Keywords.phraseMatchesIndexed(spark, idx, Seq("a", "b"))
      .count() === 0)
    // appending real docs to the empty index revives it
    Keywords.appendToIndex(someDocs, "doc_id", "text", idx)
    assert(Keywords.bm25TopKIndexed(spark, idx, Seq("a"), 5).count() === 1)
    // a query term absent from the index: empty, not an error
    assert(Keywords.bm25TopKIndexed(spark, idx, Seq("zzz"), 5).count() === 0)
    // an EMPTY micro-batch flows through the near-dup protocol
    val store = java.nio.file.Files
      .createTempDirectory("graft_ei_store").toString + "/t"
    val kept = java.nio.file.Files
      .createTempDirectory("graft_ei_kept").toString + "/t"
    val batch0 = someDocs.withColumn("source", lit("s"))
    graft.streaming.StreamDedup.processBatch(
      spark, batch0.limit(0), 0L, store, kept, "ei")
    graft.streaming.StreamDedup.processBatch(
      spark, batch0, 1L, store, kept, "ei")
    assert(graft.core.TxnTable.read(spark, kept).count() === 2)
  }

  test("Graph.pageRankInt on empty edges yields no nodes; bfs keeps seeds") {
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.pageRankInt(spark, emptyEdges, 2).count() === 0)
    val hops = Graph.bfsHops(emptyEdges, Seq(7L).toDF("node"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hops === Seq((7L, 0L)))
  }

  test("intervalOverlapJoin with an empty side is empty") {
    val a = Seq((1L, 0L, 10L)).toDF("a_id", "s_a", "e_a")
    val e = Seq.empty[(Long, Long, Long)].toDF("b_id", "s_b", "e_b")
    assert(TemporalJoins.intervalOverlapJoin(a, e, "s_a", "e_a", "s_b", "e_b", 5L).count() === 0)
  }

  test("SparseSimilarity on empty docs and single-doc corpora produce no pairs") {
    val empty = SparseSimilarity.termFreqs(
      Seq.empty[(Long, String)].toDF("id", "txt"), col("id"), col("txt"))
    assert(SparseSimilarity.cosinePairs(empty, None).count() === 0)
    val single = SparseSimilarity.termFreqs(
      Seq((1L, "a b")).toDF("id", "txt"), col("id"), col("txt"))
    assert(SparseSimilarity.cosinePairs(single, Some(10L)).count() === 0)
  }

  test("dataDrift between empty snapshots is empty; one empty side zero-fills") {
    assert(SchemaDrift.dataDrift(emptyKv, emptyKv, "v", 0, 10, 4).count() === 0)
    val d = SchemaDrift.dataDrift(someKv, emptyKv, "v", 0, 10, 4)
      .select("old_n", "new_n", "l1").collect()
    assert(d.forall(r => r.getLong(1) === 0L && r.getLong(2) === r.getLong(0)))
  }
}
