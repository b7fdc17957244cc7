package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Lake
import graft.operators._

/** Scale probe for the round-3 second-wave operators: min-of-3 warm
  * timings at a given sf dir (default sf0.1 — 10× the gate scale).
  * Usage: runMain graft.tools.NewOpsBench [sfDir]
  */
object NewOpsBench {
  private def timeIt(f: => Long): (Double, Long) = {
    var best = Double.MaxValue
    var rows = 0L
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      rows = f
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    (best, rows)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val lineitem = Lake.table(spark, sfDir, "lineitem").cache()
    val part = Lake.table(spark, sfDir, "part").cache()
    val orders = Lake.table(spark, sfDir, "orders").cache()
    val events = Lake.table(spark, sfDir, "events").cache()
    val docs = Lake.table(spark, sfDir, "documents").cache()
    Seq(lineitem, part, orders, events, docs).foreach(_.count())

    def report(name: String)(f: => Long): Unit = {
      val (sec, rows) = timeIt(f)
      println(f"[newops] $name%-28s ${sec}%8.3f s  rows=$rows")
    }

    report("bloom_semijoin") {
      BloomJoin.semiJoin(lineitem, "l_partkey",
        part.filter(col("p_size") <= 5), "p_partkey", 200000L).count()
    }
    report("plain_semijoin") {
      lineitem.join(part.filter(col("p_size") <= 5),
        col("l_partkey") === col("p_partkey"), "left_semi").count()
    }
    report("interval_join_daily") {
      val iv = events.groupBy(col("user_id"), to_date(col("ts")).as("d"))
        .agg(unix_micros(min(col("ts"))).as("s"), unix_micros(max(col("ts"))).as("e"))
      val a = iv.select(col("d"), col("user_id").as("u_a"), col("s").as("s_a"), col("e").as("e_a"))
      val b = iv.select(col("d"), col("user_id").as("u_b"), col("s").as("s_b"), col("e").as("e_b"))
      TemporalJoins.intervalOverlapJoin(a, b, "s_a", "e_a", "s_b", "e_b",
        chunk = 3600L * 1000000L, keyCols = Seq("d"))
        .filter(col("u_a") < col("u_b")).count()
    }
    report("pagerank_3iter") {
      val pairs = lineitem
        .select(col("l_suppkey").as("s"), (col("l_partkey") + 1000000L).as("p"))
        .distinct()
      val edges = pairs.select(col("s").as("src"), col("p").as("dst"))
        .unionAll(pairs.select(col("p").as("src"), col("s").as("dst")))
      Graph.pageRankInt(spark, edges, 3).count()
    }
    report("snapshot_diff") {
      val mutated = orders.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 5)
            .otherwise(col("o_totalprice")))
      SnapshotDiff.diff(orders, mutated, Seq("o_orderkey")).count()
    }
    report("zorder_layout_write") {
      val out = "/tmp/graft_newops_z"
      Layout.zorderPartitions(lineitem, col("l_partkey"), col("l_suppkey"), 16)
        .write.mode("overwrite").parquet(out)
      spark.read.parquet(out).count()
    }
    val tf = SparseSimilarity.termFreqs(docs, col("doc_id"), col("text")).cache()
    tf.count()
    report("sparse_cosine_maxdf_500") {
      SparseSimilarity.cosinePairs(tf, maxDf = Some(500L)).count()
    }
    report("sparse_cosine_uncut") {
      SparseSimilarity.cosinePairs(tf, maxDf = None).count()
    }
    // Round-7 text ops. The ×20 blow-up perturbs doc ids so the BM25
    // grouping and the per-doc HOFs see distinct rows, not cached dups.
    val docs20 = docs.crossJoin(
        spark.range(20).select(col("id").as("rep")))
      .select((col("doc_id") * 20 + col("rep")).as("doc_id"),
        col("text"), col("lang"), col("source")).cache()
    docs20.count()
    // the filter DEPENDS on both signals, so column pruning can't skip
    // the HOF work (a bare count() would measure the scan only)
    report("gopher_signals_x1") {
      docs.select(
        graft.functions.TextFunctions.topNgramCharFrac(col("text"), 2)
          .as("a"),
        graft.functions.TextFunctions.dupNgramFrac(col("text"), 5).as("b"))
        .filter(col("a") + col("b") >= 0).count()
    }
    report("gopher_signals_x20") {
      docs20.select(
        graft.functions.TextFunctions.topNgramCharFrac(col("text"), 2)
          .as("a"),
        graft.functions.TextFunctions.dupNgramFrac(col("text"), 5).as("b"))
        .filter(col("a") + col("b") >= 0).count()
    }
    report("bm25_topk_x1") {
      Keywords.bm25TopK(docs, "doc_id", "text",
        Seq("dup", "join", "vector", "window"), 25).count()
    }
    report("bm25_topk_x20") {
      Keywords.bm25TopK(docs20, "doc_id", "text",
        Seq("dup", "join", "vector", "window"), 25).count()
    }
    // batch retrieval: 8 two-term queries in ONE corpus pass vs eight
    // separate single-query scans — the serving-shape advantage
    val vocab = Seq("dup", "key", "fast", "line", "the", "vector", "join",
      "data", "agg", "scan", "small", "batch", "window", "merge", "sort",
      "query")
    import spark.implicits._
    val q8 = (0 until 8).flatMap(i =>
      Seq((i.toLong, vocab(2 * i)), (i.toLong, vocab(2 * i + 1))))
      .toDF("query_id", "term")
    report("bm25_batch_8q_x20") {
      Keywords.bm25PerQuery(docs20, q8, "doc_id", "text", 25).count()
    }
    report("bm25_seq_8q_x20") {
      (0 until 8).map { i =>
        Keywords.bm25TopK(docs20, "doc_id", "text",
          Seq(vocab(2 * i), vocab(2 * i + 1)), 25).count()
      }.sum
    }
    report("bigram_lm_x20") {
      Keywords.bigramLogProb(docs20, "doc_id", "text").count()
    }
    report("phrase_search_x20") {
      Keywords.phraseMatches(docs20, "doc_id", "text",
        Seq("merge", "part")).count()
    }
    // Persisted text index: the corpus explode paid ONCE at build, then
    // every query is a pruned bucket read — the serving numbers to set
    // against the per-call rescan ops directly above.
    val idxPath = "/tmp/graft_newops_textidx"
    report("text_index_build_x20") {
      Keywords.buildIndex(docs20, "doc_id", "text", idxPath, nBuckets = 64)
      spark.read.parquet(idxPath + "/stats").count()
    }
    report("bm25_topk_idx_x20") {
      Keywords.bm25TopKIndexed(spark, idxPath,
        Seq("dup", "join", "vector", "window"), 25).count()
    }
    report("bm25_batch_8q_idx_x20") {
      Keywords.bm25PerQueryIndexed(spark, idxPath, q8, 25).count()
    }
    report("phrase_search_idx_x20") {
      Keywords.phraseMatchesIndexed(spark, idxPath,
        Seq("merge", "part")).count()
    }
    // Transactional text index: the same serving shape through the
    // TxnTable log (snapshot-isolated), plus the atomic re-ingest
    // upsert the plain index cannot do. Build ≈ plain build + commit;
    // serve ≈ pruned read + log resolution; upsert = ONE tranche.
    val txnIdx = "/tmp/graft_newops_txnidx/t"
    def rmrf(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try { val it = s.iterator(); while (it.hasNext) rmrf(it.next()) }
        finally s.close()
      }
      java.nio.file.Files.deleteIfExists(p)
    }
    report("txn_index_build_x20") {
      rmrf(java.nio.file.Paths.get(txnIdx).getParent)
      TxnIndex.build(docs20, "doc_id", "text", txnIdx, nBuckets = 64)
      1L
    }
    report("txn_index_upsert_rewrite") {
      // re-ingest ~1/7 of the corpus with doubled text — idempotent
      // across timing iterations (upsert REPLACES, never accumulates).
      // Doc postings scatter across every bucket, so the keyed rewrite
      // touches ~all files: expect ~index-build cost. That is the
      // measured reason upsertLazy exists.
      TxnIndex.upsert(
        docs20.filter(col("doc_id") % 7 === 0)
          .withColumn("text", concat(col("text"), lit(" "), col("text"))),
        "doc_id", "text", txnIdx)
      1L
    }
    report("txn_index_upsert_lazy") {
      // same tranche, merge-on-read: append-only commit, O(tranche)
      TxnIndex.upsertLazy(
        docs20.filter(col("doc_id") % 7 === 0)
          .withColumn("text", concat(col("text"), lit(" "), col("text"))),
        "doc_id", "text", txnIdx)
      1L
    }
    report("bm25_topk_txnidx_tombs") {
      // serving latency WITH tombstone tranches outstanding — the lazy
      // probe's three timing iterations each committed one (timeIt runs
      // its body 3×), plus the stats tranches build/rewrite/lazy
      // accumulated — the merge-on-read read tax that compaction removes
      TxnIndex.bm25TopK(spark, txnIdx,
        Seq("dup", "join", "vector", "window"), 25).count()
    }
    report("txn_index_compact") {
      TxnIndex.compact(spark, txnIdx)
      1L
    }
    report("bm25_topk_txnidx_x20") {
      TxnIndex.bm25TopK(spark, txnIdx,
        Seq("dup", "join", "vector", "window"), 25).count()
    }
    report("phrase_search_txnidx_x20") {
      TxnIndex.phraseMatches(spark, txnIdx, Seq("merge", "part")).count()
    }
    // end-to-end near-dup dedup: banded candidates -> components ->
    // survivors (candidate-linear; the all-pairs rerank never runs)
    report("minhash_dedup_x1") {
      Dedup.minHashDedup(docs, "text", "doc_id").count()
    }
    // Transactional vector index: the IVF layout through the commit
    // log. Build = assignment + clustered create; serve = pruned
    // probed-list read + cosine rerank; lazy upsert = ONE append-only
    // tranche (tombstones, no registry read); compact pays the
    // tombstone read tax back.
    val emb = Lake.table(spark, sfDir, "embeddings").cache()
    emb.count()
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toSeq
    val vecIdx = "/tmp/graft_newops_txnvec/idx"
    report("txn_vec_build") {
      rmrf(java.nio.file.Paths.get(vecIdx).getParent)
      TxnVectorIndex.build(emb.filter(col("vec_id") =!= 0),
        "vec_id", "embedding", vecIdx, nlist = 64)
      1L
    }
    report("txn_vec_serve") {
      TxnVectorIndex.topK(spark, vecIdx, qv, 10, nprobe = 8).count()
    }
    report("txn_vec_upsert_lazy") {
      TxnVectorIndex.upsertLazy(emb.filter(col("vec_id") % 7 === 0),
        "vec_id", "embedding", vecIdx)
      1L
    }
    report("txn_vec_serve_tombs") {
      TxnVectorIndex.topK(spark, vecIdx, qv, 10, nprobe = 8).count()
    }
    report("txn_vec_compact") {
      TxnVectorIndex.compact(spark, vecIdx)
      1L
    }
    report("txn_vec_serve_compacted") {
      TxnVectorIndex.topK(spark, vecIdx, qv, 10, nprobe = 8).count()
    }
    // ST12 serving-read scale probe: grow the signature store across 12
    // micro-batches and watch the PER-BATCH cost. The bloom gate +
    // bucket-pruned readPrunedIn must keep the store read bounded by
    // the batch's own collisions (read=0 files when a batch has none),
    // so per-batch wall time stays flat while filesLive grows — the
    // property the r8 full-store-scan lacked. Real corpus docs, so some
    // batches DO carry near-dups: their reads show as small file
    // subsets, not snapshot scans.
    locally {
      val sdRoot =
        java.nio.file.Files.createTempDirectory("graft_newops_sd").toString
      val store = s"$sdRoot/store"
      val keptT = s"$sdRoot/kept"
      graft.streaming.StreamDedup.scanLog.clear()
      val nB = 12
      val per = 500
      val times = (0 until nB).map { b =>
        val batch = docs.filter(
          col("doc_id") >= b.toLong * per && col("doc_id") < (b + 1L) * per)
        val t0 = System.nanoTime()
        graft.streaming.StreamDedup.processBatch(spark, batch, b.toLong,
          store, keptT, "bench")
        (System.nanoTime() - t0) / 1e9
      }
      import scala.jdk.CollectionConverters._
      val scans = graft.streaming.StreamDedup.scanLog.asScala
        .filter(_.streamId == "bench").map(s => s.batchId -> s).toMap
      (0 until nB).foreach { b =>
        val tag = scans.get(b.toLong)
          .map(s => s"read=${s.filesRead}/${s.filesLive} " +
            s"cand_buckets=${s.candBuckets}")
          .getOrElse("store empty")
        println(f"[newops] stream_dedup_batch$b%02d        " +
          f"${times(b)}%8.3f s  $tag")
      }
    }
    // Round-10 probe: commit-log maintenance at streaming version
    // counts. 120 micro-batch commits (the shape an always-on sink
    // accumulates), then restore + vacuum — both must resolve from the
    // nearest checkpoint + suffix (counted via the versionFileReads
    // seam), never replay the whole log. The printed log_reads is the
    // scale evidence: it stays ~O(CheckpointInterval) as versions grow,
    // where the pre-round-10 paths cost one read per version.
    locally {
      import graft.core.TxnTable
      val t = java.nio.file.Files.createTempDirectory("graft_newops_vac")
        .toString + "/t"
      TxnTable.create(spark, t, spark.range(0, 10).toDF("id"))
      val t0 = System.nanoTime()
      (1 to 120).foreach(k => TxnTable.appendStreamBatch(spark, t,
        spark.range(k * 10L, k * 10L + 10).toDF("id"), "bench", k.toLong))
      val tCommits = (System.nanoTime() - t0) / 1e9
      println(f"[newops] txn_120_stream_commits     $tCommits%8.3f s  " +
        "rows=120")
      def reads(body: => Unit): Long = {
        val b = TxnTable.versionFileReads.get(); body
        TxnTable.versionFileReads.get() - b
      }
      var r = 0L
      val tRestore = {
        val x0 = System.nanoTime()
        r = reads { TxnTable.restore(spark, t, 119L) }
        (System.nanoTime() - x0) / 1e9
      }
      println(f"[newops] txn_restore_at_v121        $tRestore%8.3f s  " +
        s"log_reads=$r (full replay: 121+)")
      TxnTable.compact(spark, t)
      TxnTable.append(spark, t, spark.range(5000, 5010).toDF("id"))
      val tVacuum = {
        val x0 = System.nanoTime()
        r = reads {
          val (_, deleted) = TxnTable.vacuum(spark, t, retainVersions = 2)
          require(deleted > 0, "probe table must have dead files")
        }
        (System.nanoTime() - x0) / 1e9
      }
      println(f"[newops] txn_vacuum_at_v124         $tVacuum%8.3f s  " +
        s"log_reads=$r (full replay: 124+)")
    }
    spark.stop()
  }
}
