package graft.queries

import graft.SparkSpecBase

/** Plan-shape regression guards: the perf-critical physical properties
  * (pushdown, broadcast, top-k heaps, no stray sort-merge exchanges at
  * dimension scale) must survive future query edits — a correct result
  * from a degraded plan is still a regression at 100 TB.
  */
class PlanShapeSpec extends SparkSpecBase {

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf0001)
    df.collect() // force AQE final plan
    df.queryExecution.executedPlan.toString
  }

  test("q01: shipdate filter is pushed to the parquet scan") {
    val p = plan("q01_agg_lineitem")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(l_shipdate"))
  }

  test("q01: scan schema is pruned to the referenced columns") {
    val p = plan("q01_agg_lineitem")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_orderkey"), "unreferenced column not pruned")
  }

  test("q02: dimension joins broadcast, no sort-merge join") {
    val p = plan("q02_join4")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "dimension join fell back to sort-merge")
  }

  test("q10/q14: top-k plans as TakeOrderedAndProject (no total sort)") {
    assert(plan("q10_topk_sort").contains("TakeOrderedAndProject"))
    assert(plan("q14_cosine_topk").contains("TakeOrderedAndProject"))
  }

  test("q11/q12: subphases plan as semi/anti broadcast joins") {
    assert(plan("q11_semijoin").contains("LeftSemi"))
    assert(plan("q12_antijoin").contains("LeftAnti"))
  }

  test("q14: cosine scoring runs inside whole-stage codegen") {
    val p = plan("q14_cosine_topk")
    assert(p.contains("cosinesimilarity") && p.contains("*("),
      "native cosine not in a codegen stage")
  }

  test("l8 weighted sample: global top-k is a heap, not a total sort") {
    // E-S keys are computed map-side; the k-largest selection must plan
    // as TakeOrderedAndProject (per-partition heaps) — a global Sort
    // would shuffle the full corpus at 100 TB to keep 25 rows.
    val p = plan("l8_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      "weighted sample top-k degraded to a total sort")
  }

  test("j7 as-of join: one key shuffle, no range join in the plan") {
    val p = plan("j7_asof_join")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      "as-of join degraded to a range-condition join")
    // AQE's toString appends the pre-adaptive "Initial Plan" — count
    // exchanges in the final plan section only.
    val finalPlan = p.split("== Initial Plan ==")(0)
    val keyExchanges = "Exchange hashpartitioning\\(_k".r.findAllIn(finalPlan).length
    assert(keyExchanges == 1,
      s"expected exactly 1 key shuffle for the as-of window, got $keyExchanges")
  }

  test("j7 range join: candidates via equi-join, never nested-loop") {
    val p = plan("j7_range_join")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      "proximity join degraded to nested-loop")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "bucket candidate generation should be a hash/merge equi-join")
  }

  test("text functions: token split runs once per row, not per token/lang") {
    // letTokens pins the tokenizer to a single evaluation; inlining it
    // into a lambda re-splits per element (O(tokens²) in maxTokenShare —
    // measured 4.5× slower on the shingle path) and sibling references
    // re-split per reference (5× in langId) because HOFs are outside
    // whole-stage codegen's subexpression elimination.
    import org.apache.spark.sql.functions.col
    import graft.functions.TextFunctions._
    for ((name, c) <- Seq[(String, org.apache.spark.sql.Column)](
        "wordShingles" -> wordShingles(col("text"), 3),
        "maxTokenShare" -> maxTokenShare(col("text")),
        "langId" -> langId(col("text")),
        "repetitionRatio" -> repetitionRatio(col("text")),
        "stopwordRatio" -> stopwordRatio(col("text")))) {
      val df = spark.read.parquet(s"$sf0001/documents.parquet").select(c.as("v"))
      val splits = "split\\(".r.findAllIn(df.queryExecution.optimizedPlan.toString).length
      assert(splits == 1, s"$name: expected 1 split() in the optimized plan, got $splits")
    }
  }

  test("a17 skyline: prefix-max is range-partitioned, never single-task") {
    // The running max over the price domain must run per range partition
    // with only the N_partitions boundary maxima crossing partitions — a
    // global-order window plans as `Exchange SinglePartition` feeding the
    // Window, serializing the whole price domain through one task.
    val p = plan("a17_skyline")
    assert(p.contains("Window"), "skyline lost its windowed prefix-max")
    assert(!p.contains("Exchange SinglePartition"),
      "skyline prefix-max degraded to a single-partition window")
  }

  test("l26 k-means step: codegen distance, map-side assignment, no joins") {
    val p = plan("l26_kmeans")
    assert(p.toLowerCase.contains("squareddistanceint"),
      "assignment distance not the codegen expression")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "literal-centroid assignment must not plan a join")
  }

  test("l25 semDedup: cluster-key equi joins only, no cartesian pair blowup") {
    val p = plan("l25_semdedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "within-cluster pairing degraded to a non-equi join")
  }

  test("l29 unigram LM: hash-join scoring, 1-row stats on a broadcast") {
    val p = plan("l29_unigram_lm")
    assert(!p.contains("CartesianProduct"))
    val finalPlan = p.split("== Initial Plan ==")(0)
    // the (T, V) totals are a single row — the ONLY nested-loop allowed
    assert(finalPlan.contains("BroadcastNestedLoopJoin"),
      "1-row totals should ride a broadcast nested loop")
  }

  test("l3b kNN payload join: heap aggregate, no window sort") {
    val p = plan("l3b_knn_payload")
    assert(p.toLowerCase.contains("topkrowsagg"), "heap aggregate missing")
    assert(!p.contains("Window ["), "kNN join must not fall back to a window")
  }

  test("w8 top-k rewrite: the Window is gone, the heap aggregate plans") {
    val p = plan("w8_topk_rewrite")
    assert(!p.contains("Window ["), "rewrite left a Window in the plan")
    assert(p.contains("ObjectHashAggregate"),
      "TopKRowsAgg should plan as ObjectHashAggregate")
  }

  test("c13: crawled stats flip the dim join SMJ→BHJ by statistics, not hint") {
    // The same external parquet table, planned with and without the
    // crawler's CatalogStatistics under CBO: the stats-less plan can't
    // see past raw file bytes and sort-merges; the crawled ndv+min/max
    // shrink the filtered-dim estimate ~50× and the static planner
    // broadcasts. The gate row carries the actual chosen join node.
    val rows = graft.SparkEntry.queries("c13_cbo_bhj")(spark, sf0001).collect()
    val byVariant = rows.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byVariant("no_stats") == "SortMergeJoin",
      s"stats-less baseline should sort-merge, got ${byVariant("no_stats")}")
    assert(byVariant("with_stats") == "BroadcastHashJoin",
      s"crawled stats should flip to broadcast, got ${byVariant("with_stats")}")
  }

  test("c13b: crawled stats drive cost-based join REORDER, dims first") {
    // The same crawl output that flips SMJ→BHJ (c13) must also reorder
    // a badly-written multi-join: syntactically the query joins
    // fact⋈fact first (lineitem⋈orders) with the selective dims last.
    // Without stats the syntactic order stands; with crawled rowCounts
    // + ndv/min-max, CostBasedJoinReorder starts from the filtered
    // dims and leaves the big fact for last.
    import graft.crawler.CboStats
    CboStats.registerLake(spark, sf0001, "cbo5_")
    val sql = """SELECT n_name, count(*) AS c FROM cbo5_lineitem
      JOIN cbo5_orders ON l_orderkey = o_orderkey
      JOIN cbo5_customer ON o_custkey = c_custkey
      JOIN cbo5_nation ON c_nationkey = n_nationkey
      WHERE n_name IN ('FRANCE','GERMANY') AND c_mktsegment = 'BUILDING'
      GROUP BY n_name"""
    def leafOrder(cbo: Boolean): Seq[String] = {
      val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
      val saved = keys.map(k => k -> spark.conf.getOption(k))
      try {
        keys.foreach(k => spark.conf.set(k, cbo.toString))
        spark.sql(sql).queryExecution.optimizedPlan.collectLeaves()
          .map(_.toString.toLowerCase)
          .map(s => Seq("lineitem", "orders", "customer", "nation")
            .find(s.contains).getOrElse("?"))
      } finally saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
    }
    assert(leafOrder(cbo = false).head == "lineitem",
      "without stats the syntactic fact-first order should stand")
    val reordered = leafOrder(cbo = true)
    assert(reordered.head == "customer" && reordered.last == "lineitem",
      s"stats-driven reorder should put dims first, fact last: $reordered")
  }

  test("s12: nested scan prunes to the two referenced leaf fields") {
    // The nested read touches only cust.c_mktsegment and
    // items[*].l_quantity; Spark's nested-schema pruning must push that
    // into the parquet ReadSchema — sibling leaves (c_custkey,
    // l_extendedprice, l_linenumber, o_totalprice) must not be read.
    val p = plan("s12_nested")
    val read = p.split("ReadSchema: ")(1).split("\n")(0)
    assert(read.contains("c_mktsegment") && read.contains("l_quantity"),
      s"referenced nested leaves missing from ReadSchema: $read")
    for (dropped <- Seq("c_custkey", "l_extendedprice", "l_linenumber",
        "o_totalprice"))
      assert(!read.contains(dropped),
        s"nested pruning failed to drop $dropped: $read")
  }

  test("l31 gopher signals: one scan, no joins, no key shuffle") {
    // the whole gate is scan → project (HOFs) → output sort; a join or
    // a hash shuffle means the per-doc signals stopped being map-side
    val p = plan("l31_gopher_repetition")
    assert(!p.contains("Join"), "gopher signals must not plan a join")
    val finalPlan = p.split("== Initial Plan ==")(0)
    assert(!finalPlan.contains("Exchange hashpartitioning"),
      "per-doc signals picked up a key shuffle")
  }

  test("l32 bm25: broadcast scoring joins, heap top-k, no cartesian") {
    val p = plan("l32_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"),
      "bm25 top-k degraded to a total sort")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "df/stats joins must broadcast at this scale")
  }

  test("l33 bigram LM: broadcast model joins, no cartesian") {
    val p = plan("l33_bigram_logprob")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "bigram/prefix model joins must broadcast while the model fits")
  }

  test("l34 batch bm25: per-query top-k is the heap, never a rank window") {
    val p = plan("l34_bm25_multi")
    assert(p.toLowerCase.contains("topkbyscore"),
      "per-query top-k lost the mergeable heap aggregate")
    assert(!p.contains("Window ["),
      "batch retrieval fell back to a per-query rank window")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("l36 indexed serving: no corpus scan, bucket+term filters reach the index") {
    val docs = graft.core.Lake.table(spark, sf0001, "documents")
    val idx = java.nio.file.Files.createTempDirectory("graft_psidx").toString
    graft.operators.Keywords.buildIndex(docs, "doc_id", "text", idx, 16)
    val df = graft.operators.Keywords.bm25TopKIndexed(spark, idx,
      Seq("dup", "join"), 10)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // serving must read ONLY the index — a documents scan would mean
    // the per-call rebuild snuck back in
    assert(!p.contains("documents.parquet"), "serving plan rescanned the corpus")
    assert(p.contains("TakeOrderedAndProject"))
    // the bucket predicate prunes partitions at plan time and the term
    // predicate pushes into the parquet scan (row-group skipping inside
    // whatever else shares the bucket)
    assert(p.contains("PartitionFilters") && p.contains("bucket"),
      "bucket partition filter missing from the postings scan")
    assert(p.contains("PushedFilters") && p.contains("In(term"),
      "term filter not pushed into the postings scan")
  }

  test("l3 lsh near-dup: pair dedup shuffles scalars, not vector payloads") {
    val p = plan("l3_lsh_neardup")
    // The distinct that collapses multi-band candidate duplicates must
    // key on (a_id, b_id, sim) — shuffling embedding arrays for dedup
    // is the scale-killer the verdict flagged.
    assert("HashAggregate\\(keys=\\[a_id[^\\]]*b_id[^\\]]*sim".r
      .findFirstIn(p).isDefined, "distinct should key on the scalar pair cols")
    assert(!"hashpartitioning\\([^)]*(embedding|\\bva\\b|\\bvb\\b)".r
      .findFirstIn(p).isDefined, "a shuffle is carrying embedding payloads")
  }

  test("l38 dedup: candidates come from band equi-joins, never a cartesian") {
    // the near-dup SURVIVOR computation must stay candidate-linear:
    // (band, key) equi-joins for pairs, keyed joins for propagation —
    // an all-pairs product anywhere is the 100 TB scale-killer
    val docs = graft.core.Lake.table(spark, sf0001, "documents")
    val df = graft.operators.Dedup.minHashDedup(docs, "text", "doc_id")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "near-dup dedup planned an all-pairs join")
  }

  test("st12b reconcile: doomed set is a (band,key) equi-join, no cartesian") {
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_ps_store").toString + "/t"
    val sigs = (0 until 64).map(i =>
      (i.toLong, i % 4, s"k${i % 8}")).toDF("id", "band", "key")
    graft.core.TxnTable.create(spark, store, sigs)
    val kept = java.nio.file.Files
      .createTempDirectory("graft_ps_kept").toString + "/t"
    graft.core.TxnTable.create(spark, kept,
      (0 until 64).map(i => (i.toLong, s"d$i")).toDF("doc_id", "text"))
    graft.streaming.StreamDedup.reconcile(spark, store, kept)
    // the repair ran distributively: verify result AND that a rebuilt
    // doomed plan is equi-join-shaped
    val st = graft.core.TxnTable.read(spark, store)
    val doomed = st.as("a").join(st.as("b"),
      org.apache.spark.sql.functions.col("a.band") ===
        org.apache.spark.sql.functions.col("b.band") &&
        org.apache.spark.sql.functions.col("a.key") ===
          org.apache.spark.sql.functions.col("b.key") &&
        org.apache.spark.sql.functions.col("b.id") <
          org.apache.spark.sql.functions.col("a.id"), "left_semi")
    doomed.collect()
    val p = doomed.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "reconcile's store self-join degraded to an all-pairs product")
    // lower-id-wins on (band, key): only the 8 minimum ids survive
    assert(graft.core.TxnTable.read(spark, kept).count() == 8)
  }

  test("l3d txn-vector-index serving: pruned files, pushed list filter, heap") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Lake.table(spark, sf0001, "embeddings")
    val idx = java.nio.file.Files.createTempDirectory("graft_ps_txnvec")
      .toString + "/t"
    val data = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
    graft.operators.TxnVectorIndex.build(data, "vec_id", "embedding", idx,
      nlist = 8)
    // one lazy tranche so the snapshot holds a REAL tombstone list too
    graft.operators.TxnVectorIndex.upsertLazy(
      data.filter(col("vec_id") % 7 === 0), "vec_id", "embedding", idx)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toSeq
    val df = graft.operators.TxnVectorIndex.topK(spark, idx, q, 10, nprobe = 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("embeddings.parquet"), "serving plan rescanned the corpus")
    assert(p.contains("TakeOrderedAndProject"),
      "ANN top-k must be a heap, not a total sort")
    // the residual list predicate pushes into the pruned parquet scan
    assert(p.contains("PushedFilters") && p.contains("In(list"),
      "list filter not pushed into the index scan")
    // driver-side footer pruning: the scan's file set is the probed
    // lists + the tombstone list, a strict subset of the snapshot
    val read = df.inputFiles.length
    val live = graft.core.TxnTable.snapshotFiles(idx).size
    assert(read > 0 && read < live && read <= 8,
      s"serve must read only probed+tombstone files: $read of $live")
  }

  test("l37 txn-index serving: no corpus scan, term filter pushed, heap top-k") {
    val docs = graft.core.Lake.table(spark, sf0001, "documents")
    val idx = java.nio.file.Files.createTempDirectory("graft_ps_txnidx")
      .toString + "/t"
    graft.operators.TxnIndex.build(docs, "doc_id", "text", idx, 16)
    val df = graft.operators.TxnIndex.bm25TopK(spark, idx,
      Seq("dup", "join"), 10)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("documents.parquet"), "serving plan rescanned the corpus")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("PushedFilters") && p.contains("In(term"),
      "term filter not pushed into the postings scan")
  }
}
