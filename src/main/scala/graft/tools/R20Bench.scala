package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TxnTable
import graft.operators.Dedup
import graft.sql.GraftSql

/** Round-20 scale probes, run on demand (not part of the driver bench).
  * The sf0.1 contract bench is floor-bound (8-core ≈ 32-core on all 16
  * queries — PERF_r19 scaling block), so every claimed optimization is
  * proven here at a scale where its cost driver is visible:
  *
  *   1. Jaccard pair generation: the old all-pairs cross join with
  *      array_intersect vs the inverted-index shared-shingle join
  *      (l1_dup_groups / p1_curation_pipeline pair stage), at two
  *      corpus sizes — the old form's wall must grow ~quadratically,
  *      the new form's with the shared-shingle mass; pair sets must be
  *      IDENTICAL.
  *   2. Bloom index: build wall (combineByKey merge) at two file
  *      counts, probe wall, and the probe's driver-return bound after
  *      heavy churn (lastBloomProbeCollected ≤ live files even when
  *      the aux table carries rows for dead files).
  *   3. String ANALYZE: wall + sanctioned scan count (must be 1) for
  *      an MCV/ndv stats build over a grown table, vs the 2-scan wall
  *      simulated by running the retired extra global-agg pass on the
  *      same table.
  *   4. Runtime Bloom-filter join pre-filter (guide §3.2): a selective
  *      dim filtering a fact too big to broadcast, with
  *      spark.sql.optimizer.runtime.bloomFilter on vs off — the plan
  *      must show bloom_filter_agg/might_contain and the ON wall must
  *      beat OFF by cutting the fact-side shuffle.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.R20Bench"
  */
object R20Bench {
  private def loadavg: String =
    scala.util.Try(java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).trim.split(" ").take(3)
      .mkString(",")).getOrElse("?")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"loadavg_start=$loadavg")
    val root = java.nio.file.Files.createTempDirectory("r20bench").toString
    val only = args.toSet
    def want(p: String): Boolean = only.isEmpty || only(p)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def med3(f: => Unit): Double =
      (1 to 3).map(_ => time(f)._2).sorted.apply(1)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // -- probe 1: inverted-index Jaccard pairs vs all-pairs ---------------
    // Synthetic corpus with planted near-dups: doc i and i+1 share most
    // shingles when i % 10 == 0; everything else is (mostly) disjoint.
    val probe1Sizes =
      if (only("probe1small")) Seq(2000) else Seq(2000, 8000)
    for (docs <- probe1Sizes if want("probe1") || only("probe1small")) {
      val base = spark.range(docs).select(col("id").as("doc_id"),
        transform(sequence(lit(0), lit(79)), j =>
          concat(col("id") - (col("id") % 10), lit("w"),
            when(j < 76, j).otherwise(j + (col("id") % 10) * 100)))
          .as("sh"))
      val sh = base.select(col("doc_id"),
        array_distinct(col("sh")).as("sh")).localCheckpoint(true)
      def oldPairs: DataFrame =
        sh.select(col("doc_id").as("a_id"), col("sh").as("sh_a"))
          .join(sh.select(col("doc_id").as("b_id"), col("sh").as("sh_b")),
            col("a_id") < col("b_id"))
          .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
          .withColumn("uni",
            size(col("sh_a")) + size(col("sh_b")) - col("inter"))
          .filter(col("inter").cast("double") / col("uni") >= 0.8)
          .select(col("a_id"), col("b_id"))
      def newPairs: DataFrame = Dedup.shingleJaccardPairs(sh, "doc_id", "sh", 0.8)
      if (docs == 2000) {
        // the resolveDupGroups tail checkpoints eagerly, so the gate's
        // own explain cannot show the pair stage — dump it here
        def fmt(df: DataFrame) = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(java.nio.file.Paths.get(
          "plans/r20/jaccard_pairs_stage_before.txt"), fmt(oldPairs))
        java.nio.file.Files.writeString(java.nio.file.Paths.get(
          "plans/r20/jaccard_pairs_stage_after.txt"), fmt(newPairs))
      }
      spark.sparkContext.setJobDescription(s"p1 jaccard pairs docs=$docs")
      val same = oldPairs.exceptAll(newPairs).isEmpty &&
        newPairs.exceptAll(oldPairs).isEmpty
      require(same, "probe1: pair sets must be identical")
      val nPairs = newPairs.count()
      val wOld = med3(noop(oldPairs))
      val wNew = med3(noop(newPairs))
      println(f"probe1 jaccard docs=$docs pairs=$nPairs old=$wOld%.3f s " +
        f"new=$wNew%.3f s speedup=${wOld / wNew}%.1fx loadavg=$loadavg")
    }

    // -- probe 2: bloom build + probe-return bound after churn -------------
    for (files <- Seq(16, 48) if want("probe2")) {
      val rows = files * 500000L
      val t = s"$root/bloom_$files"
      TxnTable.createClustered(spark, t, spark.range(rows).select(
        (col("id") % 1000L).as("g"), col("id").as("k"),
        concat(lit("payload-"), md5(col("id").cast("string")),
          lit("-"), md5((col("id") + 7L).cast("string")),
          lit("-"), md5((col("id") + 13L).cast("string")),
          lit("-"), md5((col("id") + 17L).cast("string"))).as("doc")),
        Seq(col("g")), targetFiles = files)
      val probes = Seq(rows / 3, 2 * rows / 3)
      spark.sparkContext.setJobDescription(s"bloom build files=$files")
      val (_, wBuild) = time(
        TxnTable.computeBloom(spark, t, Seq("k"), fpp = 0.01))
      val wScan = med3 {
        TxnTable.read(spark, t)
          .filter(col("k").isInCollection(probes)).collect()
      }
      val wBloom = med3 {
        TxnTable.readPrunedBloom(spark, t, "k", probes).collect()
      }
      val kept = TxnTable.readPrunedBloom(spark, t, "k", probes)
        .inputFiles.length
      val returned = TxnTable.lastBloomProbeCollected
      val live = TxnTable.snapshotFiles(t, -1L).size
      println(f"probe2 bloom files=$files rows=$rows build=$wBuild%.3f s " +
        f"scan=$wScan%.3f s bloom=$wBloom%.3f s kept=$kept " +
        f"probe_returned=$returned live=$live loadavg=$loadavg")
      require(returned <= live, "probe2: driver return must be ≤ live files")
    }
    // churn: compact so the aux table carries rows for files that are no
    // longer live — the probe job must keep its return bounded by LIVE
    if (want("probe2")) {
      val t = s"$root/bloom_16"
      TxnTable.compact(spark, t, targetFiles = 4)
      val probes = Seq(1L, 2L)
      TxnTable.readPrunedBloom(spark, t, "k", probes).collect()
      val live = TxnTable.snapshotFiles(t, -1L).size
      val auxRows = TxnTable.read(spark, TxnTable.bloomPath(t)).count()
      println(s"probe2b churn live=$live aux_rows=$auxRows " +
        s"probe_returned=${TxnTable.lastBloomProbeCollected}")
      require(TxnTable.lastBloomProbeCollected <= live,
        "probe2b: dead-file aux rows must not reach the driver")
    }

    // -- probe 3: string ANALYZE is one scan --------------------------------
    if (want("probe3")) {
      val t = s"$root/mcv"
      TxnTable.create(spark, t, spark.range(8000000L).select(
        when(col("id") % 100 === 0, concat(lit("rare"),
          (col("id") / 100).cast("string")))
          .otherwise(lit("common")).as("k"),
        md5(col("id").cast("string")).as("pad")), partitions = 32)
      val n = "r20mcv"
      GraftSql.register(n, t)
      spark.sparkContext.setJobDescription("string ANALYZE one-pass")
      val (_, wNew) = time(GraftSql.execute(spark,
        s"ANALYZE TABLE $n COMPUTE HISTOGRAM (k)"))
      val scans = TxnTable.lastAnalyzeScans
      // the retired extra pass: the global ndv+count aggregate the old
      // 2-scan form ran BEFORE the MCV pass, timed on the same table
      val df = TxnTable.read(spark, t)
      val wRetired = med3 {
        df.agg(count_distinct(col("k")), count(col("k"))).head()
      }
      GraftSql.unregister(n)
      println(f"probe3 analyze_mcv rows=8e6 wall=$wNew%.3f s scans=$scans " +
        f"retired_extra_pass=$wRetired%.3f s (old wall ≈ wall + retired) " +
        f"loadavg=$loadavg")
      require(scans == 1, s"string-only ANALYZE must be ONE scan, got $scans")
    }

    // -- probe 4: runtime Bloom-filter join pre-filter (guide §3.2) ---------
    if (want("probe4")) {
      val defEnabled = spark.conf
        .get("spark.sql.optimizer.runtime.bloomFilter.enabled")
      val fact = s"$root/rf_fact"
      // big enough that the fact-side SHUFFLE dominates the join: the
      // pre-filter's value is proportional to the bytes it keeps out
      // of the exchange (guide §3.2)
      TxnTable.create(spark, fact, spark.range(48000000L).select(
        (col("id") % 400000L).as("fk"), col("id").as("v"),
        concat(md5(col("id").cast("string")),
          md5((col("id") + 3L).cast("string"))).as("pad")), partitions = 32)
      val dim = s"$root/rf_dim"
      TxnTable.create(spark, dim, spark.range(400000L).select(
        col("id").as("dk"),
        (col("id") % 500L).as("cat"),
        md5(col("id").cast("string")).as("dpad")), partitions = 8)
      val f = TxnTable.read(spark, fact)
      val d = TxnTable.read(spark, dim).filter(col("cat") === 7L) // 0.2%
      def q = f.join(d, col("fk") === col("dk"))
        .agg(count(lit(1)), sum(col("v")))
      val conf = spark.conf
      val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      val saved = keys.map(k => k -> conf.getOption(k))
      try {
        // the dim is "too big to broadcast" at probe scale the same way
        // a 15-billion-row dim is at 100 TB scale
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.optimizer.runtime.bloomFilter" +
          ".applicationSideScanSizeThreshold", "10MB")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        val planOn = q.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        require(planOn.contains("bloom_filter_agg") ||
          planOn.contains("might_contain"),
          "probe4: the runtime bloom filter must appear in the plan")
        spark.sparkContext.setJobDescription("runtime bloom ON")
        val wOn = med3(noop(q))
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        spark.sparkContext.setJobDescription("runtime bloom OFF")
        val wOff = med3(noop(q))
        println(f"probe4 runtime_bloom on=$wOn%.3f s off=$wOff%.3f s " +
          f"speedup=${wOff / wOn}%.2fx default_enabled=$defEnabled " +
          s"loadavg=$loadavg")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("plans/r20/probe4_runtime_bloom_on.txt"),
          planOn)
      } finally saved.foreach { case (k, v) =>
        v.fold(conf.unset(k))(conf.set(k, _))
      }
    }

    println(s"loadavg_end=$loadavg")
    spark.stop()
  }
}
