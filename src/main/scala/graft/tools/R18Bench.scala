package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.TxnTable
import graft.sql.GraftSql

/** Round-18 probes (SCALING.md):
  *  1. STAR-JOIN incremental MV refresh wall is FLAT in fact size
  *     (4M vs 16M rows, fixed changed band, dim fixed): the fact
  *     delta folds through the broadcast dim, so the incremental wall
  *     must not track the fact scan while the full-recompute twin
  *     (count(DISTINCT) blocks the fold) does.
  *  2. CARRY+RECOMPUTE refresh (avg MV): untouched groups carried,
  *     touched groups re-read through the pruned scan — wall flat in
  *     table size at a fixed band, recompute files ∝ band.
  *  3. SCOPED re-cluster cost tracks the BOX bytes: zscope over ~3%
  *     of a 64-file clustered table vs a full re-cluster twin.
  *  4. Histogram ANALYZE is one bounded scan; planning with the
  *     histogram injected stays zero-footer and memo-cheap.
  * Usage: runMain graft.tools.R18Bench
  */
object R18Bench {
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
    val root = java.nio.file.Files.createTempDirectory("r18bench").toString

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    GraftSql.setWarehouse(root)

    // -- probe 1: star-join MV refresh is flat in fact size ---------------
    {
      val dimT = s"$root/dim"
      TxnTable.create(spark, dimT, spark.range(2000L).select(
        col("id").as("k"), concat(lit("rg"), col("id") % 40L).as("rg")))
      val nd = "r18dim"; GraftSql.register(nd, dimT)
      for (rows <- Seq(4000000L, 16000000L)) {
        val t = s"$root/fact_$rows"
        TxnTable.createClustered(spark, t,
          spark.range(rows).select(
            (col("id") % 2000L).as("g"),
            (col("id") * 7919L % 100000L).as("v")),
          Seq(col("g")), targetFiles = 64)
        val nf = s"r18fact$rows"; GraftSql.register(nf, t)
        GraftSql.execute(spark,
          s"CREATE MATERIALIZED VIEW r18jmv_$rows LOCATION " +
            s"'$root/jmv$rows' AS SELECT d.rg, count(*) AS c, " +
            s"sum(f.v) AS sv FROM $nf f JOIN $nd d ON f.g = d.k " +
            "GROUP BY d.rg")
        // a full-recompute twin: count(DISTINCT) blocks every fold
        GraftSql.execute(spark,
          s"CREATE MATERIALIZED VIEW r18jmvf_$rows LOCATION " +
            s"'$root/jmvf$rows' AS SELECT d.rg, count(DISTINCT f.v) " +
            s"AS cd FROM $nf f JOIN $nd d ON f.g = d.k GROUP BY d.rg")
        GraftSql.execute(spark, s"UPDATE $nf SET v = v + 3 WHERE g < 30")
        val (_, wInc) = time(GraftSql.execute(spark,
          s"REFRESH MATERIALIZED VIEW r18jmv_$rows"))
        val st = GraftSql.lastMvRefreshStats.get
        val (_, wFull) = time(GraftSql.execute(spark,
          s"REFRESH MATERIALIZED VIEW r18jmvf_$rows"))
        println(f"probe1 join_mv rows=$rows incremental=$wInc%.3f s " +
          f"(mode=${st.mode} changed=${st.changedFiles.size} " +
          f"recompute=${st.recomputeFiles.size} live=${st.liveFiles}) " +
          f"full_twin=$wFull%.3f s loadavg=$loadavg")
        // 1b: BOTH sides churn in one window — the telescoping
        // expansion folds each delta in turn; wall stays delta-sized
        GraftSql.execute(spark, s"UPDATE $nf SET v = v + 1 WHERE g < 30")
        GraftSql.execute(spark,
          s"UPDATE $nd SET rg = concat('x', rg) WHERE k < 10")
        val (_, wBoth) = time(GraftSql.execute(spark,
          s"REFRESH MATERIALIZED VIEW r18jmv_$rows"))
        val st2 = GraftSql.lastMvRefreshStats.get
        println(f"probe1b two_sided rows=$rows incremental=$wBoth%.3f s " +
          f"(mode=${st2.mode} changed=${st2.changedFiles.size} " +
          f"recompute=${st2.recomputeFiles.size}) loadavg=$loadavg")
        // restore the dim for the next fact size
        GraftSql.execute(spark,
          s"UPDATE $nd SET rg = substring(rg, 2) WHERE k < 10")
        GraftSql.execute(spark, s"DROP MATERIALIZED VIEW r18jmv_$rows")
        GraftSql.execute(spark, s"DROP MATERIALIZED VIEW r18jmvf_$rows")
        GraftSql.unregister(nf)
      }
      GraftSql.unregister(nd)
    }

    // -- probe 2: carry+recompute (avg) refresh ----------------------------
    for (rows <- Seq(4000000L, 16000000L)) {
      val t = s"$root/avgsrc_$rows"
      TxnTable.createClustered(spark, t,
        spark.range(rows).select(
          (col("id") % 2000L).as("g"),
          (col("id") * 7919L % 100000L).as("v")),
        Seq(col("g")), targetFiles = 64)
      val n = s"r18avg$rows"; GraftSql.register(n, t)
      GraftSql.execute(spark,
        s"CREATE MATERIALIZED VIEW r18amv_$rows LOCATION '$root/amv$rows' " +
          s"AS SELECT g, count(*) AS c, avg(v) AS av, min(v) AS mn " +
          s"FROM $n GROUP BY g")
      GraftSql.execute(spark, s"UPDATE $n SET v = v + 3 WHERE g < 30")
      val (_, wInc) = time(GraftSql.execute(spark,
        s"REFRESH MATERIALIZED VIEW r18amv_$rows"))
      val st = GraftSql.lastMvRefreshStats.get
      println(f"probe2 avg_mv rows=$rows carry_recompute=$wInc%.3f s " +
        f"(mode=${st.mode} changed=${st.changedFiles.size} " +
        f"recompute=${st.recomputeFiles.size} live=${st.liveFiles}) " +
        f"loadavg=$loadavg")
      GraftSql.execute(spark, s"DROP MATERIALIZED VIEW r18amv_$rows")
      GraftSql.unregister(n)
    }

    // -- probe 3: scoped vs full re-cluster --------------------------------
    {
      val rows = 4000000L
      def mk(path: String): Unit =
        TxnTable.createClustered(spark, path,
          spark.range(rows).select(
            (col("id") % 65536L).as("a"),
            ((col("id") * 2654435761L) % 65536L).as("b")),
          Seq(col("a"), col("b")), targetFiles = 64)
      val t1 = s"$root/zs"; mk(t1)
      val t2 = s"$root/zsf"; mk(t2)
      val n1 = "r18zs"; GraftSql.register(n1, t1)
      val n2 = "r18zsf"; GraftSql.register(n2, t2)
      val (_, wBox) = time(GraftSql.execute(spark,
        s"OPTIMIZE $n1 ZORDER BY (a, b) WHERE a BETWEEN 0 AND 2047"))
      val cBox = TxnTable.commits(t1).last
      val (_, wFull) = time(GraftSql.execute(spark,
        s"OPTIMIZE $n2 ZORDER BY (a, b)"))
      val cFull = TxnTable.commits(t2).last
      println(f"probe3 zscope rows=$rows box=$wBox%.3f s " +
        f"(rewrote=${cBox.removes.size} files) full=$wFull%.3f s " +
        f"(rewrote=${cFull.removes.size} files) " +
        f"ratio=${wFull / wBox}%.1f loadavg=$loadavg")
      GraftSql.unregister(n1); GraftSql.unregister(n2)
    }

    // -- probe 4: histogram ANALYZE + planning -----------------------------
    {
      val t = s"$root/hist"
      TxnTable.create(spark, t, spark.range(4000000L).select(
        col("id").as("k"),
        when(col("id") % 100L === 0, col("id")).otherwise(lit(0L))
          .as("s")), partitions = 16)
      val n = "r18hist"; GraftSql.register(n, t)
      val (_, wAnalyze) = time(GraftSql.execute(spark,
        s"ANALYZE TABLE $n COMPUTE HISTOGRAM (s)"))
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.graft.cbo.logStats", "true")
      val f0 = graft.crawler.SkippingIndex.footerReads.get()
      val sql = s"SELECT count(*) AS c FROM $n WHERE s >= 2000000000"
      val (_, wCold) = time(GraftSql.query(spark, sql).queryExecution
        .executedPlan)
      val (_, wWarm) = time(GraftSql.query(spark, sql).queryExecution
        .executedPlan)
      val footers = graft.crawler.SkippingIndex.footerReads.get() - f0
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.graft.cbo.logStats")
      println(f"probe4 histogram analyze=$wAnalyze%.3f s " +
        f"plan_cold=$wCold%.3f s plan_warm=$wWarm%.3f s " +
        f"planning_footer_reads=$footers loadavg=$loadavg")
      GraftSql.unregister(n)
    }

    println(s"loadavg_end=$loadavg")
    spark.stop()
  }
}
