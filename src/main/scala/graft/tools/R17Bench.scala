package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.TxnTable
import graft.sql.GraftSql

/** Round-17 probes (SCALING.md):
  *  1. Incremental MV refresh wall is FLAT in table size (4M vs 16M
  *     rows, fixed changed band): incremental vs a full-recompute
  *     twin of the same width (avg blocks the fold), wall + files.
  *  2. Tail re-cluster cost tracks the TAIL bytes: 4M-row clustered
  *     table + a 2% tail, bare `OPTIMIZE ZORDER` (tail) vs
  *     an explicit full `ZORDER BY` re-cluster on a twin.
  *  3. Log-stats CBO planning overhead: GraftSql.query planning wall
  *     with injection on vs off over a registered 4M-row table
  *     (stats fold once per (path, version) — the second query must
  *     be memo-hit cheap).
  * Usage: runMain graft.tools.R17Bench
  */
object R17Bench {
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
    val root = java.nio.file.Files.createTempDirectory("r17bench").toString

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // -- probe 1: incremental refresh wall is FLAT in table size ----------
    // (the fixed stage-count of the fold dominates at toy scale; the
    // claim that matters for 100 TB is that incremental cost tracks
    // the CHANGED BAND — so the probe holds the band fixed, scales the
    // table 4x, and expects the incremental wall flat while the full
    // recompute grows with the scan)
    GraftSql.setWarehouse(root)
    for (rows <- Seq(4000000L, 16000000L)) {
      val t = s"$root/mvsrc_$rows"
      // 64-file g-clustered source: the banded update rewrites ~1 file
      TxnTable.createClustered(spark, t,
        spark.range(rows).select(
          (col("id") % 2000L).as("g"),
          (col("id") * 7919L % 100000L).as("v"),
          col("id").as("k")),
        Seq(col("g")), targetFiles = 64)
      val n = s"r17src$rows"
      GraftSql.register(n, t)
      GraftSql.execute(spark,
        s"CREATE MATERIALIZED VIEW r17mv_$rows LOCATION '$root/mv$rows' " +
          s"AS SELECT g, count(*) AS c, sum(v) AS sv, min(v) AS mn, " +
          s"max(v) AS mx FROM $n GROUP BY g")
      // a FULL-recompute twin of the same width (avg blocks the fold)
      GraftSql.execute(spark,
        s"CREATE MATERIALIZED VIEW r17mvf_$rows LOCATION '$root/mvf$rows' " +
          s"AS SELECT g, count(*) AS c, sum(v) AS sv, min(v) AS mn, " +
          s"max(v) AS mx, avg(v) AS av FROM $n GROUP BY g")
      // FIXED narrow band: 30 of 2000 groups ≈ 1 of 64 files
      GraftSql.execute(spark, s"UPDATE $n SET v = v + 3 WHERE g < 30")
      val (_, wInc) = time(
        GraftSql.execute(spark, s"REFRESH MATERIALIZED VIEW r17mv_$rows"))
      val st = GraftSql.lastMvRefreshStats.get
      val (_, wFull) = time(
        GraftSql.execute(spark, s"REFRESH MATERIALIZED VIEW r17mvf_$rows"))
      println(f"probe1 mv_refresh rows=$rows incremental=$wInc%.3f s " +
        f"(mode=${st.mode} changed=${st.changedFiles.size} " +
        f"recompute=${st.recomputeFiles.size} live=${st.liveFiles}) " +
        f"full=$wFull%.3f s loadavg=$loadavg")
      GraftSql.execute(spark, s"DROP MATERIALIZED VIEW r17mv_$rows")
      GraftSql.execute(spark, s"DROP MATERIALIZED VIEW r17mvf_$rows")
      GraftSql.unregister(n)
    }

    // -- probe 2: tail vs full re-cluster ----------------------------------
    {
      val rows = 4000000L
      def mk(path: String): Unit = {
        TxnTable.createClustered(spark, path,
          spark.range(rows).select(
            (col("id") % 65536L).as("a"),
            ((col("id") * 2654435761L) % 65536L).as("b")),
          Seq(col("a"), col("b")), targetFiles = 64)
        TxnTable.append(spark, path, // ~2% tail
          spark.range(rows / 50).select(
            (col("id") % 65536L).as("a"),
            ((col("id") * 48271L) % 65536L).as("b")))
      }
      val t1 = s"$root/zt"; mk(t1)
      val t2 = s"$root/zf"; mk(t2)
      val n1 = "r17zt"; GraftSql.register(n1, t1)
      val n2 = "r17zf"; GraftSql.register(n2, t2)
      val (_, wTail) = time(
        GraftSql.execute(spark, s"OPTIMIZE $n1 ZORDER"))
      val cTail = TxnTable.commits(t1).last
      val (_, wFull) = time(
        GraftSql.execute(spark, s"OPTIMIZE $n2 ZORDER BY (a, b)"))
      val cFull = TxnTable.commits(t2).last
      println(f"probe2 recluster rows=$rows tail=$wTail%.3f s " +
        f"(rewrote=${cTail.removes.size} files) full=$wFull%.3f s " +
        f"(rewrote=${cFull.removes.size} files) " +
        f"ratio=${wFull / wTail}%.1f loadavg=$loadavg")
      GraftSql.unregister(n1); GraftSql.unregister(n2)
    }

    // -- probe 3: log-stats planning overhead ------------------------------
    {
      val t = s"$root/cbo"
      TxnTable.create(spark, t, spark.range(4000000L).select(
        col("id").as("k"), (col("id") % 1000L).as("g")), partitions = 16)
      val n = "r17cbo"; GraftSql.register(n, t)
      val sql = s"SELECT g, count(*) AS c FROM $n WHERE k < 100 GROUP BY g"
      spark.conf.set("spark.graft.cbo.logStats", "false")
      val (_, wOff) = time(GraftSql.query(spark, sql).queryExecution
        .executedPlan)
      spark.conf.set("spark.graft.cbo.logStats", "true")
      val (_, wCold) = time(GraftSql.query(spark, sql).queryExecution
        .executedPlan)
      val (_, wWarm) = time(GraftSql.query(spark, sql).queryExecution
        .executedPlan)
      spark.conf.unset("spark.graft.cbo.logStats")
      println(f"probe3 cbo_planning off=$wOff%.3f s cold=$wCold%.3f s " +
        f"warm(memo)=$wWarm%.3f s loadavg=$loadavg")
      GraftSql.unregister(n)
    }

    println(s"loadavg_end=$loadavg")
    spark.stop()
  }
}
