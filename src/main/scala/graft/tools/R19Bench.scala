package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{TxnGroup, TxnTable}
import graft.sql.GraftSql

/** Round-19 scale probes, run on demand (not part of the driver bench):
  *
  *   1. MV-based query rewrite: the same aggregate statement timed with
  *      the rewrite ON vs OFF at two fact sizes — ON should be flat
  *      (a read of one row per group) while OFF grows with the fact.
  *   2. Per-file Bloom skipping: a point lookup on a high-cardinality
  *      column the layout does NOT cluster on, timed against the
  *      unindexed full-scan filter at two file counts — the bloom
  *      path's work should track the OWNING files, not the table.
  *   3. Write-group overhead: the same two DML statements run bare vs
  *      inside BEGIN/COMMIT GROUP — the durable intent costs two tiny
  *      object writes, so the delta should sit near the action floor.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.R19Bench"
  */
object R19Bench {
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
    val root = java.nio.file.Files.createTempDirectory("r19bench").toString

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def med3(f: => Unit): Double =
      (1 to 3).map(_ => time(f)._2).sorted.apply(1)

    GraftSql.setWarehouse(root)

    // -- probe 1: MV rewrite is flat in fact size --------------------------
    for (rows <- Seq(4000000L, 16000000L)) {
      val t = s"$root/fact_$rows"
      TxnTable.create(spark, t, spark.range(rows).select(
        (col("id") % 500L).as("g"),
        (col("id") * 7919L % 100000L).as("v")), partitions = 32)
      val n = s"r19fact$rows"; GraftSql.register(n, t)
      val q = s"SELECT g, count(*) AS c, sum(v) AS sv FROM $n GROUP BY g"
      GraftSql.execute(spark,
        s"CREATE MATERIALIZED VIEW r19mv_$rows LOCATION '$root/mv$rows' " +
          s"AS $q")
      val wOn = med3 { GraftSql.query(spark, q).collect() }
      require(GraftSql.lastMvRewrite.exists(_._2 == "exact"),
        "probe 1 must serve from the MV")
      GraftSql.execute(spark, "SET MATVIEW REWRITE OFF")
      val wOff = med3 { GraftSql.query(spark, q).collect() }
      GraftSql.execute(spark, "SET MATVIEW REWRITE ON")
      println(f"probe1 mv_rewrite rows=$rows on=$wOn%.3f s " +
        f"off=$wOff%.3f s speedup=${wOff / wOn}%.1fx")
    }

    // -- probe 2: bloom lookup tracks owning files, not table size ---------
    // The bloom path pays a FIXED two-job overhead (aux probe + pruned
    // scan) plus a distributed read of ~1.2 bytes of filter per table
    // row (fpp 1%) — so the crossover sits where the full scan costs
    // more than that, and the gap widens linearly with table size
    // (at cluster scale: hours of scan vs seconds of metadata).
    for (files <- Seq(16, 48)) {
      val rows = files * 500000L
      val t = s"$root/bloom_$files"
      // cluster on g so the lookup key k spreads across EVERY file;
      // rows carry a realistic ~150-byte payload — the bloom's
      // ~1.2 bytes/row metadata ratio is what the design trades on
      TxnTable.createClustered(spark, t, spark.range(rows).select(
        (col("id") % 1000L).as("g"), col("id").as("k"),
        concat(lit("payload-"), md5(col("id").cast("string")),
          lit("-"), md5((col("id") + 7L).cast("string")),
          lit("-"), md5((col("id") + 13L).cast("string")),
          lit("-"), md5((col("id") + 17L).cast("string"))).as("doc")),
        Seq(col("g")), targetFiles = files)
      val probes = Seq(rows / 3, 2 * rows / 3)
      val (_, wBuild) = time(
        TxnTable.computeBloom(spark, t, Seq("k"), fpp = 0.01))
      val bloomBytes = TxnTable.read(spark, t + "__bloom")
        .agg(sum(length(col("bloom")))).head().getLong(0)
      val wScan = med3 {
        TxnTable.read(spark, t)
          .filter(col("k").isInCollection(probes)).collect()
      }
      val wBloom = med3 {
        TxnTable.readPrunedBloom(spark, t, "k", probes).collect()
      }
      val kept = TxnTable.readPrunedBloom(spark, t, "k", probes)
        .inputFiles.length
      println(f"probe2 bloom files=$files rows=$rows build=$wBuild%.3f s " +
        f"scan=$wScan%.3f s bloom=$wBloom%.3f s kept=$kept " +
        f"bloom_mb=${bloomBytes / 1e6}%.1f speedup=${wScan / wBloom}%.1fx")
    }

    // -- probe 3: write-group intent overhead ------------------------------
    {
      val (ta, tb) = (s"$root/grp_a", s"$root/grp_b")
      TxnTable.create(spark, ta, spark.range(100000L).select(
        col("id"), (col("id") % 97L).as("v")), partitions = 4)
      TxnTable.create(spark, tb, spark.range(100000L).select(
        col("id"), (col("id") % 89L).as("v")), partitions = 4)
      val (na, nb) = ("r19ga", "r19gb")
      GraftSql.register(na, ta); GraftSql.register(nb, tb)
      val gdir = s"$root/groups"
      var band = 0L
      def pair(): Unit = {
        GraftSql.execute(spark,
          s"UPDATE $na SET v = v + 1 WHERE id % 50 = $band")
        GraftSql.execute(spark,
          s"DELETE FROM $nb WHERE id % 5000 = $band")
        band += 1
      }
      def grouped(): Unit = {
        GraftSql.execute(spark,
          s"""BEGIN GROUP AT '$gdir';
             |UPDATE $na SET v = v + 1 WHERE id % 50 = $band;
             |DELETE FROM $nb WHERE id % 5000 = $band;
             |COMMIT GROUP""".stripMargin)
        band += 1
      }
      pair(); grouped() // warm
      val wBare = med3(pair())
      val wGrp = med3(grouped())
      println(f"probe3 txn_group bare=$wBare%.3f s grouped=$wGrp%.3f s " +
        f"overhead=${wGrp - wBare}%.3f s")
    }

    println(s"loadavg_end=$loadavg")
    spark.stop()
  }
}
