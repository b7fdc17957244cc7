package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.TxnTable
import graft.streaming.StreamChanges

/** Round-15 probes (SCALING.md):
  *  1. OPTIMIZE (binPack) cost tracks ELIGIBLE bytes, not table size —
  *     the property that makes an explicit OPTIMIZE usable on a 100 TB
  *     table: a small-file tail folds in the same time whether the
  *     untouched archive behind it is 1× or 2×. Measured by building
  *     two tables with identical 64-file tails over archives of 4 vs 8
  *     large files and comparing binPack wall times + survivor counts.
  *  2. Tail-follow change feed (`startingVersion`) — the r14 verdict's
  *     one weak mark: a consumer who wants "changes from now on" must
  *     NOT pay a v0 full-snapshot spool. Measured: default feed (full
  *     history) vs tail feed over the same 2M-row table — pump wall
  *     time and spool bytes on disk; the tail feed must spool only the
  *     banded update, orders of magnitude smaller.
  * Usage: runMain graft.tools.R15Bench
  */
object R15Bench {
  private def loadavg: String =
    scala.util.Try(java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).trim.split(" ").take(3)
      .mkString(",")).getOrElse("?")

  private def dirBytes(p: String): Long = {
    val root = java.nio.file.Paths.get(p)
    if (!java.nio.file.Files.isDirectory(root)) return 0L
    val walk = java.nio.file.Files.walk(root)
    try {
      var total = 0L
      walk.iterator().forEachRemaining { f =>
        if (java.nio.file.Files.isRegularFile(f))
          total += java.nio.file.Files.size(f)
      }
      total
    } finally walk.close()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    println(s"loadavg_start=$loadavg")
    val root = java.nio.file.Files.createTempDirectory("r15bench").toString

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // -- probe 1: binPack cost tracks eligible bytes ---------------------
    def buildTable(path: String, archiveFiles: Int): Unit = {
      val big = spark.range(archiveFiles * 500000L)
        .select(col("id"), (col("id") % 97).as("k"),
          md5(col("id").cast("string")).as("payload"))
      TxnTable.create(spark, path, big, partitions = archiveFiles)
      // a 64-file small tail: the streaming-day shape
      (0 until 64).foreach { i =>
        TxnTable.append(spark, path,
          spark.range(i * 1000L, i * 1000L + 1000L)
            .select(col("id") + 100000000L as "id",
              (col("id") % 97).as("k"),
              md5(col("id").cast("string")).as("payload")))
      }
    }
    for (archive <- Seq(4, 8)) {
      val t = s"$root/bp$archive"
      buildTable(t, archive)
      val before = TxnTable.snapshotFiles(t).size
      val (_, wall) = time {
        TxnTable.binPack(spark, t, targetBytes = 16L * 1024 * 1024)
      }
      val after = TxnTable.snapshotFiles(t).size
      println(f"binPack archive=$archive%d files $before%d -> $after%d " +
        f"wall=$wall%.2f loadavg=$loadavg")
      require(after == archive + 1,
        s"the $archive archive files must survive untouched, got $after")
    }

    // -- probe 2: tail-follow feed spools zero history -------------------
    val src = s"$root/feed_src"
    val rows = spark.range(2000000L)
      .select(col("id"), (col("id") % 1000).as("band"),
        md5(col("id").cast("string")).as("payload"))
    TxnTable.create(spark, src, rows, partitions = 16) // v0: 2M rows
    TxnTable.updateWhere(spark, src, col("band") === 7,
      Map("payload" -> lit("updated")))                // v1: 2k rows
    val (_, fullWall) = time {
      StreamChanges.pump(spark, src, s"$root/spool_full",
        s"$root/pc_full", Seq("id"))
    }
    val fullBytes = dirBytes(s"$root/spool_full")
    val (_, tailWall) = time {
      StreamChanges.pump(spark, src, s"$root/spool_tail",
        s"$root/pc_tail", Seq("id"), startingVersion = Some(1L))
    }
    val tailBytes = dirBytes(s"$root/spool_tail")
    println(f"feed full: wall=$fullWall%.2f spoolMB=${fullBytes / 1e6}%.1f")
    println(f"feed tail: wall=$tailWall%.2f spoolMB=${tailBytes / 1e6}%.1f " +
      f"loadavg=$loadavg")
    require(tailBytes < fullBytes / 20,
      s"tail feed must spool a small fraction: $tailBytes vs $fullBytes")

    spark.stop()
  }
}
