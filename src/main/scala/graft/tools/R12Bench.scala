package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Lake, TxnTable}
import graft.crawler.SkippingIndex

/** Round-12 probes (SCALING.md):
  *  1. CHECK-constraint guard overhead — the claim is the assert_true
  *     filter rides INSIDE the write job (single pass): append wall
  *     time with 0 vs 2 active constraints on identical data.
  *  2. Stats-in-log prune planning at a HIGH file count — the same
  *     pruned read planned from the commit log (zero footer opens) vs
  *     from parquet footers (one open per file, distributed past 256
  *     files); footerReads counted for both.
  * Usage: runMain graft.tools.R12Bench [sfDir]
  */
object R12Bench {
  private def loadavg: String =
    scala.util.Try(java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).trim.split(" ").take(3)
      .mkString(",")).getOrElse("?")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"loadavg_start=$loadavg sf=$sfDir")
    val root = java.nio.file.Files.createTempDirectory("graft_r12b").toString
    val li = Lake.table(spark, sfDir, "lineitem")
      .select((col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
        col("l_orderkey").as("g"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .localCheckpoint() // pin the input so both probes append the same rows

    // probe 1: constraint guard overhead on the append path
    val plain = s"$root/plain"
    val guarded = s"$root/guarded"
    TxnTable.create(spark, plain, li.limit(1))
    TxnTable.create(spark, guarded, li.limit(1))
    TxnTable.addConstraint(spark, guarded, "price_nonneg", "price_c >= 0")
    TxnTable.addConstraint(spark, guarded, "id_pos", "id > 0")
    def appendBest(t: String): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        TxnTable.append(spark, t, li, partitions = 32)
        (System.nanoTime() - t0) / 1e9
      }.min
    val aPlain = appendBest(plain)
    val aGuarded = appendBest(guarded)
    println(f"constraints appendPlain=$aPlain%.3f appendGuarded=$aGuarded%.3f " +
      f"overhead=${aGuarded / aPlain}%.2fx loadavg=$loadavg")

    // probe 2: prune planning at 2000 files — log stats vs footers
    def mk2000(name: String, stats: Boolean): String = {
      val t = s"$root/$name"
      TxnTable.collectWriteStats = stats
      try TxnTable.createClustered(spark, t, li, Seq(col("g")),
        targetFiles = 2000)
      finally TxnTable.collectWriteStats = true
      t
    }
    val tLog = mk2000("logstats", stats = true)
    val tFoot = mk2000("footers", stats = false)
    val hi = li.agg(max(col("g"))).head().getLong(0)
    def planBest(t: String): (Double, Long, Long) = {
      var best = Double.MaxValue
      var reads = 0L
      var rows = 0L
      (1 to 3).foreach { _ =>
        val f0 = SkippingIndex.footerReads.get()
        val t0 = System.nanoTime()
        rows = TxnTable.readPruned(spark, t, "g", hi / 2, hi / 2 + hi / 64)
          .count()
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best) { best = dt; reads = SkippingIndex.footerReads.get() - f0 }
      }
      (best, reads, rows)
    }
    val (sLog, rLog, nLog) = planBest(tLog)
    val (sFoot, rFoot, nFoot) = planBest(tFoot)
    require(nLog == nFoot, s"both paths must return the same rows: $nLog/$nFoot")
    println(f"prune2000 logSec=$sLog%.3f logFooterReads=$rLog " +
      f"footerSec=$sFoot%.3f footerFooterReads=$rFoot rows=$nLog " +
      f"loadavg=$loadavg")
    spark.stop()
  }
}
