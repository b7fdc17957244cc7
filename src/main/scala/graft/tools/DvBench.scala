package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Lake, TxnTable}

/** Growth-scale probes for DELETION VECTORS (SCALING.md): the claim is
  * that a scattered delete costs O(deleted rows) under merge-on-read
  * where copy-on-write pays O(bytes of every touched file).
  *  1. scattered delete (one key in a thousand — hits EVERY file of the
  *     clustered layout, CoW's worst case): `deleteWhere` wall time vs
  *     `deleteWhereMor` on two identical tables;
  *  2. read overhead while a DV is live: full-scan aggregate on the
  *     MOR table (anti-join plan) vs the CoW table (plain scan);
  *  3. `compact` as the escape valve: materialization cost, then the
  *     re-read back on the plain-scan plan.
  * Usage: runMain graft.tools.DvBench [sfDir]
  */
object DvBench {
  private def loadavg: String =
    scala.util.Try(java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).trim.split(" ").take(3)
      .mkString(",")).getOrElse("?")

  private def timeIt[A](f: => A): (Double, A) = {
    var best = Double.MaxValue
    var out: A = null.asInstanceOf[A]
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      out = f
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    (best, out)
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
    println(s"loadavg_start=$loadavg sf=$sfDir")

    val root = java.nio.file.Files.createTempDirectory("graft_dvbench")
      .toString
    val li = Lake.table(spark, sfDir, "lineitem")
      .select((col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
        col("l_orderkey").as("g"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"))
    val nRows = li.count()
    def mkTable(name: String): String = {
      val t = s"$root/$name"
      TxnTable.createClustered(spark, t, li, Seq(col("g")),
        targetFiles = 200)
      t
    }
    val cow = mkTable("cow")
    val mor = mkTable("mor")
    println(s"rows=$nRows files=${TxnTable.snapshotFiles(cow).size} x2 tables")

    // scattered predicate: ~1/997 ids, spread over every file (997 is
    // prime, so coprime with the id = orderkey*8 + linenumber encoding
    // whose residues mod 8 exclude 0)
    val pred = col("id") % 997L === 0L
    val doomed = li.filter(pred).count()
    require(doomed > 0, "probe predicate must hit")

    // DV-free baseline on the SAME 200-file layout (the CoW table's
    // post-delete layout is consolidated by its rewrite, so it is NOT
    // the comparison point for read overhead)
    val (baseRead, base) = timeIt(TxnTable.read(spark, mor)
      .agg(count(lit(1)), sum(col("price_c"))).head())

    // probe 1: CoW vs MOR delete (single-shot each — a delete commits)
    val t0 = System.nanoTime()
    TxnTable.deleteWhere(spark, cow, pred)
    val cowSec = (System.nanoTime() - t0) / 1e9
    val cowRewrote = TxnTable.commits(cow).last.removes.size
    val t1 = System.nanoTime()
    TxnTable.deleteWhereMor(spark, mor, pred)
    val morSec = (System.nanoTime() - t1) / 1e9
    val morRewrote = TxnTable.commits(mor).last.removes.size
    val dvBytes = {
      val dv = java.nio.file.Paths.get(mor, "dv")
      val it = java.nio.file.Files.list(dv)
      try it.iterator().next().toFile.length finally it.close()
    }
    println(f"delete doomed=$doomed cowSec=$cowSec%.3f " +
      f"cowFilesRewritten=$cowRewrote morSec=$morSec%.3f " +
      f"morFilesRewritten=$morRewrote dvBytes=$dvBytes loadavg=$loadavg")

    // probe 2: read overhead with the DV live — same table, same
    // 200-file layout, before (baseline above) vs after the dvdelete
    val (cowRead, a) = timeIt(TxnTable.read(spark, cow)
      .agg(count(lit(1)), sum(col("price_c"))).head())
    val (morRead, b) = timeIt(TxnTable.read(spark, mor)
      .agg(count(lit(1)), sum(col("price_c"))).head())
    require(a == b, s"CoW and MOR must agree: $a vs $b")
    println(f"read baselineSec=$baseRead%.3f morSec=$morRead%.3f " +
      f"overhead=${morRead / baseRead}%.2fx " +
      f"(cowConsolidatedSec=$cowRead%.3f) loadavg=$loadavg")

    // probe 4 (fresh tables): scattered keyed MERGE, CoW vs MOR —
    // reprice 1/997 of the keys, hitting most files of the layout
    val cowM = mkTable("cow_m")
    val morM = mkTable("mor_m")
    val batch = li.filter(pred).withColumn("price_c", col("price_c") * 2)
    val t2 = System.nanoTime()
    TxnTable.merge(spark, cowM, batch, Seq("id"))
    val cowMSec = (System.nanoTime() - t2) / 1e9
    val cowMRewrote = TxnTable.commits(cowM).last.removes.size
    val t3 = System.nanoTime()
    TxnTable.mergeMor(spark, morM, batch, Seq("id"))
    val morMSec = (System.nanoTime() - t3) / 1e9
    val morMRewrote = TxnTable.commits(morM).last.removes.size
    val (ra, a2) = timeIt(TxnTable.read(spark, cowM)
      .agg(count(lit(1)), sum(col("price_c"))).head())
    val (rb, b2) = timeIt(TxnTable.read(spark, morM)
      .agg(count(lit(1)), sum(col("price_c"))).head())
    require(a2 == b2, s"CoW and MOR merge must agree: $a2 vs $b2")
    println(f"merge changed=$doomed cowSec=$cowMSec%.3f " +
      f"cowFilesRewritten=$cowMRewrote morSec=$morMSec%.3f " +
      f"morFilesRewritten=$morMRewrote readCow=$ra%.3f readMor=$rb%.3f " +
      f"loadavg=$loadavg")

    // probe 3: compaction materializes; read returns to the plain plan
    // (same 200-file target, so postRead is comparable to baseline)
    val (compSec, _) = { // single-shot: compaction commits
      val s = System.nanoTime()
      TxnTable.compact(spark, mor, targetFiles = 200)
      ((System.nanoTime() - s) / 1e9, ())
    }
    require(TxnTable.snapshotDvs(mor).isEmpty, "compact must clear DVs")
    val (postRead, c) = timeIt(TxnTable.read(spark, mor)
      .agg(count(lit(1)), sum(col("price_c"))).head())
    require(c == a, "content must survive materialization")
    println(f"compact sec=$compSec%.3f postReadSec=$postRead%.3f " +
      f"(vs baseline $baseRead%.3f) loadavg=$loadavg")
    spark.stop()
  }
}
