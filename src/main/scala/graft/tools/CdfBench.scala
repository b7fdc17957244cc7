package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Lake, TxnTable}
import graft.operators.IncrementalView

/** Growth-scale probes for the CDF / IVM / clone paths (SCALING.md):
  *  1. `diffVersions` cost vs changed-file fraction on a many-file
  *     table — the claim is O(changed files), not O(snapshot);
  *  2. incremental min/max fold ([[IncrementalView]]) vs full
  *     re-aggregation — where the crossover sits as the per-version
  *     delta grows;
  *  3. shallow clone: metadata-only cost on the same many-file table.
  * Usage: runMain graft.tools.CdfBench [sfDir]
  */
object CdfBench {
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

    val root = java.nio.file.Files.createTempDirectory("graft_cdfbench")
      .toString
    val t = s"$root/li"
    val li = Lake.table(spark, sfDir, "lineitem")
      .select((col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
        col("l_orderkey").as("g"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"))
    val nRows = li.count()
    val mx = li.agg(max(col("g"))).head().getLong(0)
    TxnTable.createClustered(spark, t, li, Seq(col("g")),
      targetFiles = 200) // v0: 200 files clustered on g
    println(s"table rows=$nRows files=${TxnTable.snapshotFiles(t).size}")

    // ---- probe 1+2: per-fraction rewrite commits, then CDF + IVM ----
    // each version doubles price over a key-range fraction (1%, 10%,
    // 50%) — file-scoped rewrites on the clustered layout
    val fractions = Seq(0.01, 0.10, 0.50)
    fractions.zipWithIndex.foreach { case (fr, i) =>
      val hi = (mx * fr).toLong.max(1L)
      TxnTable.merge(spark, t,
        li.filter(col("g") <= hi)
          .select(col("id"), col("g"), (col("price_c") * 2).as("price_c")),
        Seq("id"), partitions = math.max(1, (200 * fr).toInt),
        clusterBy = Seq(col("g")))
      val v = i + 1L
      val before = TxnTable.snapshotFiles(t, v - 1).toSet
      val after = TxnTable.snapshotFiles(t, v).toSet
      val changed = (before -- after).size + (after -- before).size
      val (dSec, dRows) = timeIt(
        TxnTable.diffVersions(spark, t, v - 1, v, Seq("id")).count())
      println(f"diff frac=$fr%.2f changedFiles=$changed " +
        f"liveFiles=${after.size} sec=$dSec%.3f rows=$dRows loadavg=$loadavg")
    }

    // IVM: fold each version's delta vs re-aggregating the snapshot
    var state = IncrementalView.materializeMinMax(
      TxnTable.read(spark, t, 0L), "g", "price_c")
    state.count() // materialize the base state outside the timers
    fractions.zipWithIndex.foreach { case (fr, i) =>
      val v = i + 1L
      val s0 = state
      var stats: IncrementalView.StepStats = null
      val (foldSec, next) = timeIt {
        val (n, st) = IncrementalView.maintainMinMaxStep(spark, t, s0,
          v - 1, v, Seq("id"), "g", "price_c")
        stats = st; n.count(); n
      }
      val (fullSec, _) = timeIt {
        val m = IncrementalView.materializeMinMax(
          TxnTable.read(spark, t, v), "g", "price_c")
        m.count(); m
      }
      println(f"ivm frac=$fr%.2f foldSec=$foldSec%.3f " +
        f"fullReaggSec=$fullSec%.3f affected=${stats.affectedGroups} " +
        f"prunedRead=${stats.filesRead}/${stats.liveFiles} loadavg=$loadavg")
      state = next
    }

    // ---- probe 3: shallow clone of the 200-file table ----
    val dst = s"$root/clone"
    val (cSec, _) = { // single-shot: clone is create-once
      val t0 = System.nanoTime()
      TxnTable.cloneShallow(spark, t, dst)
      ((System.nanoTime() - t0) / 1e9, ())
    }
    val zeroData = !java.nio.file.Files.exists(
      java.nio.file.Paths.get(dst, "data"))
    val (rSec, rRows) = timeIt(TxnTable.read(spark, dst).count())
    println(f"clone sec=$cSec%.3f zeroDataFiles=$zeroData " +
      f"readSec=$rSec%.3f rows=$rRows loadavg=$loadavg")
    spark.stop()
  }
}
