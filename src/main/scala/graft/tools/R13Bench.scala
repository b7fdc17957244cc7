package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Lake, TxnTable}

/** Round-13 probes (SCALING.md):
  *  1. Metadata-only COUNT — countRange vs the equivalent pruned-read
  *     count on a clustered table at growing file counts: the claim is
  *     the metadata path stays O(files) driver metadata (no Spark job
  *     at all when bounds decide) while any scan-based count pays job
  *     latency + data I/O.
  *  2. Exact substring-span dedup throughput on documents: stats pass
  *     and removal pass wall time (the removal pass carries the extra
  *     position-explode + regroup).
  *  3. SQL DML translation overhead — GraftSql.execute(UPDATE ...) vs
  *     the direct updateWhere call on identical tables: the facade
  *     claims parse-only cost.
  * Usage: runMain graft.tools.R13Bench [sfDir]
  */
object R13Bench {
  private def loadavg: String =
    scala.util.Try(java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).trim.split(" ").take(3)
      .mkString(",")).getOrElse("?")

  private def best(n: Int)(f: => Unit): Double =
    (1 to n).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

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
    val root = java.nio.file.Files.createTempDirectory("graft_r13b").toString
    val li = Lake.table(spark, sfDir, "lineitem")
      .select((col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
        col("l_orderkey").as("g"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .localCheckpoint()
    val gMax = li.agg(max(col("g"))).head().getLong(0)

    // probe 1: metadata-only COUNT at growing file counts
    Seq(32, 256, 1024).foreach { nFiles =>
      val t = s"$root/count_$nFiles"
      TxnTable.createClustered(spark, t, li, Seq(col("g")), nFiles)
      val (lo, hi) = (gMax / 4, 3 * gMax / 4)
      var last = (0L, 0, 0)
      val tMeta = best(3) { last = TxnTable.countRange(spark, t, "g", lo, hi) }
      val tScan = best(3) {
        TxnTable.readPruned(spark, t, "g", lo, hi).count()
      }
      val (cnt, scanned, total) = last
      println(f"countRange files=$total%d scanned=$scanned%d cnt=$cnt%d " +
        f"meta=$tMeta%.4f scanCount=$tScan%.3f " +
        f"speedup=${tScan / tMeta}%.1fx loadavg=$loadavg")
    }

    // probe 1b: ALTER is O(1) in file count — rename on the largest
    // table from probe 1, then the renamed column still answers a
    // metadata count (stats are physical-keyed)
    {
      val t = s"$root/count_1024"
      val t0 = System.nanoTime()
      TxnTable.renameColumn(spark, t, "g", "grp")
      val tRename = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val (cnt, scanned, total) =
        TxnTable.countRange(spark, t, "grp", gMax / 4, 3 * gMax / 4)
      val tCount = (System.nanoTime() - t1) / 1e9
      println(f"alterRename files=$total%d rename=$tRename%.4f " +
        f"renamedCount=$tCount%.4f scanned=$scanned%d cnt=$cnt%d " +
        f"loadavg=$loadavg")
    }

    // probe 2: span dedup throughput on documents
    val docs = Lake.table(spark, sfDir, "documents").localCheckpoint()
    val nDocs = docs.count()
    val tStats = best(2) {
      graft.operators.Curation
        .duplicateSpanStats(docs, "doc_id", "text", 8)
        .agg(sum("dup_spans")).head()
    }
    val tRemove = best(2) {
      graft.operators.Curation
        .removeDuplicateSpans(docs, "doc_id", "text", 8)
        .agg(sum("tokens_kept")).head()
    }
    println(f"spanDedup docs=$nDocs%d stats=$tStats%.3f remove=$tRemove%.3f " +
      f"statsDocsPerSec=${nDocs / tStats}%.0f loadavg=$loadavg")

    // probe 3: SQL DML translation overhead vs the direct call
    val tDirect = s"$root/dml_direct"
    val tSql = s"$root/dml_sql"
    TxnTable.createClustered(spark, tDirect, li, Seq(col("g")), 16)
    TxnTable.createClustered(spark, tSql, li, Seq(col("g")), 16)
    graft.sql.GraftSql.register("r13_dml", tSql)
    val band = (gMax / 3, gMax / 3 + gMax / 16)
    val dDirect = best(3) {
      TxnTable.updateWhere(spark, tDirect,
        col("g").between(band._1, band._2),
        Map("price_c" -> (col("price_c") + 1)))
    }
    val dSql = best(3) {
      graft.sql.GraftSql.execute(spark,
        s"UPDATE r13_dml SET price_c = price_c + 1 " +
          s"WHERE g BETWEEN ${band._1} AND ${band._2}")
    }
    graft.sql.GraftSql.unregister("r13_dml")
    println(f"sqlDml direct=$dDirect%.3f viaSql=$dSql%.3f " +
      f"overhead=${dSql / dDirect}%.2fx loadavg=$loadavg")

    spark.stop()
  }
}
