package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 probes (SCALING.md):
  *  1. PLANTED HOT SPAN — the r13 span-dedup fold
  *     (`removeDuplicateSpans`, commit e168a29) is partial-aggregated
  *     specifically so a boilerplate span repeated ~10⁶ times never
  *     lands in one sorted window partition. This probe MEASURES that
  *     claim instead of design-arguing it: corpus A plants ~8 span
  *     classes × ~10⁶ occurrences (1000 docs × a 8-token span repeated
  *     1000 times — sliding windows make the 8 rotations); corpus B
  *     spreads the same 8M windows over ~unique spans. Wall time AND
  *     max single-task duration must be within noise of each other —
  *     a straggler would show as max-task ≈ wall on corpus A.
  *  2. Streaming change-feed pump throughput — rows/s through
  *     `StreamChanges` spooling (per-version diff + parquet spool) for
  *     a snapshot load plus a banded update.
  * Usage: runMain graft.tools.R14Bench
  */
object R14Bench {
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

    val maxTaskMs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val d = e.taskInfo.duration
        var cur = maxTaskMs.get
        while (d > cur && !maxTaskMs.compareAndSet(cur, d))
          cur = maxTaskMs.get
      }
    })
    def measured(label: String)(f: => Long): Unit = {
      f // warm: materialize inputs, JIT, fill caches
      maxTaskMs.set(0)
      val t0 = System.nanoTime()
      val out = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // listener bus drains async
      println(f"$label%s wall=$wall%.2f maxTask=${maxTaskMs.get / 1e3}%.2f " +
        f"out=$out%d loadavg=$loadavg")
    }

    // probe 1: planted hot span vs spread duplicates — same row volume
    val nDocs = 1000
    val repeats = 1000 // 8-token span × 1000 ⇒ 8000 tokens/doc, ~8M windows
    val hot = spark.range(nDocs.toLong)
      .select(col("id").cast("string").as("doc_id"),
        array_join(array_repeat(lit("qa qb qc qd qe qf qg qh"), repeats),
          " ").as("text"))
      .localCheckpoint()
    val spread = spark.range(nDocs.toLong)
      .select(col("id").cast("string").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(repeats * 8 - 1)),
          i => concat(lit("d"), col("id"), lit("t"), i)), " ").as("text"))
      .localCheckpoint()
    measured("spanDedup_spread") {
      graft.operators.Curation
        .removeDuplicateSpans(spread, "doc_id", "text", 8)
        .agg(sum("tokens_kept")).head().getLong(0)
    }
    measured("spanDedup_hotSpan") {
      graft.operators.Curation
        .removeDuplicateSpans(hot, "doc_id", "text", 8)
        .agg(sum("tokens_kept")).head().getLong(0)
    }
    measured("spanStats_hotSpan") {
      graft.operators.Curation
        .duplicateSpanStats(hot, "doc_id", "text", 8)
        .agg(sum("dup_spans")).head().getLong(0)
    }

    // probe 2: change-feed pump throughput (spool = per-version
    // file-scoped diff + parquet write)
    val root = java.nio.file.Files.createTempDirectory("graft_r14b").toString
    val t = s"$root/t"
    val rows = spark.range(2000000L)
      .select(col("id"), (col("id") % 1000).as("g"),
        (col("id") * 3).as("v"))
    graft.core.TxnTable.createClustered(spark, t, rows, Seq(col("g")), 32)
    graft.core.TxnTable.updateWhere(spark, t,
      col("g").between(100L, 200L), Map("v" -> (col("v") + 1)))
    val t0 = System.nanoTime()
    graft.streaming.StreamChanges.pump(spark, t, s"$root/spool",
      s"$root/ckpt", Seq("id"))
    val wall = (System.nanoTime() - t0) / 1e9
    val spooled = spark.read.parquet(s"$root/spool").count()
    println(f"changesPump rows=$spooled%d wall=$wall%.2f " +
      f"rowsPerSec=${spooled / wall}%.0f loadavg=$loadavg")

    // probe 3: CONVERT adoption cost at growing file counts — the
    // claim is zero data movement + a distributed one-footer-per-file
    // harvest, so wall should track file count, never byte volume
    Seq(64, 512).foreach { nFiles =>
      val src = s"$root/conv_$nFiles"
      spark.range(2000000L)
        .select(col("id"), (col("id") % 1000).as("g"), (col("id") * 3).as("v"))
        .repartition(nFiles).write.parquet(src)
      val t0 = System.nanoTime()
      graft.core.TxnTable.convertParquet(spark, src)
      val wall = (System.nanoTime() - t0) / 1e9
      val f0 = graft.crawler.SkippingIndex.footerReads.get()
      val cnt = graft.core.TxnTable.countRange(spark, src, "g", 0L, 999L)
      require(cnt._1 == 2000000L && cnt._2 == 0,
        s"post-convert metadata count must be exact+scan-free, got $cnt")
      require(graft.crawler.SkippingIndex.footerReads.get() == f0)
      println(f"convert files=$nFiles%d wall=$wall%.2f " +
        f"metaCountScanned=${cnt._2}%d loadavg=$loadavg")
    }

    // probe 4: full-sync MERGE (matched update + 2 inserts + by-source
    // delete/update) on 2M rows — the one-pass left-join claim: CoW
    // and MOR walls, same statement shape as gate s41
    {
      import graft.core._
      val rows2 = spark.range(2000000L)
        .select(col("id"), (col("id") % 1000).as("g"), (col("id") * 3).as("v"))
      val src = spark.range(1500000L, 2500000L)
        .select(col("id"), (col("id") * 7).as("nv"))
      val matched = Seq(MatchedUpdate(Map("v" -> TxnTable.srcCol("nv"))))
      val notM = Seq(NotMatchedInsert(Map(
        "id" -> TxnTable.srcCol("id"), "g" -> lit(9999L),
        "v" -> TxnTable.srcCol("nv"))))
      val bys = Seq(
        BySourceDelete(Some(col("g") < 100L)),
        BySourceUpdate(Map("v" -> (col("v") + 1L))))
      def run(mor: Boolean): Double = {
        val t = s"$root/sync_${if (mor) "mor" else "cow"}"
        TxnTable.createClustered(spark, t, rows2, Seq(col("g")), 32)
        val t0 = System.nanoTime()
        if (mor) TxnTable.mergeIntoMor(spark, t, src, Seq("id"), matched,
          notM, bySource = bys)
        else TxnTable.mergeInto(spark, t, src, Seq("id"), matched, notM,
          bySource = bys)
        (System.nanoTime() - t0) / 1e9
      }
      val (cw, mr) = (run(false), run(true))
      println(f"fullSyncMerge rows=2000000 cow=$cw%.2f mor=$mr%.2f " +
        f"loadavg=$loadavg")
    }

    spark.stop()
  }
}
