package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.RewriteTopKWindow

/** Measures RewriteTopKWindow's window-vs-heap economics on a blown-up
  * orders table (sf0.1 ×32 ≈ 4.8M rows), in the two regimes that matter:
  *
  *  - FEW HUGE GROUPS (5 priorities ≈ 1M rows each): the window form
  *    shuffles every row into 5 reducer tasks and sorts ~1M rows per
  *    task; the heap form shuffles ≤ k rows per (group, mapper).
  *  - MANY SMALL GROUPS (~100k custkeys): per-group data is small, the
  *    sort is cheap, and the rewrite's win should shrink — the probe
  *    exists to show where the rule matters, not to claim it always wins.
  *
  * Usage: runMain graft.tools.TopKBench [sfDir]
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val orders = graft.core.Lake.table(spark, sfDir, "orders")
    val big = orders
      .crossJoin(spark.range(32).select(col("id").as("rep")))
      .select((col("o_orderkey") * 32 + col("rep")).as("k"),
        col("o_custkey"), col("o_orderpriority"),
        (col("o_totalprice") + col("rep")).as("price"))
      .repartition(32).cache()
    val n = big.count()

    def windowed(partCols: Seq[String], k: Int): DataFrame = big
      .withColumn("rn", row_number().over(
        Window.partitionBy(partCols.map(col): _*)
          .orderBy(col("price").desc, col("k"))))
      .filter(col("rn") <= k)

    // Wall time barely separates the two forms at local[32] with a cached
    // 200 MB working set — the structural difference is SHUFFLE VOLUME
    // (n rows vs ≤ k·groups·mappers), so measure exchange bytes per run.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null)
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      })

    def time(name: String)(df: => DataFrame): Long = {
      // Per-repetition (time, bytes) pairs; the reported bytes are the
      // ones measured in the SAME repetition as the min time, so the two
      // numbers describe one run. The listener still sees all task
      // activity in the window (AQE retries, stray cache work), so each
      // rep's bytes are drained/reset around exactly that rep.
      var rows = 0L
      val reps = (1 to 3).map { _ =>
        shuffleBytes.set(0L)
        val t0 = System.nanoTime()
        rows = df.count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener bus drain
        (secs, shuffleBytes.get())
      }
      val (best, bytes) = reps.minBy(_._1)
      val repStr = reps.map { case (s, b) => f"$s%.3fs/${b / 1024}KiB" }.mkString(" ")
      println(f"[topkbench] $name%-30s rows_out=$rows%8d min=$best%7.3f s shuffle=${bytes / 1024}%9d KiB  reps=[$repStr]")
      rows
    }

    for ((label, parts) <- Seq(
        ("5 huge groups", Seq("o_orderpriority")),
        ("~100k small groups", Seq("o_custkey")))) {
      val a = time(s"window   $label") { windowed(parts, 5) }
      val b = time(s"rewrite  $label") {
        // Rule application point: the OPTIMIZED plan, where predicate
        // pushdown has put the rank filter directly above the Window —
        // the same shape the rule sees when installed in the optimizer.
        val optimized = windowed(parts, 5).queryExecution.optimizedPlan
        val rewritten = RewriteTopKWindow(optimized)
        require(rewritten.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
        }.isEmpty, "rewrite did not fire")
        org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, rewritten)
      }
      require(a == b, s"row-count mismatch: window=$a rewrite=$b")
    }
    println(s"[topkbench] input rows = $n")
    spark.stop()
  }
}
