package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** Scale probe for the clustering / SemDeDup family: embeddings at sf0.1
  * (2k rows) plus a 32× synthetic blow-up (64k rows, perturbed vectors so
  * assignments don't collapse), measuring the three cost surfaces:
  *
  *  - assignment: literal `least` path at small k, join path at large k
  *    (the crossover the Clustering scaladoc documents);
  *  - one Lloyd step (posexplode shuffle, O(k·dim) state);
  *  - semDedup pair work, which is Σ cluster² — the probe runs the 32×
  *    corpus at BOTH k=16 (clusters grow 32× → pairs grow ~1000×) and
  *    k=512 (cluster size held ≈ constant → pairs grow ~32×), the
  *    measurement behind "k must scale with n" in SCALING.md.
  *
  * Usage: runMain graft.tools.ClusteringBench [sfDir]
  */
object ClusteringBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    // "classic" = the ×1/×32 crossover probes; "series" = the
    // 64k/256k/1M rows-vs-time series; "all" (default) = both.
    val mode = if (args.length > 1) args(1) else "all"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.core.Lake.table(spark, sfDir, "embeddings").cache()
    val n = emb.count()

    // 32× blow-up; each replica nudges one rep-dependent dimension so the
    // copies spread across clusters instead of collapsing onto the seeds.
    // repartition BEFORE cache: the blow-up crossJoin broadcasts one side
    // and would otherwise leave the whole cached dataset in the single
    // partition of the streamed side — every downstream probe then ran
    // ONE task (caught by jstack: one RUNNABLE worker in interpreted
    // ArrayTransform.eval). The probes exist to measure operator scaling,
    // not a degenerate input layout.
    val big = emb
      .crossJoin(spark.range(32).select(col("id").as("rep")))
      .select((col("vec_id") * 32 + col("rep")).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + when(i === col("rep") % 64,
            (col("rep").cast("float") - 16.0f) * 0.05f).otherwise(0.0f))
          .as("embedding"))
      .repartition(cpus.toInt)
      .cache()
    val nBig = big.count()

    def timeN(reps: Int)(name: String, rows: Long)(body: => Long): Unit = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val sum = body
        ((System.nanoTime() - t0) / 1e9, sum)
      }
      println(f"[clubench] $name%-34s rows=$rows%8d min=${runs.map(_._1).min}%7.3f s checksum=${runs.head._2}")
    }
    def time(name: String, rows: Long)(body: => Long): Unit =
      timeN(3)(name, rows)(body)

    val k16 = Clustering.seedCentroids(emb, 16)
    // Strided seeds for the large-k probe: the 512 LOWEST ids of `big`
    // are 32 replicas of just 16 base vectors (seeds collapse onto ~16
    // locations → clusters as skewed as k=16). Every ⌊n/k⌋-th id spreads
    // the seeds across the corpus so cluster sizes actually shrink with
    // k — the property the probe exists to measure.
    val k512 = big.filter(col("vec_id") % (nBig / 512) === 0)
      .orderBy(col("vec_id")).limit(512)
      .select(Clustering.scaledInt(col("embedding")))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq

    for ((label, d, rows) <- Seq(("sf0.1", emb, n), ("sf0.1 x32", big, nBig))
        if mode != "series") {
      time(s"assign_literal k=16 $label", rows) {
        Clustering.assignNearest(d, k16)
          .agg(sum(col("cluster").cast("long"))).head().getLong(0)
      }
      time(s"assign_join k=16 $label", rows) {
        Clustering.assignNearestJoin(d, k16)
          .agg(sum(col("cluster").cast("long"))).head().getLong(0)
      }
      time(s"lloyd_step k=16 $label", rows) {
        Clustering.lloydStep(d, k16)
          .agg(sum(col("sv"))).head().getLong(0)
      }
      // The x32/k=16 case is the deliberate anti-pattern (cluster sizes
      // grow 32× → pair work ~1000×); run it once, not min-of-3.
      timeN(if (label == "sf0.1") 3 else 1)(s"semdedup k=16 $label", rows) {
        Clustering.semDedupFlags(d, k16, tau = 0.3)
          .agg(sum(col("dup").cast("long"))).head().getLong(0)
      }
    }
    // The scale path: k grown with n holds cluster sizes (and pair work)
    // roughly constant per row. Literal assignment is deliberately NOT
    // run at k=512 — a 512-way least() is the expression-size wall the
    // join path exists for.
    if (mode != "series") {
      time("assign_join k=512 sf0.1 x32", nBig) {
        Clustering.assignNearestJoin(big, k512)
          .agg(sum(col("cluster").cast("long"))).head().getLong(0)
      }
      time("semdedup k=512 sf0.1 x32", nBig) {
        Clustering.semDedupFlags(big, k512, tau = 0.3)
          .agg(sum(col("dup").cast("long"))).head().getLong(0)
      }
    }
    big.unpersist()

    // ---- rows-vs-time series: 64k / 256k / 1M ----------------------
    // Each operator probed on the axis it must be linear on:
    //  - assignment (literal k=16 and join k=128): cost ∝ n·k, k fixed
    //    → expect linear in n. k=128, not 512: the brute n·k join at
    //    1M×512 (512M distance rows in one JVM) GC-thrashed the local
    //    heap until the executor heartbeat died — measured, and the
    //    honest wall the hierarchical/write-time assignment paths exist
    //    for (SCALING.md records it);
    //  - one Lloyd step (k=16): scan + O(k·dim) agg state → linear;
    //  - semDedup PAIR stage at constant cluster size 128 (synthetic
    //    id%m assignment — the Σ cluster² law doesn't care where the
    //    assignment came from): pair work per row constant → linear.
    // Single rep per point (the big points run minutes-scale; the
    // series' slope, not its noise floor, is the measurement). Run this
    // mode ALONE on a quiet host — a concurrent sbt compile was measured
    // inflating points 3-8×.
    val k128 = k512.take(128)
    if (mode != "classic") {
      // Unreported warmup at 2k rows: first execution of each pipeline
      // pays JIT + codegen compilation (measured inflating the first
      // series point 2-8×); the series should measure steady-state.
      Clustering.assignNearest(emb, k16)
        .agg(sum(col("cluster").cast("long"))).head()
      Clustering.assignNearestJoin(emb, k128)
        .agg(sum(col("cluster").cast("long"))).head()
      Clustering.assignNearestHierarchical(emb, k512, probe = 4)
        .agg(sum(col("cluster").cast("long"))).head()
      Clustering.lloydStep(emb, k16).agg(sum(col("sv"))).head()
      Clustering.semDedupOnAssigned(
          emb.select(col("vec_id").as("id"), col("embedding").as("v"),
            (col("vec_id") % 16).cast("int").as("cluster")), tau = 0.3)
        .agg(sum(col("dup").cast("long"))).head()
    }
    for (scale <- Seq(32, 128, 512) if mode != "classic") {
      val d = emb
        .crossJoin(spark.range(scale).select(col("id").as("rep")))
        .select((col("vec_id") * scale + col("rep")).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x + when(i === col("rep") % 64,
              (col("rep").cast("float") - scale / 2.0f) * (0.8f / scale))
              .otherwise(0.0f))
            .as("embedding"))
        .repartition(cpus.toInt)
        .cache()
      val rows = d.count()
      timeN(1)(s"assign_literal k=16 x$scale", rows) {
        Clustering.assignNearest(d, k16)
          .agg(sum(col("cluster").cast("long"))).head().getLong(0)
      }
      timeN(1)(s"assign_join k=128 x$scale", rows) {
        Clustering.assignNearestJoin(d, k128)
          .agg(sum(col("cluster").cast("long"))).head().getLong(0)
      }
      // The large-k path that SURVIVES where brute k=512 died: two-level
      // probing scores ~(1+probe)·√k ≈ 111 centroids/row instead of 512.
      timeN(1)(s"assign_hier k=512 x$scale", rows) {
        Clustering.assignNearestHierarchical(d, k512, probe = 4)
          .agg(sum(col("cluster").cast("long"))).head().getLong(0)
      }
      timeN(1)(s"lloyd_step k=16 x$scale", rows) {
        Clustering.lloydStep(d, k16)
          .agg(sum(col("sv"))).head().getLong(0)
      }
      timeN(1)(s"semdedup_pairs csize=128 x$scale", rows) {
        Clustering.semDedupOnAssigned(
            d.select(col("vec_id").as("id"), col("embedding").as("v"),
              (col("vec_id") % (rows / 128)).cast("int").as("cluster")),
            tau = 0.3)
          .agg(sum(col("dup").cast("long"))).head().getLong(0)
      }
      d.unpersist()
    }
    spark.stop()
  }
}
