package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph analytics as iterative joins — no driver-side graph,
  * no vertex collection (the pattern `Dedup.resolveDupGroups` already
  * uses for connected components). Ranks live in FIXED-POINT integer
  * micro-units so every engine (and every shuffle order) computes
  * bit-identical results: integer `div` has no float-fold drift, which is
  * what makes PageRank DuckDB-oracle-able at all.
  *
  * Scale notes: each iteration is one join edges⋈ranks (shuffle on src —
  * reusable partitioning across iterations) + one groupBy dst (partial
  * aggregation map-side). State is O(nodes) rows, never on the driver.
  * At 100 TB you checkpoint every few iterations to truncate lineage;
  * locally the plan tree for 3 iterations is fine.
  */
object Graph {

  /** Fixed-point PageRank: rank in `scale`-units (default micro),
    * damping in the same units. new = (scale−d) + d·Σ contrib / scale,
    * contrib = rank div out-degree. Nodes are every distinct src/dst;
    * dangling nodes contribute nothing (their mass leaks — the classic
    * simplified variant; both engines implement exactly this).
    * Input `edges`: (src, dst) bigint columns. Output: (node, rank).
    *
    * Every `checkpointEvery` iterations the rank frame is
    * `localCheckpoint`ed (eager, replicated to executor storage): the
    * logical plan would otherwise deepen by one join+agg per iteration,
    * and past ~10 iterations analysis/codegen time grows superlinearly
    * while a lost-executor recompute replays the whole chain. Truncating
    * lineage bounds both. Values are unchanged — the checkpoint is a
    * materialization point, not a semantic one.
    */
  def pageRankInt(
      spark: SparkSession,
      edges: DataFrame,
      iterations: Int,
      dampingScaled: Long = 850000L,
      scale: Long = 1000000L,
      checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 1 && iterations <= 50)
    require(checkpointEvery >= 1, "checkpointEvery must be positive")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val base = lit(scale - dampingScaled)
    var ranks = nodes.withColumn("rank", lit(scale))
    for (i <- 1 to iterations) {
      val contribs = e
        .join(ranks, e("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst").as("node"),
          call_function("div", col("rank"), col("__deg")).as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("contrib"))
      ranks = nodes.join(contribs, Seq("node"), "left_outer")
        .select(col("node"),
          (base + call_function("div",
            lit(dampingScaled) * coalesce(col("contrib"), lit(0L)),
            lit(scale))).as("rank"))
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Multi-source BFS: minimum hop count from any seed node, up to
    * `maxHops`. Iteration k joins the current frontier to edges and
    * keeps newly-reached nodes — frontier-sized state, one shuffle per
    * hop (the iterative-join BFS every distributed graph engine runs;
    * at 100 TB you persist the visited set between hops). Unreached
    * nodes are absent from the output.
    *
    * Like [[pageRankInt]], lineage is truncated every `checkpointEvery`
    * hops: the visited set is a union chain one join deeper per hop, so
    * an unbounded plan at 30 hops costs superlinear analysis time and a
    * full-replay recompute on executor loss. Values are unchanged.
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      checkpointEvery: Int = 5): DataFrame = {
    require(maxHops >= 0 && maxHops <= 30)
    require(checkpointEvery >= 1, "checkpointEvery must be positive")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    var visited = seeds.select(col("node").cast("long")).distinct()
      .withColumn("hops", lit(0L))
    var frontier = visited
    for (k <- 1 to maxHops) {
      val next = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select(col("node").as("__v")), col("node") === col("__v"),
          "left_anti")
        .withColumn("hops", lit(k.toLong))
      frontier = next
      visited = visited.unionAll(next)
      if (k % checkpointEvery == 0 && k < maxHops) {
        visited = visited.localCheckpoint()
        frontier = frontier.localCheckpoint()
      }
    }
    visited
  }

  /** Degree table of an edge list: per node, out/in/total degree —
    * the first profiling query over any graph-shaped dataset.
    */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
      .withColumn("total_deg", col("out_deg") + col("in_deg"))
  }
}
