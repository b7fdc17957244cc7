package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding clustering + cluster-bucketed semantic dedup (SURVEY.md §2.7
  * L3/L2 family): an exact-arithmetic Lloyd (k-means) step and a
  * SemDeDup-style near-duplicate pruner that only compares vectors INSIDE
  * a cluster — the bucketing idea that turns O(n²) embedding dedup into
  * O(Σ cluster²) with bounded cluster sizes.
  *
  * Determinism discipline (what makes these gates DuckDB-oracle-able):
  * distances are computed over SCALED INTEGERS — round(v·10⁶) as long —
  * so the argmin assignment is exact 64-bit integer arithmetic with a
  * fixed (distance, centroid-index) tie-break, identical on any engine.
  * Centroid updates are exact integer sums with ONE double division at
  * the end (the l3_centroids discipline). Magnitudes: |v| ≤ ~2 → scaled
  * |e| ≤ 2·10⁶ → per-dim diff² ≤ 1.6·10¹³, ×64 dims ≤ ~10¹⁵ — far inside
  * int64.
  *
  * Scale shape: assignment is a map-side broadcast of k·dim longs (no
  * join, no shuffle); the centroid update is one posexplode +
  * partial-aggregated shuffle with O(k·dim) state; semDedup's pair join
  * shuffles on the cluster key only. At 100 TB the cluster id becomes a
  * write-time partition key (same play as Similarity.withIvfList) and
  * each Lloyd step / dedup pass reads co-partitioned data.
  */
object Clustering {

  /** round(v·10⁶) as long, element-wise — the exact-integer embedding. */
  def scaledInt(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 1000000).cast("long"))

  /** Exact squared L2 distance between a scaled-int vector column and a
    * scaled-int literal centroid. Codegen Expression, not the
    * zip_with+aggregate HOF: integer sums are order-independent so the
    * two agree bit-for-bit, but the HOF's interpreted lambda folds
    * dominated the assignment in ClusteringBench (k evaluations/row).
    */
  private def dist2(scaled: Column, cent: Seq[Long]): Column =
    graft.plans.SquaredDistanceInt.dist2_int(scaled, typedlit(cent))

  /** Assign every row to its nearest centroid (exact-int distances,
    * ties → lowest centroid index). Pure map-side: centroids ride along
    * as literals, so the plan is scan → project, no join.
    */
  def assignNearest(
      emb: DataFrame,
      centroids: Seq[Seq[Long]],
      vecCol: String = "embedding",
      outCol: String = "cluster"): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val scaled = scaledInt(col(vecCol))
    val best = least(centroids.zipWithIndex.map { case (c, i) =>
      struct(dist2(scaled, c).as("d"), lit(i).as("i"))
    }: _*)
    emb.withColumn(outCol, best.getField("i"))
  }

  /** Large-k assignment: the same exact-int argmin, but centroids arrive
    * as a broadcast DataFrame instead of inlined literals. The literal
    * form (`assignNearest`) codegens a k-way `least` — ideal to k ≈ 64;
    * past that the expression tree itself becomes the bottleneck. Here
    * the plan is scan → broadcast nested-loop against k rows → n·k
    * distance rows → one partial-aggregated shuffle on the id for the
    * argmin — every stage linear in n·k with no giant expression. Ties
    * break to the lowest centroid index via the (d2, sid) struct-min.
    * Returns (idCol, cluster).
    */
  def assignNearestJoin(
      emb: DataFrame,
      centroids: Seq[Seq[Long]],
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("sid", "ce")
    val d2 = graft.plans.SquaredDistanceInt.dist2_int(col("sc"), col("ce"))
    emb.select(col(idCol), scaledInt(col(vecCol)).as("sc"))
      .crossJoin(broadcast(cents))
      .select(col(idCol), struct(d2.as("d"), col("sid")).as("ds"))
      .groupBy(col(idCol))
      .agg(min(col("ds")).getField("sid").as("cluster"))
  }

  /** Two-level (IVF-style) nearest-centroid assignment for large k —
    * the answer to the measured n·k wall (ClusteringBench: brute
    * broadcast-join assignment at 1M rows × k=512 GC-died; SCALING.md).
    *
    * Level 1: the k centroids are themselves clustered into ~√k coarse
    * cells DRIVER-side (k-means over k points — metadata scale, exact
    * same integer arithmetic). Level 2: each row scores only the
    * centroids belonging to its `probe` nearest coarse cells. Cost per
    * row: kCoarse + probe·(k/kCoarse) distances ≈ (1+probe)·√k vs k
    * brute — ~4.5× fewer at k=512/probe=4, widening with k — and the
    * coarse argmax stays under the literal-`least` expression wall.
    *
    * Approximate by construction: exact iff the true nearest centroid
    * lies in one of the row's probed cells. probe = kCoarse degenerates
    * to EXACT brute assignment (spec-pinned equal to assignNearest);
    * recall at probe=4 is measured in ClusteringSpec on the real
    * corpus. Plan shape: one codegen projection (coarse scoring) + one
    * explode to n·probe rows + one broadcast equi-join on the cell id +
    * the same argmin partial-agg as assignNearestJoin — no all-pairs,
    * no shuffle of vectors beyond the id-keyed argmin.
    */
  def assignNearestHierarchical(
      emb: DataFrame,
      centroids: Seq[Seq[Long]],
      probe: Int = 4,
      kCoarseOpt: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty)
    val k = centroids.size
    val kCoarse = if (kCoarseOpt > 0) kCoarseOpt
      else math.max(1, math.round(math.sqrt(k.toDouble)).toInt)

    // ---- driver-side k-means over the k centroids (metadata scale) --
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => val d = x - y; d * d }.sum
    var coarse: IndexedSeq[Seq[Long]] =
      (0 until kCoarse).map(i => centroids(i * k / kCoarse))
    var assign = Array.fill(k)(0)
    for (_ <- 0 until 8) {
      assign = centroids.toArray.map { c =>
        coarse.indices.minBy(j => (d2(c, coarse(j)), j))
      }
      coarse = coarse.indices.map { j =>
        val members = centroids.indices.filter(assign(_) == j)
        if (members.isEmpty) coarse(j)
        else {
          val dim = centroids.head.size
          (0 until dim).map { d =>
            math.round(members.map(m => centroids(m)(d)).sum
              .toDouble / members.size)
          }
        }
      }
    }

    // ---- level 1: per-row top-`p` coarse cells (codegen projection) --
    // Score only cells that OWN at least one centroid: an empty cell
    // (one that kept its stale seed above) has no members to join
    // against in level 2, and a row whose probed cells were all empty
    // would silently vanish through the inner join.
    val occupied = assign.toSet
    val liveCells = coarse.zipWithIndex.filter { case (_, j) => occupied(j) }
    val p = math.min(probe, liveCells.size)
    val scaled = scaledInt(col(vecCol))
    val cellScores = array(liveCells.map { case (c, j) =>
      struct(dist2(scaled, c).as("d"), lit(j).as("j"))
    }: _*)
    val probed = emb
      .select(col(idCol), scaled.as("sc"),
        slice(sort_array(cellScores), 1, p).as("cells"))
      .select(col(idCol), col("sc"),
        explode(col("cells")).as("cell"))
      .select(col(idCol), col("sc"), col("cell.j").as("cellId"))

    // ---- level 2: exact argmin among the probed cells' members ------
    val spark = emb.sparkSession
    import spark.implicits._
    val members = centroids.zipWithIndex
      .map { case (c, i) => (assign(i), i, c) }.toDF("cellId", "sid", "ce")
    val d2c = graft.plans.SquaredDistanceInt.dist2_int(col("sc"), col("ce"))
    probed.join(broadcast(members), Seq("cellId"))
      .select(col(idCol), struct(d2c.as("d"), col("sid")).as("ds"))
      .groupBy(col(idCol))
      .agg(min(col("ds")).getField("sid").as("cluster"))
  }

  /** Deterministic seed centroids: the scaled-int embeddings of the k
    * lowest ids (O(k·dim) to the driver — index-metadata scale, the same
    * bound as Similarity.sampleCentroids).
    */
  def seedCentroids(
      emb: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Seq[Long]] =
    emb.orderBy(col(idCol)).limit(k)
      .select(scaledInt(col(vecCol))).collect()
      .map(_.getSeq[Long](0).toSeq).toSeq

  /** One Lloyd step: assign to nearest centroid, then per (cluster, dim)
    * emit the member count, the EXACT scaled-int coordinate sum, and the
    * new centroid (one double division). posexplode → one shuffle with
    * O(k·dim) aggregate state.
    */
  def lloydStep(
      emb: DataFrame,
      centroids: Seq[Seq[Long]],
      vecCol: String = "embedding"): DataFrame =
    assignNearest(emb, centroids, vecCol)
      .select(col("cluster"), posexplode(scaledInt(col(vecCol))).as(Seq("p", "e")))
      .withColumn("pos", col("p").cast("long")).drop("p")
      .groupBy(col("cluster"), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("e")).as("sv"))
      .withColumn("centroid", col("sv").cast("double") / 1000000.0 / col("n"))

  /** Full k-means: iterate Lloyd steps from the deterministic seeds. Each
    * iteration collects the k·dim centroid matrix to the driver (metadata
    * scale) and re-broadcasts it as literals — the embeddings themselves
    * never leave the executors. New centroids are re-quantized to scaled
    * ints, so every iteration stays exact-integer and reproducible.
    * Empty clusters keep their previous centroid.
    */
  def kmeans(
      emb: DataFrame,
      k: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Seq[Long]] = {
    var cents = seedCentroids(emb, k, idCol, vecCol)
    for (_ <- 0 until iters) {
      val updated = lloydStep(emb, cents, vecCol)
        .select(col("cluster"), col("pos"),
          round(col("centroid") * 1000000).cast("long").as("e"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (c, rows) =>
          c -> rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
        }
      cents = cents.indices.map(i => updated.getOrElse(i, cents(i)))
    }
    cents
  }

  /** SemDeDup-style pruning: bucket by nearest centroid, then inside each
    * cluster flag every vector whose cosine to a LOWER-id cluster member
    * is ≥ tau (keep-lowest-id rule — no sequential chaining, so the flag
    * set is order-independent and SQL-expressible). Returns
    * (id, cluster, dup). The pair join shuffles on the cluster key; work
    * is Σ cluster² — bounded by k, never all-pairs across the corpus.
    */
  def semDedupFlags(
      emb: DataFrame,
      centroids: Seq[Seq[Long]],
      tau: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // Literal-least assignment to k ≈ 64; past that the join path (and
    // one id-keyed join to re-attach the vector) avoids the k-way
    // expression wall.
    val assigned =
      if (centroids.size <= 64)
        assignNearest(emb, centroids, vecCol)
          .select(col(idCol).as("id"), col(vecCol).as("v"), col("cluster"))
      else {
        // The self-join below references the assignment three times;
        // without truncation each reference recomputes the n·k distance
        // join (measured ~3× the assignment cost in ClusteringBench).
        // localCheckpoint materializes just (id, cluster) — two longs per
        // row, tiny next to the vectors — the pageRankInt precedent.
        // eager=false: the job runs only when the result is acted on, so
        // building the DataFrame stays lazy. Caveat for the at-scale
        // path: localCheckpoint blocks are NOT fault-tolerant (an
        // executor loss loses them); a 1000-executor deployment should
        // swap in reliable checkpointing (sc.setCheckpointDir +
        // checkpoint()) at the cost of one distributed write of the tiny
        // (id, cluster) pairs.
        val asg = assignNearestJoin(emb, centroids, idCol, vecCol)
          .withColumnRenamed(idCol, "id").localCheckpoint(eager = false)
        emb.select(col(idCol).as("id"), col(vecCol).as("v"))
          .join(asg, Seq("id"))
      }
    semDedupOnAssigned(assigned, tau)
  }

  /** The PAIR stage of SemDeDup over a precomputed assignment
    * `(id, v, cluster)` — the Σ cluster² half, decoupled from how the
    * assignment was produced. At 100 TB the assignment is a write-time
    * partition key (or a hierarchical/coarse-to-fine pass), and this is
    * the stage that actually runs per batch; ClusteringBench probes its
    * rows-vs-time law at constant cluster size up to 1M vectors.
    */
  def semDedupOnAssigned(assigned: DataFrame, tau: Double): DataFrame = {
    val dupIds = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .filter(round(Similarity.cosineSimilarity(col("a.v"), col("b.v")), 6) >= tau)
      .select(col("b.id").as("id")).distinct()
      .withColumn("dup", lit(true))
    assigned.select(col("id"), col("cluster"))
      .join(dupIds, Seq("id"), "left")
      .withColumn("dup", coalesce(col("dup"), lit(false)))
  }
}
