package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark has no native operator for, built scale-first.
  *
  * - [[asofJoin]]: backward as-of join (for each left row, the single most
  *   recent right row per key at-or-before its timestamp). Implemented as
  *   union-tag + one running `last(ignoreNulls)` window — a single shuffle
  *   of |L|+|R| rows on the key and a linear scan per partition. This is
  *   the formulation that survives 100 TB: no range-condition join (which
  *   Spark would plan as BroadcastNestedLoop/cartesian), no per-key
  *   collect, no explosion proportional to the time span.
  *
  * - [[proximityJoin]]: band join on a numeric/time axis WITHOUT an equi
  *   key (|posL − posR| ≤ tolerance). Implemented by bucketing the axis at
  *   `tolerance` width and exploding one side into its 3 covering buckets:
  *   candidate generation becomes an equi-join on the bucket id, so the
  *   work is O(|L| + 3|R| + matches), never O(|L|·|R|). Each true pair is
  *   produced exactly once (the 3 exploded buckets are distinct, and the
  *   left row holds exactly one of them).
  *
  * Skew note (100 TB): `asofJoin` windows partition by the join key, so a
  * pathologically hot key serializes into one task; the mitigation at
  * scale is the same as for any window — pre-filter the right side to the
  * columns/rows needed (done here via projection) and rely on the fact
  * that per-key state is a single running struct, so even a 10^8-row key
  * streams through one task in O(n) without materializing the partition.
  */
object TemporalJoins {

  /** Backward as-of join.
    *
    * For every row of `left`, attach the payload of the `right` row with
    * the same key and the greatest `rightTime` that is ≤ (`inclusive`) or
    * < (`!inclusive`) the left row's `leftTime`; ties on `rightTime` are
    * broken by the greatest `rightTie` value, making the result fully
    * deterministic. Left-outer semantics: unmatched left rows keep null
    * payload columns.
    *
    * Output: every column of `left`, then `rightPayload` columns (payload
    * names must not collide with left's — callers project first).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTie: String,
      rightPayload: Seq[String],
      inclusive: Boolean = true): DataFrame =
    asofImpl(left, right, leftKey, rightKey, leftTime, rightTime, rightTie,
      rightPayload, inclusive, forward = false)

  /** Shared machinery for both directions. BOTH run the streaming
    * running-`last` over (unboundedPreceding, currentRow) — the frame
    * Spark evaluates in one O(n) pass per partition; ONLY the sort
    * direction differs. (The naive forward formulation — `first` over
    * (currentRow, unboundedFollowing) — plans as an
    * UnboundedFollowingWindowFunctionFrame that re-aggregates suffix
    * rows per row: O(n²) on a hot key, precisely the regime an as-of
    * join exists for.)
    */
  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTie: String,
      rightPayload: Seq[String],
      inclusive: Boolean,
      forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    // Side ordering at equal timestamps decides the boundary semantics:
    // right rows must sort BEFORE left rows for inclusive (the running
    // window still sees them), AFTER for exclusive — in EITHER direction,
    // because the time sort flips but the side sort does not.
    val (rightSide, leftSide) = if (inclusive) (0, 1) else (1, 0)

    val taggedLeft = left.select(
      col(leftKey).as("_k"),
      col(leftTime).as("_t"),
      lit(leftSide).as("_side"),
      lit(null).cast("long").as("_tie"),
      struct(leftCols.map(col): _*).as("_lrow"),
      lit(null).cast(structType(right,
        (rightTime +: rightTie +: rightPayload).distinct: _*)).as("_rrow"))
    val taggedRight = right.select(
      col(rightKey).as("_k"),
      col(rightTime).as("_t"),
      lit(rightSide).as("_side"),
      col(rightTie).cast("long").as("_tie"),
      lit(null).cast(structType(left, leftCols: _*)).as("_lrow"),
      struct((rightTime +: rightTie +: rightPayload).distinct.map(col): _*)
        .as("_rrow"))

    // backward: time asc, ties asc (running last = max (time, tie) at or
    // before). forward: time DESC, ties DESC (running last = min (time,
    // tie) at or after).
    val ordering =
      if (forward) Seq(col("_t").desc, col("_side").asc, col("_tie").desc_nulls_last)
      else Seq(col("_t").asc, col("_side").asc, col("_tie").asc_nulls_last)
    val w = Window.partitionBy("_k")
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedCols = (rightTime +: rightTie +: rightPayload).distinct
    taggedLeft.unionByName(taggedRight)
      .withColumn("_m", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_lrow").isNotNull)
      .select(
        leftCols.map(c => col(s"_lrow.$c").as(c)) ++
          matchedCols.map(c => col(s"_m.$c").as(c)): _*)
  }

  /** FORWARD as-of join: for each left row, the EARLIEST right row with
    * the same key at-or-after (inclusive) / strictly-after (exclusive)
    * the left time; ties on time broken by MIN `rightTie`. Same single
    * key shuffle and the same O(n) streaming window as [[asofJoin]] —
    * just over the descending time sort (see [[asofImpl]]).
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTie: String,
      rightPayload: Seq[String],
      inclusive: Boolean = true): DataFrame =
    asofImpl(left, right, leftKey, rightKey, leftTime, rightTime, rightTie,
      rightPayload, inclusive, forward = true)

  private def structType(df: DataFrame, cols: String*) =
    org.apache.spark.sql.types.StructType(
      cols.distinct.map(c => df.schema(c)))

  /** Skew-resistant as-of join: identical semantics to [[asofJoin]]
    * (backward, inclusive, max-(time, tie) match, left-outer) but windows
    * partition by (key, time-chunk) instead of key alone, so a
    * pathologically hot key no longer serializes into one task — each
    * task sees at most one chunk's rows.
    *
    * Two-pass structure:
    *   1. within-chunk pass — the usual union-tag running-last window,
    *      partitioned by (key, chunk);
    *   2. carry pass — per (key, chunk), the single best right row
    *      (max (time, tie)) is aggregated (mergeable, O(1) state), a
    *      running carry-in is computed over the CHUNK SPINE (one row per
    *      occupied chunk — tiny relative to the data), and joined back;
    *      left rows unmatched within their chunk take the carry-in.
    *
    * Cost: the big shuffle is on (key, chunk) — same volume as
    * [[asofJoin]]'s but with bounded partitions; the carry table is one
    * row per occupied (key, chunk). Pick `chunkSpan` so a hot key's
    * densest chunk fits a task (e.g. an hour of a symbol's ticks).
    */
  def asofJoinChunked(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTie: String,
      rightPayload: Seq[String],
      chunkSpan: Long): DataFrame = {
    require(chunkSpan > 0, "chunkSpan must be positive")
    val leftCols = left.columns.toSeq
    val matchedCols = (rightTime +: rightTie +: rightPayload).distinct
    def chunkOf(c: Column): Column =
      ((c - ((c % chunkSpan + chunkSpan) % chunkSpan)).cast("long") / chunkSpan)
        .cast("long")
    // Timestamps must order at full precision: epoch micros, not the
    // seconds a plain long cast would give. chunkSpan is then in µs.
    def asLong(df: DataFrame, c: String): Column =
      if (df.schema(c).dataType == org.apache.spark.sql.types.TimestampType)
        unix_micros(col(c))
      else col(c).cast("long")

    val taggedLeft = left.select(
      col(leftKey).as("_k"),
      asLong(left, leftTime).as("_t"),
      lit(1).as("_side"),
      lit(null).cast("long").as("_tie"),
      struct(leftCols.map(col): _*).as("_lrow"),
      lit(null).cast(structType(right, matchedCols: _*)).as("_rrow"))
    val taggedRight = right.select(
      col(rightKey).as("_k"),
      asLong(right, rightTime).as("_t"),
      lit(0).as("_side"),
      col(rightTie).cast("long").as("_tie"),
      lit(null).cast(structType(left, leftCols: _*)).as("_lrow"),
      struct(matchedCols.map(col): _*).as("_rrow"))
    val union = taggedLeft.unionByName(taggedRight)
      .withColumn("_c", chunkOf(col("_t")))

    // Pass 1: within-chunk running last (bounded partitions).
    val w = Window.partitionBy("_k", "_c")
      .orderBy(col("_t").asc, col("_side").asc, col("_tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = union
      .withColumn("_m", last(col("_rrow"), ignoreNulls = true).over(w))

    // Pass 2: best right row per occupied (key, chunk) — max of
    // (t, tie, rrow) struct, an O(1)-state mergeable aggregate — then the
    // running carry-in over the chunk spine (previous chunks only).
    val carries = union
      .groupBy(col("_k"), col("_c"))
      .agg(max(when(col("_rrow").isNotNull,
        struct(col("_t"), col("_tie"), col("_rrow")))).as("_best"))
    val spineW = Window.partitionBy("_k").orderBy(col("_c").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val spine = carries
      .withColumn("_carryin", last(col("_best"), ignoreNulls = true).over(spineW))
      .select(col("_k").as("_sk"), col("_c").as("_sc"), col("_carryin._rrow").as("_carry"))

    within
      .filter(col("_lrow").isNotNull)
      .join(spine, col("_k") === col("_sk") && col("_c") === col("_sc"), "left")
      .withColumn("_m2", coalesce(col("_m"), col("_carry")))
      .select(
        leftCols.map(c => col(s"_lrow.$c").as(c)) ++
          matchedCols.map(c => col(s"_m2.$c").as(c)): _*)
  }

  /** Band join without an equi key: all (l, r) pairs with
    * |posL − posR| ≤ tolerance, where pos* are long-valued columns (epoch
    * micros, scaled numerics, …). Column names of the two inputs must be
    * disjoint; output carries all of them. Candidate generation is an
    * equi-join on floor(pos/tolerance) buckets (right exploded to its 3
    * covering buckets), then the exact predicate filters.
    */
  def proximityJoin(
      left: DataFrame,
      right: DataFrame,
      leftPos: String,
      rightPos: String,
      tolerance: Long): DataFrame = {
    require(tolerance > 0, "tolerance must be positive")
    // Exact long floor-division: `Column./` is DOUBLE division in Spark
    // SQL, exact only below 2^53 — near Long.MaxValue it could shift a
    // position across a bucket edge and silently drop a matching pair.
    // `div` is the registered IntegralDivide, exact over the full range.
    def floorDiv(c: Column): Column =
      call_function("div",
        (c - ((c % tolerance + tolerance) % tolerance)).cast("long"),
        lit(tolerance))
    val l = left.withColumn("_b", floorDiv(col(leftPos)).cast("long"))
    val rb = floorDiv(col(rightPos)).cast("long")
    val r = right.withColumn("_rb", explode(array(rb - 1, rb, rb + 1)))
    l.join(r, l("_b") === r("_rb"))
      .filter(abs(col(leftPos) - col(rightPos)) <= tolerance)
      .drop("_b", "_rb")
  }

  /** Interval-overlap join: all (l, r) pairs whose [start, end] ranges
    * intersect, optionally equi-keyed. Candidate generation explodes each
    * interval to its covered `chunk`-width buckets and equi-joins on the
    * bucket — linear in rows × (interval span / chunk), never nested-loop.
    * A pair overlapping several buckets is emitted ONCE without a dedup
    * shuffle: only the CANONICAL bucket — the one containing the overlap
    * start, max(l.start, r.start) — produces it (the standard interval-
    * join trick; every overlapping pair has exactly one such bucket).
    * Pick `chunk` near the typical interval span: much smaller explodes
    * long intervals, much larger degrades bucket selectivity.
    * Columns must be long (epoch micros); ends inclusive. Rows with
    * `end < start` are DROPPED up front: `sequence(hi, lo)` silently
    * auto-steps -1, so an inverted interval would otherwise still
    * generate candidate buckets and could emit pairs instead of being
    * excluded as malformed.
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      chunk: Long,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(chunk > 0, "chunk must be positive")
    def floorDiv(c: Column): Column =
      call_function("div",
        (c - ((c % chunk + chunk) % chunk)).cast("long"), lit(chunk))
    def exploded(df: DataFrame, s: String, e: String, out: String): DataFrame = {
      df.withColumn(out,
        explode(sequence(floorDiv(col(s)), floorDiv(col(e)))))
    }
    val l = exploded(left.filter(col(leftStart) <= col(leftEnd)),
      leftStart, leftEnd, "_lb")
    val r = keyCols.foldLeft(
        exploded(right.filter(col(rightStart) <= col(rightEnd)),
          rightStart, rightEnd, "_rb"))(
      (d, k) => d.withColumnRenamed(k, s"__r_$k"))
    l.join(r,
        keyCols.map(k => l(k) === r(s"__r_$k"))
          .foldLeft(l("_lb") === r("_rb"))(_ && _))
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      .filter(col("_lb") === floorDiv(greatest(col(leftStart), col(rightStart))))
      .drop("_lb", "_rb")
      .drop(keyCols.map(k => s"__r_$k"): _*)
  }
}
