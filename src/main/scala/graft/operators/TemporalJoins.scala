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
      inclusive: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    // Side ordering at equal timestamps decides the <= vs < boundary:
    // right rows must sort BEFORE left rows for inclusive (so the window
    // still sees them), AFTER for exclusive.
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

    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_side").asc, col("_tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedCols = (rightTime +: rightTie +: rightPayload).distinct
    taggedLeft.unionByName(taggedRight)
      .withColumn("_m", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_lrow").isNotNull)
      .select(
        leftCols.map(c => col(s"_lrow.$c").as(c)) ++
          matchedCols.map(c => col(s"_m.$c").as(c)): _*)
  }

  private def structType(df: DataFrame, cols: String*) =
    org.apache.spark.sql.types.StructType(
      cols.distinct.map(c => df.schema(c)))

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
    // Exact long floor-division: double division would round near bucket
    // boundaries at epoch-micros magnitudes (~1e15) and could shift a
    // position across a bucket edge, silently dropping a matching pair.
    def floorDiv(c: Column): Column =
      (c - ((c % tolerance + tolerance) % tolerance)).cast("long") / tolerance
    val l = left.withColumn("_b", floorDiv(col(leftPos)).cast("long"))
    val rb = floorDiv(col(rightPos)).cast("long")
    val r = right.withColumn("_rb", explode(array(rb - 1, rb, rb + 1)))
    l.join(r, l("_b") === r("_rb"))
      .filter(abs(col(leftPos) - col(rightPos)) <= tolerance)
      .drop("_b", "_rb")
  }
}
