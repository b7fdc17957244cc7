package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.ZOrderInterleave

/** Multi-dimensional data layout: z-order clustering for data-skipping
  * (SURVEY §2.1 widening — the write-side half of scan pruning). A table
  * range-partitioned and sorted by z(a, b) yields files whose min/max
  * stats are tight on BOTH a and b, so a 2-d box predicate skips most
  * files; a linear sort is tight only on its leading column.
  *
  * Scale notes: normalization bounds come from ONE tiny agg (4 numbers
  * to the driver); the layout itself is a single repartitionByRange — the
  * same shuffle a plain sorted write costs. Nothing here is corpus-size
  * driver state.
  */
object Layout {

  /** Min-max normalize `c` into [0, 2^bits) as a long. Constant columns
    * map to 0. Rank-based normalization resists outliers better but
    * costs a window; min-max is the standard first cut.
    */
  def normalizeToBits(c: Column, minV: Double, maxV: Double, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "1..31 bits per dimension")
    val span = maxV - minV
    val scale = if (span > 0) ((1L << bits) - 1) / span else 0.0
    least(greatest(
      round((c.cast("double") - minV) * scale).cast("long"), lit(0L)),
      lit((1L << bits) - 1L))
  }

  /** z-value column for (a, b) normalized over their observed ranges.
    * `bounds` = (minA, maxA, minB, maxB), from [[boundsOf]].
    */
  def zValue(a: Column, b: Column, bounds: (Double, Double, Double, Double),
      bits: Int = 31): Column =
    ZOrderInterleave.zorder(
      normalizeToBits(a, bounds._1, bounds._2, bits),
      normalizeToBits(b, bounds._3, bounds._4, bits))

  /** One aggregate job for the normalization bounds (4 doubles). An
    * empty frame / all-null column yields degenerate (0,0) bounds, which
    * normalize everything to 0 — the layout is then a no-op instead of a
    * driver NPE (the empty-input contract the other operators keep).
    */
  def boundsOf(df: DataFrame, a: Column, b: Column): (Double, Double, Double, Double) = {
    val r = df.agg(min(a.cast("double")), max(a.cast("double")),
      min(b.cast("double")), max(b.cast("double"))).head()
    def get(i: Int): Double = if (r.isNullAt(i)) 0.0 else r.getDouble(i)
    (get(0), get(1), get(2), get(3))
  }

  /** Cluster `df` into `numPartitions` z-ordered partitions on (a, b):
    * range-partition by z so each output file owns a compact z-range,
    * then sort within partitions. Write the result with any sink; each
    * file's (a, b) min/max footer stats are then box-prunable.
    */
  def zorderPartitions(df: DataFrame, a: Column, b: Column,
      numPartitions: Int): DataFrame = {
    val bounds = boundsOf(df, a, b)
    df.withColumn("__z", zValue(a, b, bounds))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** [[zorderPartitions]] for THREE dimensions (Morton3, 21 bits/dim):
    * each file then owns a compact range on ALL THREE columns, so a
    * 3-d box predicate prunes on every dimension. Same one
    * range-shuffle cost; bounds come from one 6-number agg. */
  def zorderPartitions3(df: DataFrame, a: Column, b: Column, c: Column,
      numPartitions: Int): DataFrame = {
    val r = df.agg(min(a.cast("double")), max(a.cast("double")),
      min(b.cast("double")), max(b.cast("double")),
      min(c.cast("double")), max(c.cast("double"))).head()
    def get(i: Int): Double = if (r.isNullAt(i)) 0.0 else r.getDouble(i)
    val z = ZOrderInterleave.zorder3(
      normalizeToBits(a, get(0), get(1), 21),
      normalizeToBits(b, get(2), get(3), 21),
      normalizeToBits(c, get(4), get(5), 21))
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
