package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling (Efraimidis–Spirakis A-ES, "Weighted
  * random sampling with a reservoir", Inf. Process. Lett. 97(5), 2006):
  * each row draws a key u^(1/w) with u ~ U(0,1); the k largest keys form
  * an exact weighted sample without replacement. The uniform is
  * md5-derived from a caller-chosen seed column, so the sample is a pure
  * function of the data — re-running the pipeline (or swapping engines)
  * reproduces the same rows, which makes the sample auditable and the
  * gate oracle-checkable.
  *
  * Scale: keys are computed map-side (no shuffle to draw them); the
  * global top-k plans as TakeOrderedAndProject (per-partition heaps, no
  * total sort), and the per-group variant is one window over the group
  * shuffle. No driver state, no rejection loops, no second pass.
  */
object Sampling {

  /** md5-derived uniform in (0,1): the top 60 digest bits as
    * (v + 0.5) / 2^60. The cast-to-double rounding and the power-of-two
    * division are IEEE-identical across engines, so the value is
    * bit-reproducible anywhere md5 is.
    */
  def seededUniform(seed: Column, tag: String): Column =
    (conv(substring(md5(concat(lit(tag + ":"), seed.cast("string"))), 1, 15), 16, 10)
      .cast("long").cast("double") + lit(0.5)) /
      lit(1152921504606846976.0) // 2^60

  /** The A-ES key u^(1/w): larger weight → key closer to 1 → more likely
    * to survive the top-k. Weights must be strictly positive.
    */
  def esKey(uniform: Column, weight: Column): Column =
    pow(uniform, lit(1.0) / weight.cast("double"))

  /** Weighted sample without replacement of `k` rows, keys seeded from
    * `seed` (use the row's stable id). Output carries the draw key as
    * `_es_key` so callers can audit the cut; ties (impossible on raw
    * doubles in practice, but pinned anyway) break by `seed` ascending.
    */
  def weightedSample(
      df: DataFrame,
      weight: Column,
      seed: Column,
      k: Int,
      tag: String = "ws"): DataFrame = {
    require(k > 0, "sample size must be positive")
    df.withColumn("_es_key", esKey(seededUniform(seed, tag), weight))
      .orderBy(col("_es_key").desc, seed)
      .limit(k)
  }

  /** Deterministic hash-based dataset split (train/val/test): each row's
    * md5-derived uniform lands it in the first label whose cumulative
    * fraction exceeds it. Pure map-side — no shuffle, no sampling state;
    * the assignment is a function of the row's seed alone, so it is
    * stable under reruns, repartitioning, engine swaps, and incremental
    * appends (a row added tomorrow cannot flip today's rows between
    * splits — the property a reproducible training pipeline needs).
    */
  def hashSplit(
      df: DataFrame,
      seed: Column,
      fractions: Seq[(String, Double)],
      tag: String = "split"): DataFrame = {
    require(fractions.nonEmpty, "need at least one split")
    require(fractions.forall(_._2 > 0), "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    // The when-chain references the uniform once per branch — let-bind it
    // so the md5 fold runs once per row.
    val split = element_at(
      transform(array(seededUniform(seed, tag)), u => {
        val chain = fractions.zip(cum).init.foldLeft(Option.empty[Column]) {
          case (acc, ((label, _), c)) =>
            Some(acc.fold(when(u < c, label))(_.when(u < c, label)))
        }
        chain.fold(lit(fractions.last._1): Column)(_.otherwise(fractions.last._1))
      }), 1)
    df.withColumn("split", split)
  }

  /** Per-group weighted sample: `k` rows per `group` value — the
    * stratified form (e.g. a per-language or per-source budget). One hash
    * shuffle on the group key; window keeps rank ≤ k, sort spills.
    */
  def weightedSamplePerGroup(
      df: DataFrame,
      group: Column,
      weight: Column,
      seed: Column,
      k: Int,
      tag: String = "ws"): DataFrame = {
    require(k > 0, "sample size must be positive")
    df.withColumn("_es_key", esKey(seededUniform(seed, tag), weight))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(group).orderBy(col("_es_key").desc, seed)))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }
}
