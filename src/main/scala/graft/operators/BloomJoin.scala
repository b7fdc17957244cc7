package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.{BloomMightContain, BloomUtil}

/** Bloom-prefiltered semi-join: when the build side is too big to
  * broadcast as ROWS but its KEY SET fits a bloom filter (10 bits/key:
  * 10⁸ keys ≈ 125 MB — at the broadcast ceiling; 10⁷ ≈ 12 MB — trivial),
  * build a mergeable bloom over the build keys, probe it MAP-SIDE on the
  * probe side before the join shuffle, then run the exact join on the
  * survivors. At 1% fpp a 1%-selective semi-join shuffles ~2% of the
  * fact instead of 100% — the shuffle, not the scan, is what dies first
  * at 100 TB.
  *
  * This is the user-steerable form of Spark's AQE runtime row-level
  * filtering, available where AQE can't see the opportunity (pre-built
  * dim key sets, persisted per-dataset key indexes from the crawler).
  */
object BloomJoin {

  /** Build the bloom bitset for `key` (any type — hashed to long with
    * xxhash64) as ONE aggregated row collected to the driver. The collect
    * is bounded by the filter size — the same cost class as broadcasting
    * a dim, never O(rows).
    */
  def buildBloom(build: DataFrame, key: Column, expectedKeys: Long,
      bitsPerKey: Int = 10): Array[Byte] = {
    val (numBytes, _) = BloomUtil.sizing(expectedKeys, bitsPerKey)
    // xxhash64(null) is the SEED (42), not null — filter nulls explicitly
    // or a null build key would poison the filter with a phantom entry.
    build
      .filter(key.isNotNull)
      .select(BloomMightContain.bloom_agg(xxhash64(key), numBytes).as("b"))
      .head().getAs[Array[Byte]](0)
  }

  /** Map-side membership prefilter of `probeKey` against a built bloom.
    * Keeps every true match (no false negatives) plus ~fpp of the rest.
    */
  def prefilter(probe: DataFrame, probeKey: Column, bloom: Array[Byte]): DataFrame =
    // Null probe keys can never equi-match; drop them here (xxhash64(null)
    // is the seed, which would otherwise probe a phantom bit pattern).
    probe.filter(probeKey.isNotNull &&
      BloomMightContain.bloom_might_contain(lit(bloom), xxhash64(probeKey)))

  /** Widen a key type to the representative its equi-join equality class
    * hashes under: every integral width → long, float → double. Without
    * this, an int probe key against a bigint build key equi-matches via
    * Catalyst's implicit cast while `xxhash64(int)` ≠ `xxhash64(bigint)`
    * for the same value — the prefilter would silently drop true matches.
    */
  private def hashNormType(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => LongType
      case FloatType | DoubleType                        => DoubleType
      case other                                         => other
    }
  }

  /** Exact semi-join with a bloom prefilter in front: identical result to
    * `probe.join(build, …, "left_semi")`, with the fact-side shuffle fed
    * only prefilter survivors. `expectedKeys` sizes the filter (estimate
    * high; an undersized filter only costs fpp, never correctness).
    *
    * Both keys are widened to a common hash type (int→long, float→double)
    * before hashing so mixed-width numeric keys prefilter exactly; key
    * types outside one widening class (e.g. string vs int) are rejected
    * up front rather than risking hash-mismatch false negatives.
    */
  def semiJoin(probe: DataFrame, probeKey: String, build: DataFrame,
      buildKey: String, expectedKeys: Long, bitsPerKey: Int = 10): DataFrame = {
    val pt = hashNormType(probe.schema(probeKey).dataType)
    val bt = hashNormType(build.schema(buildKey).dataType)
    require(pt == bt,
      s"bloom semi-join keys must hash in the same type class: " +
        s"$probeKey is ${probe.schema(probeKey).dataType}, " +
        s"$buildKey is ${build.schema(buildKey).dataType}")
    val bloom = buildBloom(build, col(buildKey).cast(bt), expectedKeys, bitsPerKey)
    // Rename the build key so same-named probe/build keys can't hit an
    // ambiguous-reference error in the join condition.
    val keys = build.select(col(buildKey).as("__bloom_k")).distinct()
    prefilter(probe, col(probeKey).cast(pt), bloom)
      .join(keys, col(probeKey) === col("__bloom_k"), "left_semi")
  }
}
