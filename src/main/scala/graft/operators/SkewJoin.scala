package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §7.3 scale checklist).
  *
  * AQE's skew-join split handles most skew at runtime; salting is the
  * explicit fallback when one side's hot keys overwhelm even split
  * partitions (classic at 100 TB: a null-ish or default key holding >1%
  * of rows). The large side gets a deterministic per-row salt derived by
  * hashing the full row (not rand() — results must be reproducible); the
  * small side is replicated `salts` ways, so each (key, salt) bucket
  * shuffles independently.
  */
object SkewJoin {

  /** Inner equi-join of `large ⋈ small` on `keys`, with the large side's
    * rows spread across `salts` buckets per key. Result equals the plain
    * join (verified in SkewJoinSpec); cost: small side × salts.
    */
  def saltedInnerJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int = 8): DataFrame = {
    require(salts >= 1)
    val saltCol = pmod(
      xxhash64(large.columns.map(c => col(s"`$c`")).toIndexedSeq: _*), lit(salts))
    val saltedLarge = large.withColumn("__salt", saltCol)
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    val cond = keys.map(k => saltedLarge(k) === saltedSmall(k))
      .reduce(_ && _) && (saltedLarge("__salt") === saltedSmall("__salt"))
    keys.foldLeft(
        saltedLarge.join(saltedSmall, cond, "inner")
          .drop(saltedSmall("__salt")).drop("__salt")) {
      (df, k) => df.drop(saltedSmall(k))
    }
  }
}
