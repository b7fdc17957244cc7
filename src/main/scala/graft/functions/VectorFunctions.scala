package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * Spark's codegen'd higher-order functions (`zip_with` + `aggregate`) —
  * no UDF serialization, stays inside whole-stage codegen boundaries.
  *
  * All arithmetic is widened to double and folded left-to-right, which makes
  * results deterministic and engine-comparable (the DuckDB oracle computes
  * the same left-to-right double fold).
  */
object VectorFunctions {
  /** dot(a, b) in double precision, deterministic left-to-right fold. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** ||a||_2 in double precision. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** cosine(a, b) = dot / (||a|| * ||b||). */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))
}
