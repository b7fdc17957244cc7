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

  /** max |x_i| — the symmetric int8 quantization scale numerator. */
  def maxAbs(a: Column): Column =
    array_max(transform(a, x => abs(x.cast("double"))))

  /** Symmetric per-vector int8 quantization: q_i = round(x_i·127/m) with
    * m = max|x| — the 4×-smaller storage form for 100 TB vector stores
    * (together with the scale `m`, stored alongside, reconstruction error
    * is ≤ m/254 per element). m is let-bound through a single-element
    * transform so it's computed once per vector, not once per element
    * (no CSE across lambda boundaries — the letTokens lesson).
    * All-zero vectors quantize to all zeros.
    */
  def quantizeInt8(a: Column): Column =
    element_at(transform(array(maxAbs(a)), m =>
      when(m > 0.0,
        transform(a, x => round(x.cast("double") * 127.0 / m).cast("int")))
        .otherwise(transform(a, _ => lit(0)))), 1)

  /** Reconstruct doubles from an int8-quantized vector and its scale. */
  def dequantizeInt8(q: Column, m: Column): Column =
    transform(q, v => v.cast("double") * m.cast("double") / 127.0)

  /** md5-derived ±1 sign matrix for random projection: sign(k, j) = +1
    * iff the last hex digit of md5("k:j") is even. Row-independent, so it
    * is computed ONCE here and embedded as a literal — zero per-row hash
    * work — while staying engine-reproducible (the DuckDB oracle rebuilds
    * the same matrix from the same md5 strings).
    */
  def signMatrix(outDim: Int, inDim: Int): Array[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDim, inDim) { (k, j) =>
      val hex = md.digest(s"$k:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if ("02468ace".contains(hex.last)) 1L else -1L
    }
  }

  /** Sparse-free Achlioptas-style random projection in the INTEGER domain:
    * quantize the vector to int8 first, then project with the ±1 md5 sign
    * matrix — all-integer arithmetic, so the result is exact and
    * order-independent (no float-fold drift between engines or between
    * shuffle orders), and the projection of a quantized store costs no
    * extra precision. Output: array<long> of length `outDim`. JL lemma:
    * outDim ≈ O(ln n / ε²) preserves pairwise distances to (1±ε).
    */
  def randomProjectInt(a: Column, inDim: Int, outDim: Int): Column = {
    val m = signMatrix(outDim, inDim)
    val matrixLit = array(m.map(row => array(row.map(lit): _*)): _*)
    // Let-bind the quantized vector through a 1-element transform so it
    // is computed once per row, not once per output dim (no CSE across
    // lambda boundaries — the letTokens lesson).
    element_at(transform(array(quantizeInt8(a)), q =>
      transform(matrixLit, row =>
        aggregate(
          zip_with(row, q, (s, x) => s * x.cast("long")),
          lit(0L),
          (acc, v) => acc + v))), 1)
  }
}
