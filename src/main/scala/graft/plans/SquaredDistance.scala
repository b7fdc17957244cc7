package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: exact squared L2 distance between two
  * `ArrayType(LongType)` columns (the scaled-integer embeddings of
  * operators.Clustering), as a single int64.
  *
  * Why an Expression (the CosineSimilarity rationale, integer edition):
  * the HOF form — `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0L, +)`
  * — allocates an intermediate array per evaluation and runs two
  * interpreted lambda folds; measured in ClusteringBench it dominated the
  * k-means assignment (k evaluations per row). This compiles to one fused
  * loop inside whole-stage codegen. Integer addition is associative, so
  * the result is bit-identical to the HOF fold and the DuckDB
  * `list_sum(list_transform(...))` oracle replay. Length mismatch yields
  * NULL — the same answer the HOF form gives (`zip_with` null-pads the
  * shorter array and a null element nulls the sum) — never a silently
  * truncated distance; this matters because the expression is also
  * SQL-registered (`dist2_int`) where arbitrary inputs can reach it.
  * Null elements count as 0 (the corpus has none). Overflow bound:
  * scaled |e| ≤ 2·10⁶ → per-dim
  * diff² ≤ 1.6·10¹³, ×64 dims ≈ 10¹⁵ — far inside int64, same analysis
  * as Clustering's scaladoc.
  */
case class SquaredDistanceInt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"dist2_int expects (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def dataType: DataType = LongType

  // Nullable even over non-null inputs: a length mismatch produces NULL.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0L else x.getLong(i)
      val yv = if (y.isNullAt(i)) 0L else y.getLong(i)
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = ($a.isNullAt($i) ? 0L : $a.getLong($i))
         |            - ($b.isNullAt($i) ? 0L : $b.getLong($i));
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistanceInt =
    copy(left = newLeft, right = newRight)
}

object SquaredDistanceInt {
  /** Column-level accessor (no SQL registration needed). */
  def dist2_int(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      SquaredDistanceInt(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))
}
