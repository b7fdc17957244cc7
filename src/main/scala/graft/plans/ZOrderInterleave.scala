package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Bit-interleave two 31-bit dimension keys into one z-value (Morton
  * code) — the multi-dimensional clustering key behind data-skipping
  * layouts: sort/range-partition by z, and per-file min/max stats on
  * BOTH dimensions become selective, so a 2-d box predicate prunes files
  * that a 1-d sort could only prune on its leading column.
  *
  * Inputs must be pre-normalized to [0, 2^31): 31 bits per dim keeps the
  * 62-bit result clear of the sign bit so LongType ordering == z-curve
  * ordering (see graft.operators.Layout.normalizeToBits). Out-of-range
  * input is a runtime error, not silent truncation — truncation would
  * silently break ordering, the one property the operator exists for.
  */
case class ZOrderInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder expects (bigint, bigint), got ($l, $r)")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderInterleave.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.ZOrderInterleave.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderInterleave =
    copy(left = newLeft, right = newRight)
}

/** Three-dimensional Morton code: interleave three 21-bit dimension
  * keys into one 63-bit z-value — the clustering key for THREE-column
  * data skipping (a 3-d box prunes on all three dimensions where the
  * 2-d key covers two). 21 bits/dim (vs 31 for 2-d) is the bit budget
  * a sign-clear long allows; inputs must be pre-normalized to
  * [0, 2^21) (`Layout.normalizeToBits(bits = 21)`), out-of-range is a
  * runtime error — silent truncation would break the ordering, the
  * one property the operator exists for. */
case class ZOrderInterleave3(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"zorder3 expects (bigint, bigint, bigint), got ($a, $b, $c)")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    ZOrderInterleave.interleave3(a.asInstanceOf[Long],
      b.asInstanceOf[Long], c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.plans.ZOrderInterleave.interleave3($a, $b, $c);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): ZOrderInterleave3 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ZOrderInterleave {
  /** Spread the low 31 bits of v to even positions (0,2,4,…,60). */
  def spread(v0: Long): Long = {
    var v = v0 & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8))  & 0x00FF00FF00FF00FFL
    v = (v | (v << 4))  & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2))  & 0x3333333333333333L
    v = (v | (v << 1))  & 0x5555555555555555L
    v
  }

  /** z = x's bits on odd positions, y's on even. Static and
    * codegen-callable — interpreted and compiled paths share this body.
    */
  def interleave(x: Long, y: Long): Long = {
    if ((x & ~0x7FFFFFFFL) != 0 || (y & ~0x7FFFFFFFL) != 0)
      throw new IllegalArgumentException(
        s"zorder input out of [0, 2^31): ($x, $y) — normalize first")
    (spread(x) << 1) | spread(y)
  }

  def zorder(x: Column, y: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      ZOrderInterleave(
        org.apache.spark.sql.graftbridge.Bridge.expression(x),
        org.apache.spark.sql.graftbridge.Bridge.expression(y)))

  /** Spread the low 21 bits of v to every third position (0,3,…,60) —
    * the standard 64-bit Morton3 mask sequence. */
  def spread3(v0: Long): Long = {
    var v = v0 & 0x1FFFFFL
    v = (v | (v << 32)) & 0x1F00000000FFFFL
    v = (v | (v << 16)) & 0x1F0000FF0000FFL
    v = (v | (v << 8))  & 0x100F00F00F00F00FL
    v = (v | (v << 4))  & 0x10C30C30C30C30C3L
    v = (v | (v << 2))  & 0x1249249249249249L
    v
  }

  /** z = x's bits at positions 2 (mod 3), y's at 1, z's at 0. Static
    * and codegen-callable. */
  def interleave3(x: Long, y: Long, z: Long): Long = {
    if ((x & ~0x1FFFFFL) != 0 || (y & ~0x1FFFFFL) != 0 ||
        (z & ~0x1FFFFFL) != 0)
      throw new IllegalArgumentException(
        s"zorder3 input out of [0, 2^21): ($x, $y, $z) — normalize first")
    (spread3(x) << 2) | (spread3(y) << 1) | spread3(z)
  }

  def zorder3(x: Column, y: Column, z: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      ZOrderInterleave3(
        org.apache.spark.sql.graftbridge.Bridge.expression(x),
        org.apache.spark.sql.graftbridge.Bridge.expression(y),
        org.apache.spark.sql.graftbridge.Bridge.expression(z)))
}
