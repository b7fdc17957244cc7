package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling polynomial hash over a string column:
  * fold(acc = (acc*31 + char) mod 1e9+7) — the same definition as
  * TextFunctions.fingerprint (HOF) and the DuckDB list_reduce oracle, so
  * results are identical for ASCII text (the HOF/oracle operate on code
  * points; this loops UTF-16 units — equal on ASCII, which is what
  * document fingerprinting normalizes to anyway).
  *
  * Why native: the HOF version materializes a per-character string array
  * per row (split(text, "")); this is one loop over the chars, no
  * allocation — the difference between O(bytes) and O(bytes) with a GC
  * storm when fingerprinting a 100 TB corpus.
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fingerprint expects string, got $t")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) { acc = (acc * 31L + s.charAt(i)) % 1000000007L; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $s = $a.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * 31L + $s.charAt($i)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  def fingerprint(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      RollingFingerprint(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}
