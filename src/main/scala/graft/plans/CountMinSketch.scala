package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared bucket math for the count-min aggregate and the point-estimate
  * expression — one hash family, so build and probe cannot disagree.
  * Row d uses an independent seed mix of the murmur finalizer.
  */
object CountMinUtil {
  def bucket(v: Long, d: Int, width: Int): Int =
    ((BloomUtil.fmix64(v ^ BloomUtil.fmix64(d + 1L)) & Long.MaxValue) % width).toInt

  def estimate(counters: Array[Long], v: Long, width: Int, depth: Int): Long = {
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = counters(d * width + bucket(v, d, width))
      if (c < best) best = c
      d += 1
    }
    best
  }
}

/** Count-min sketch aggregate (Cormode–Muthukrishnan): depth×width long
  * counters over a bigint key column. Point-query guarantee:
  * exact ≤ estimate ≤ exact + εN with ε = e/width at confidence
  * 1 − e^-depth. Merge is elementwise add, so map-side partials combine
  * exactly — O(depth·width) state per group at any row count, the
  * frequency-table companion to SpaceSaving's top-k (which keeps WHO is
  * heavy; the sketch answers "how often is X" for arbitrary X after one
  * pass, e.g. token frequencies for corpus-level rarity scoring).
  */
case class CountMinAgg(
    child: Expression,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(width > 0 && depth > 0 && depth <= 16)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_min_agg expects a bigint column (hash wider keys first), got $other")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](width * depth)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var d = 0
      while (d < depth) {
        buf(d * width + CountMinUtil.bucket(x, d, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bytes.putLong)
    bytes.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

/** Point estimate against a built sketch: min over depth rows of the
  * key's counter. Codegen delegates to the same static CountMinUtil body
  * as the interpreted path.
  */
case class CountMinEstimate(left: Expression, right: Expression,
    width: Int, depth: Int) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cm_estimate expects (array<bigint>, bigint), got ($l, $r)")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData].toLongArray()
    CountMinUtil.estimate(arr, b.asInstanceOf[Long], width, depth)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.CountMinUtil.estimate($a.toLongArray(), $b, $width, $depth);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}

object CountMinAgg {
  def count_min_agg(key: Column, width: Int, depth: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      CountMinAgg(org.apache.spark.sql.graftbridge.Bridge.expression(key),
        width, depth).toAggregateExpression())

  def cm_estimate(sketch: Column, key: Column, width: Int, depth: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      CountMinEstimate(
        org.apache.spark.sql.graftbridge.Bridge.expression(sketch),
        org.apache.spark.sql.graftbridge.Bridge.expression(key), width, depth))
}
