package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Shared bit math for the Bloom aggregate and the membership expression —
  * ONE definition of the hash family so the build side and the probe side
  * can never disagree. Double hashing (Kirsch–Mitzenmacher): position_i =
  * (h1 + i·h2) mod m over two murmur-finalizer mixes of the key.
  */
object BloomUtil {
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  private def bitIndex(h1: Long, h2: Long, i: Int, numBits: Long): Long =
    ((h1 + i * h2) & Long.MaxValue) % numBits

  def setBits(buf: Array[Byte], v: Long, numHashes: Int): Unit = {
    val numBits = buf.length.toLong * 8L
    val h1 = fmix64(v)
    val h2 = fmix64(v ^ 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < numHashes) {
      val b = bitIndex(h1, h2, i, numBits)
      buf((b >>> 3).toInt) = (buf((b >>> 3).toInt) | (1 << (b & 7)).toByte).toByte
      i += 1
    }
  }

  /** Static and JVM-codegen-callable: the generated filter code calls this
    * directly, so interpreted and compiled paths are the same code.
    */
  def mightContain(buf: Array[Byte], v: Long, numHashes: Int): Boolean = {
    val numBits = buf.length.toLong * 8L
    val h1 = fmix64(v)
    val h2 = fmix64(v ^ 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < numHashes) {
      val b = bitIndex(h1, h2, i, numBits)
      if ((buf((b >>> 3).toInt) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Bitset sizing: m = n·bitsPerKey bits. The hash count is NOT derived
    * here — the engine pins k = BloomMightContain.DefaultHashes (7, the
    * ln2·10 optimum) on build AND probe so they can never disagree; fpp
    * is therefore ≈0.8% at 10 bits/key and off-optimal (but still
    * false-negative-free) at other densities.
    */
  def sizing(expectedKeys: Long, bitsPerKey: Int): (Int, Int) = {
    require(expectedKeys > 0 && bitsPerKey > 0)
    val bytes = math.max(8L, (expectedKeys * bitsPerKey + 7) / 8)
    require(bytes <= Int.MaxValue - 16, s"bloom of $bytes bytes exceeds array limit")
    (bytes.toInt, BloomMightContain.DefaultHashes)
  }
}

/** Mergeable Bloom-filter aggregate over a bigint key column. Map-side
  * partials each build a local filter; merge is bitwise OR — the property
  * that makes a distributed build exactly equal to a serial one, at O(m)
  * state per group regardless of row count. Evaluates to the raw bitset
  * (binary), fed to [[BloomMightContain]] or persisted next to a dataset
  * as a join-pruning index.
  */
case class BloomFilterAgg(
    child: Expression,
    numBytes: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(numBytes > 0 && numHashes > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a bigint column (hash wider keys first), got $other")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBytes)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.setBits(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(offset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren.head)
}

/** Membership probe against a built filter — a codegen-friendly scalar
  * that stays inside whole-stage codegen, so the prefilter runs at scan
  * speed map-side (the point of the exercise: drop fact rows BEFORE the
  * join shuffle). The filter side is typically a literal (driver-built,
  * broadcast with the closure); false positives possible, false negatives
  * never.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (binary, bigint), got ($l, $r)")
    }

  override def dataType: DataType = BooleanType

  // Hash count is a build-time choice the probe must repeat; both sides
  // pin DefaultHashes so they cannot disagree (see companion object).
  val numHashes: Int = BloomMightContain.DefaultHashes

  override def nullSafeEval(a: Any, b: Any): Any =
    BloomUtil.mightContain(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.BloomUtil.mightContain($a, $b, $numHashes);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  /** One fixed k for build AND probe (k=7 ≈ the 10-bits/key optimum).
    * Carrying k as a field on both sides is possible but this engine pins
    * it — one fewer way for build and probe to disagree.
    */
  val DefaultHashes = 7

  def bloom_agg(key: Column, numBytes: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      BloomFilterAgg(org.apache.spark.sql.graftbridge.Bridge.expression(key),
        numBytes, DefaultHashes).toAggregateExpression())

  def bloom_might_contain(bloom: Column, key: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      BloomMightContain(
        org.apache.spark.sql.graftbridge.Bridge.expression(bloom),
        org.apache.spark.sql.graftbridge.Bridge.expression(key)))
}
