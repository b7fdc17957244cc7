package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Mutable buffer: the distinct values seen so far (as canonical unsafe-row
  * bytes), or `overflowed` once the cap is exceeded — after which the set
  * is dropped and the state is O(1).
  */
class BoundedDistinctSet(
    var overflowed: Boolean,
    val set: java.util.HashSet[ByteBuffer])

/** Exact COUNT(DISTINCT) with a state cap: counts exactly while the
  * per-group distinct count stays ≤ cap, and degrades to NULL (caller
  * falls back to an HLL estimate) the moment it exceeds it — with O(cap)
  * worst-case state, not O(distinct).
  *
  * This is what lets the crawler's profiler (SURVEY.md §2.8 C3) do
  * exact-below-threshold distinct counts in the SAME single scan as the
  * rest of the profile: a plain countDistinct would need Spark's
  * expand+regroup rewrite (a second shuffle of all rows), and an unbounded
  * collect_set would hold every distinct value in memory — at 100 TB an
  * id column would OOM the executor. Mergeable map-side like any
  * TypedImperativeAggregate: partial sets union at the exchange, overflow
  * is sticky.
  *
  * Values are canonicalized to UnsafeRow bytes via a single-field
  * projection, so any data type (including arrays/structs) gets
  * value-semantics dedup.
  */
case class BoundedDistinct(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedDistinctSet] {

  require(cap > 0, "cap must be positive")

  @transient private lazy val proj: UnsafeProjection =
    UnsafeProjection.create(Array(child.dataType))

  override def createAggregationBuffer(): BoundedDistinctSet =
    new BoundedDistinctSet(false, new java.util.HashSet[ByteBuffer]())

  private def overflow(buf: BoundedDistinctSet): Unit = {
    buf.overflowed = true
    buf.set.clear()
  }

  override def update(buf: BoundedDistinctSet, input: InternalRow): BoundedDistinctSet = {
    if (!buf.overflowed) {
      val v = child.eval(input)
      if (v != null) {
        val row = proj(InternalRow(v))
        buf.set.add(ByteBuffer.wrap(
          java.util.Arrays.copyOf(row.getBytes, row.getSizeInBytes)))
        if (buf.set.size > cap) overflow(buf)
      }
    }
    buf
  }

  override def merge(buf: BoundedDistinctSet, other: BoundedDistinctSet): BoundedDistinctSet = {
    if (buf.overflowed || other.overflowed) overflow(buf)
    else {
      buf.set.addAll(other.set)
      if (buf.set.size > cap) overflow(buf)
    }
    buf
  }

  /** Exact distinct count, or null once the cap was exceeded. */
  override def eval(buf: BoundedDistinctSet): Any =
    if (buf.overflowed) null else buf.set.size.toLong

  override def serialize(buf: BoundedDistinctSet): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.overflowed)
    out.writeInt(buf.set.size)
    buf.set.forEach { bb =>
      out.writeInt(bb.remaining())
      out.write(bb.array(), bb.arrayOffset() + bb.position(), bb.remaining())
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedDistinctSet = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new BoundedDistinctSet(in.readBoolean(), new java.util.HashSet[ByteBuffer]())
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      buf.set.add(ByteBuffer.wrap(arr))
    }
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(offset: Int): BoundedDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedDistinct =
    copy(child = newChildren.head)
}

object BoundedDistinct {
  /** Exact distinct count while ≤ cap, null after (fall back to HLL). */
  def bounded_distinct(c: Column, cap: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      BoundedDistinct(org.apache.spark.sql.graftbridge.Bridge.expression(c), cap)
        .toAggregateExpression())
}
