package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally, Agrawal, El Abbadi 2005;
  * merge per Agarwal et al., "Mergeable Summaries") as a mergeable
  * aggregate: approximate top items of a string column in O(capacity)
  * state per group, single pass, map-side partial aggregation.
  *
  * Guarantees (what the spec and the gate pin):
  *   - estimate(x) ≥ true(x) for every item (counts never undercount);
  *   - estimate(x) − error(x) ≤ true(x) (the error field bounds the
  *     overcount);
  *   - any item with true(x) > n/capacity is IN the summary.
  * The merge is the pessimistic union: an item absent from one side
  * contributes that side's minimum count as both count and error —
  * which preserves the overcount invariant, so the guarantees above
  * hold under any partitioning (partition-invariance of the GUARANTEE,
  * not of the exact estimates, is the mergeable-summary contract).
  *
  * Why this over exact groupBy-count at 100 TB: the exact path shuffles
  * every distinct item; this shuffles `capacity` rows per partition and
  * never materializes the long tail.
  */
case class SpaceSaving(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, (Long, Long)]] {

  require(capacity > 0, "capacity must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"space_saving expects a string column, got $other")
  }

  type Buf = mutable.LinkedHashMap[String, (Long, Long)]

  override def createAggregationBuffer(): Buf = mutable.LinkedHashMap.empty

  private def minEntry(buf: Buf): (String, (Long, Long)) =
    buf.minBy { case (item, (c, _)) => (c, item) }

  private def offer(buf: Buf, item: String, add: Long, addErr: Long): Unit =
    buf.get(item) match {
      case Some((c, e)) => buf.update(item, (c + add, e + addErr))
      case None if buf.size < capacity => buf.update(item, (add, addErr))
      case None =>
        // Evict the min-count item; its count bounds the new item's
        // possible prior occurrences, so it becomes count AND error.
        val (victim, (mc, _)) = minEntry(buf)
        buf.remove(victim)
        buf.update(item, (mc + add, mc + addErr))
    }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.toString, 1L, 0L)
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) { other.foreach { case (i, (c, e)) => buf.update(i, (c, e)) }; return buf }
    // A summary below capacity has never evicted, so an absent item's
    // count there is EXACTLY 0 — only a full summary forces the
    // pessimistic min-count contribution.
    val minA = if (buf.size < capacity) 0L else minEntry(buf)._2._1
    val minB = if (other.size < capacity) 0L else minEntry(other)._2._1
    val merged = mutable.LinkedHashMap.empty[String, (Long, Long)]
    (buf.keySet ++ other.keySet).foreach { item =>
      val (ca, ea) = buf.getOrElse(item, (minA, minA))
      val (cb, eb) = other.getOrElse(item, (minB, minB))
      merged.update(item, (ca + cb, ea + eb))
    }
    // Keep the capacity largest counts (ties by item for determinism).
    val kept = merged.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(capacity)
    buf.clear()
    kept.foreach { case (i, ce) => buf.update(i, ce) }
    buf
  }

  /** array<struct<item,count,error>> sorted by count desc, item asc. */
  override def eval(buf: Buf): Any = {
    val rows = buf.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.map {
      case (i, (c, e)) =>
        InternalRow(UTF8String.fromString(i), c, e)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, (c, e)) =>
      out.writeUTF(i); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val i = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      buf.update(i, (c, e))
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("error", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(offset: Int): SpaceSaving =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SpaceSaving =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSaving =
    copy(child = newChildren.head)
}

object SpaceSaving {
  /** Column-level accessor: heavy hitters as array<struct<item,count,error>>. */
  def space_saving(c: Column, capacity: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      SpaceSaving(org.apache.spark.sql.graftbridge.Bridge.expression(c), capacity)
        .toAggregateExpression())
}
