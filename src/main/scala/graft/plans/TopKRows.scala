package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, InterpretedOrdering, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Payload-generic grouped top-k: keeps the k best FULL ROWS per group
  * under an arbitrary `ORDER BY` (any column count, direction, null
  * ordering), as a mergeable aggregate — the whole-row generalization of
  * TopKByScore (which carries only a (double, id) pair).
  *
  * Why: `row_number() OVER (PARTITION BY p ORDER BY o) <= k` — the
  * universal grouped-top-k idiom — plans as a full shuffle of EVERY row
  * plus a per-partition sort. This aggregate keeps an O(k) heap per group
  * map-side, so the exchange carries at most k·groups·mappers rows and
  * nothing is ever fully sorted. `RewriteTopKWindow` rewrites the window
  * idiom to this automatically.
  *
  * Buffer rows are UnsafeRows of (sort keys ++ payload struct); ordering
  * is Spark's own InterpretedOrdering over the key prefix, so direction /
  * null-ordering semantics match the window sort exactly. Ties beyond k
  * are dropped arbitrarily — the same nondeterminism row_number itself
  * has on tied keys.
  */
case class TopKRowsAgg(
    ordering: Seq[SortOrder],
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[UnsafeRow]] {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = ordering.map(_.child.dataType).filterNot(RowOrdering.isOrderable)
    if (bad.nonEmpty)
      TypeCheckResult.TypeCheckFailure(s"unorderable sort key types: $bad")
    else if (!payload.dataType.isInstanceOf[StructType])
      TypeCheckResult.TypeCheckFailure(
        s"payload must be a struct, got ${payload.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def ordN = ordering.size
  private lazy val payloadType = payload.dataType.asInstanceOf[StructType]
  private def rowNumFields = ordN + 1

  // Children arrive bound to the input schema, so both the projection and
  // the ordering are built lazily on the executor from the bound copies.
  @transient private lazy val proj =
    UnsafeProjection.create((ordering.map(_.child) :+ payload).toArray)
  @transient private lazy val bestFirst: Ordering[InternalRow] =
    new InterpretedOrdering(ordering.zipWithIndex.map { case (so, i) =>
      SortOrder(BoundReference(i, so.child.dataType, so.child.nullable),
        so.direction, so.nullOrdering, Seq.empty)
    })
  // PriorityQueue evicts its least element; "least" under the reversed
  // ordering is the WORST row, which is exactly what trim must drop.
  @transient private lazy val worstFirst = bestFirst.reverse

  override def createAggregationBuffer(): java.util.PriorityQueue[UnsafeRow] =
    new java.util.PriorityQueue[UnsafeRow](math.max(k, 1), worstFirst)

  // A full heap rejects rows comparing EQUAL to the current worst, so
  // under a non-total ordering the kept SET (not just the ranks) depends
  // on arrival order. Gated callers must use a total ORDER BY (unique
  // tiebreak column) — see the tie caveat in RewriteTopKWindow's scaladoc.
  private def offer(buf: java.util.PriorityQueue[UnsafeRow], row: UnsafeRow): Unit =
    if (buf.size < k) buf.add(row.copy())
    else if (bestFirst.compare(row, buf.peek) < 0) {
      buf.poll(); buf.add(row.copy())
    }

  override def update(
      buf: java.util.PriorityQueue[UnsafeRow],
      input: InternalRow): java.util.PriorityQueue[UnsafeRow] = {
    offer(buf, proj(input)); buf
  }

  override def merge(
      buf: java.util.PriorityQueue[UnsafeRow],
      other: java.util.PriorityQueue[UnsafeRow]): java.util.PriorityQueue[UnsafeRow] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: java.util.PriorityQueue[UnsafeRow]): Any = {
    val arr = new Array[UnsafeRow](buf.size)
    buf.toArray(arr)
    java.util.Arrays.sort(arr, bestFirst)
    new GenericArrayData(arr.map(r =>
      r.getStruct(ordN, payloadType.size).copy(): Any))
  }

  override def serialize(buf: java.util.PriorityQueue[UnsafeRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val bytes = it.next().getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[UnsafeRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(rowNumFields)
      row.pointTo(arr, len)
      buf.add(row)
    }
    buf
  }

  override def dataType: DataType = ArrayType(payloadType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = ordering.map(_.child) :+ payload

  override def withNewMutableAggBufferOffset(offset: Int): TopKRowsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKRowsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRowsAgg =
    copy(
      ordering = ordering.zip(newChildren.dropRight(1))
        .map { case (so, c) => so.copy(child = c) },
      payload = newChildren.last)
}

object TopKRowsAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.catalyst.expressions.Ascending
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-level accessor. `order` columns may carry sort modifiers
    * (`col.desc`, `col.asc_nulls_last`, …); a bare column sorts
    * ascending, matching DataFrame `orderBy` semantics.
    */
  def top_k_rows(k: Int, payload: Column, order: Column*): Column = {
    // eagerExpression, not expression: the lazy ColumnNodeExpression
    // wrapper would hide the SortOrder behind `col.desc` and get
    // double-wrapped here (unevaluable SortOrder inside the heap's
    // projection — executor crash).
    val sortOrders = order.map(c => Bridge.eagerExpression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    Bridge.column(
      TopKRowsAgg(sortOrders, Bridge.expression(payload), k)
        .toAggregateExpression())
  }
}
