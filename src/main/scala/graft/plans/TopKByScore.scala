package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Top-k (score, id) pairs per group, ordered by score DESC then id ASC —
  * the mergeable reduce of a k-NN join: map-side partial heaps per
  * partition, heap-union at the exchange, O(k) state per group. The
  * window-function formulation (rank over a per-group sort) is O(n log n)
  * shuffle per group; this is O(n log k) map-side with an O(k) shuffle.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]] {

  require(k > 0, "k must be positive")

  /** Reject mismatched types at ANALYSIS time (update() casts with
    * asInstanceOf — without this a float score column would pass analysis
    * and ClassCastException on executors mid-job).
    */
  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score expects (double score, bigint id), got ($s, $i)")
    }

  private object Ord extends Ordering[(Double, Long)] with Serializable {
    // best-first: higher score first, then smaller id
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](Ord)

  private def trim(buf: java.util.TreeSet[(Double, Long)]): Unit =
    while (buf.size() > k) buf.pollLast()

  override def update(
      buf: java.util.TreeSet[(Double, Long)],
      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    // NaN would compare above every real score (Double.compare semantics)
    // and pollute the heap; skip it like SQL aggregates skip null.
    if (s != null && i != null && !java.lang.Double.isNaN(s.asInstanceOf[Double])) {
      buf.add((s.asInstanceOf[Double], i.asInstanceOf[Long])); trim(buf)
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[(Double, Long)],
      other: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    buf.addAll(other); trim(buf); buf
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val rows = new Array[Any](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (s, id) = it.next()
      rows(i) = InternalRow(s, id)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) { val (s, i) = it.next(); out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add((in.readDouble(), in.readLong())))
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      TopKByScore(
        org.apache.spark.sql.graftbridge.Bridge.expression(score),
        org.apache.spark.sql.graftbridge.Bridge.expression(id), k)
        .toAggregateExpression())
}
