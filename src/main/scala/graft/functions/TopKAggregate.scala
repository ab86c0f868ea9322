package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Exact per-group top-k as a native Catalyst aggregate.
  *
  * The scale point: the window-rank formulation (`row_number() OVER
  * (PARTITION BY g ORDER BY score DESC)` then `rank <= k`) shuffles EVERY
  * row to its group's partition before ranking — at 100 TB the shuffle is
  * the corpus. A TypedImperativeAggregate gets partial aggregation for
  * free: each map task reduces its slice to ≤ k entries per group, so the
  * exchange carries k·groups rows however large the input. Ordering is
  * total — (score desc, payload asc) — so the result is deterministic and
  * identical to the window formulation (`q_topk_by_agg` pins that against
  * the DuckDB oracle; the plan assertion pins the partial_topk_by shape).
  *
  * Buffer = bounded priority queue with the WORST entry at the head
  * (classic top-k heap): an insert against a full buffer evicts the head
  * iff the candidate beats it, O(log k) per row.
  */
case class TopKBy(
    payload: Expression,
    score: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"topk_by: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(payload, score)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("payload", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (payload.dataType, score.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (p, s) => TypeCheckResult.TypeCheckFailure(
        s"topk_by expects (bigint, double), got (${p.sql}, ${s.sql})")
    }

  // max under this ordering = the WORST kept entry (lowest score, then
  // highest payload) — exactly what a bounded top-k heap evicts first
  private val evictOrd: Ordering[(Double, Long)] =
    Ordering.by(t => (-t._1, t._2))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](evictOrd)

  private def insert(
      buf: mutable.PriorityQueue[(Double, Long)],
      cand: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(cand)
    else if (evictOrd.lt(cand, buf.head)) { buf.dequeue(); buf.enqueue(cand) }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val p = payload.eval(input)
    val s = score.eval(input)
    if (p != null && s != null)
      insert(buf, (s.asInstanceOf[Double], p.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any =
    new GenericArrayData(buf.toSeq.sorted(evictOrd).map { case (s, p) =>
      InternalRow(p, s)
    }.toArray[Any])

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, p) => bb.putDouble(s); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKBy =
    copy(payload = newChildren(0), score = newChildren(1))
}

object TopKFunctions {
  /** `topk_by(payload, score, k)` as a Column aggregate: array of the k
    * (payload, score) structs, best first — (score desc, payload asc). */
  def topkBy(payload: Column, score: Column, k: Int): Column =
    ColumnBridge.column(TopKBy(
      ColumnBridge.expression(payload.cast(LongType)),
      ColumnBridge.expression(score.cast(DoubleType)), k).toAggregateExpression())
}
