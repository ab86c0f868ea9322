package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Upper-triangular Gram/covariance accumulation as ONE native aggregate.
  *
  * The declarative formulation (explode d·(d+1)/2 product structs per row,
  * hash-aggregate them) materializes and hashes ~2k rows per input vector
  * — measured 3.3 s on the sf0.1 bench, all of it Generate + HashAggregate
  * overhead. This aggregate folds each vector into a single long[] buffer
  * in place (one fused multiply-floor-add pass, no per-entry allocation),
  * and partial aggregation ships exactly one buffer per map task, so the
  * exchange carries tri(d)·partitions longs however large the corpus.
  *
  * Per-row products are micro-floored BEFORE accumulation — bit-identical
  * to the declarative form and the DuckDB oracle (`ml_pca_covariance`
  * pins it): integer sums are order-free, so partial-aggregation order
  * can't perturb the result.
  */
case class GramMicro(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramMicro.Buffer] {

  require(dim > 0, s"gram_micro: dim must be positive, got $dim")
  private val tri = dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_micro"

  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_micro expects array<double>, got ${t.sql}")
  }

  override def createAggregationBuffer(): GramMicro.Buffer =
    new GramMicro.Buffer(new Array[Long](tri), 0L)

  override def update(buf: GramMicro.Buffer, input: InternalRow): GramMicro.Buffer = {
    val a = child.eval(input)
    if (a != null) {
      val cx = a.asInstanceOf[ArrayData].toDoubleArray()
      require(cx.length == dim, s"gram_micro: expected dim $dim, got ${cx.length}")
      var pos = 0
      var i = 0
      while (i < dim) {
        val xi = cx(i)
        var j = i
        while (j < dim) {
          buf.sums(pos) += math.floor(xi * cx(j) * 1000000.0).toLong
          pos += 1
          j += 1
        }
        i += 1
      }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: GramMicro.Buffer, other: GramMicro.Buffer): GramMicro.Buffer = {
    var p = 0
    while (p < tri) { buf.sums(p) += other.sums(p); p += 1 }
    buf.n += other.n
    buf
  }

  override def eval(buf: GramMicro.Buffer): Any =
    InternalRow(new GenericArrayData(buf.sums.map(Long.box).toArray[Any]), buf.n)

  override def serialize(buf: GramMicro.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + tri * 8)
    bb.putLong(buf.n)
    var p = 0
    while (p < tri) { bb.putLong(buf.sums(p)); p += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramMicro.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val sums = new Array[Long](tri)
    var p = 0
    while (p < tri) { sums(p) = bb.getLong; p += 1 }
    new GramMicro.Buffer(sums, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMicro =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMicro =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramMicro =
    copy(child = newChildren(0))
}

object GramMicro {
  final class Buffer(val sums: Array[Long], var n: Long)

  /** `gram_micro(cx, dim)`: struct(sums: array<bigint> of the tri(dim)
    * upper-triangular micro-floored product sums in (i, j>=i) row-major
    * order, n: row count). */
  def gramMicro(cx: Column, dim: Int): Column =
    ColumnBridge.column(GramMicro(
      ColumnBridge.expression(cx), dim).toAggregateExpression())
}
