package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Little-endian float32 BLOB ↔ `array<float>` decoding — the reference's
  * on-disk vector format (vector_store.cpp:673-685; verified against
  * export_for_training.py:27 `np.frombuffer(blob, dtype=np.float32)` and
  * the shipped vectors.db artifact: 3072-dim → 12,288-byte blobs).
  * Lets the engine ingest legacy stores and any float32-packed binary
  * column (multimodal embeddings in payload form).
  */
case class Float32Decode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "float32_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"float32_decode expects binary, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val n = bytes.length / 4
    val out = new Array[Float](n)
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { out(i) = buf.getFloat(i * 4); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out"); val buf = ctx.freshName("buf")
      s"""
        |int $n = $b.length / 4;
        |float[] $out = new float[$n];
        |java.nio.ByteBuffer $buf = java.nio.ByteBuffer.wrap($b)
        |  .order(java.nio.ByteOrder.LITTLE_ENDIAN);
        |for (int $i = 0; $i < $n; $i++) { $out[$i] = $buf.getFloat($i * 4); }
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Inverse: `array<float>` → little-endian float32 blob (the A5 export
  * format). Interpreted eval only (cold path: export, not scans). */
case class Float32Encode(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "float32_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"float32_encode expects array<float>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val buf = java.nio.ByteBuffer.allocate(n * 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { buf.putFloat(i * 4, arr.getFloat(i)); i += 1 }
    buf.array()
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-window unsigned-byte sums over a binary payload: one O(n) pass
  * emitting `len / window` full-window sums (trailing partial window
  * dropped, matching `range(0, len // window)`). This is the windowed
  * analog of the reference's single-pass per-page char loop
  * (pdf_processor.cpp:88-95): each byte is visited exactly once, so a
  * 1 MB audio payload costs ~10⁶ adds — where per-offset `substr` on a
  * STRING column is O(position) per access (UTF8String code-point scan)
  * and the same row would cost ~10⁹ scans. Drives mm_energy_segments'
  * VAD windowing. */
case class ByteWindowSums(child: Expression, window: Int) extends UnaryExpression {
  require(window > 0, "window must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "byte_window_sums"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"byte_window_sums expects binary, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val n = bytes.length / window
    val out = new Array[Long](n)
    var w = 0
    while (w < n) {
      var s = 0L; var j = w * window; val end = j + window
      while (j < end) { s += (bytes(j) & 0xff); j += 1 }
      out(w) = s; w += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val n = ctx.freshName("n"); val w = ctx.freshName("w")
      val j = ctx.freshName("j"); val end = ctx.freshName("end")
      val s = ctx.freshName("s"); val out = ctx.freshName("out")
      s"""
        |int $n = $b.length / $window;
        |long[] $out = new long[$n];
        |for (int $w = 0; $w < $n; $w++) {
        |  long $s = 0L;
        |  int $end = ($w + 1) * $window;
        |  for (int $j = $w * $window; $j < $end; $j++) { $s += ($b[$j] & 0xff); }
        |  $out[$w] = $s;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Content-defined chunk boundaries over a binary payload (the FastCDC /
  * rsync family's shape, basic stateless form): one O(n) pass with a
  * ROLLING `window`-byte sum, emitting every 1-based end position j ≥
  * window where sum(bytes j−window+1..j) ≡ 0 (mod `modulus`). Boundaries
  * are a pure function of local CONTENT, so an insertion re-aligns only
  * the chunks it touches — the property that makes CDC dedup robust
  * where fixed-width blocking is not. Rolling update (add the entering
  * byte, drop the leaving one) keeps the pass O(n) regardless of window;
  * a per-position re-sum would be O(n·window) and a per-position
  * STRING substr O(n²) (the round-7 quadratic family). Expected chunk
  * length ≈ modulus on byte-sum-uniform content. Replayable exactly in
  * SQL via prefix sums: ws(j) = pre(j) − pre(j−window). */
case class ByteCdcBoundaries(child: Expression, window: Int, modulus: Int)
    extends UnaryExpression {
  require(window > 0, "window must be positive")
  require(modulus > 0, "modulus must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "byte_cdc_boundaries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"byte_cdc_boundaries expects binary, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val n = bytes.length
    val buf = new Array[Int](if (n >= window) n - window + 1 else 0)
    var m = 0
    var s = 0L
    var j = 0
    while (j < n) {
      s += (bytes(j) & 0xff)
      if (j >= window) s -= (bytes(j - window) & 0xff)
      if (j >= window - 1 && s % modulus == 0) { buf(m) = j + 1; m += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val m = ctx.freshName("m")
      val buf = ctx.freshName("buf")
      s"""
        |int $n = $b.length;
        |int[] $buf = new int[$n >= $window ? $n - $window + 1 : 0];
        |int $m = 0;
        |long $s = 0L;
        |for (int $j = 0; $j < $n; $j++) {
        |  $s += ($b[$j] & 0xff);
        |  if ($j >= $window) { $s -= ($b[$j - $window] & 0xff); }
        |  if ($j >= $window - 1 && $s % $modulus == 0) { $buf[$m++] = $j + 1; }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        |  java.util.Arrays.copyOf($buf, $m));
      """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BlobFunctions {
  def byteWindowSums(c: Column, window: Int): Column =
    ColumnBridge.column(ByteWindowSums(ColumnBridge.expression(c), window))
  def byteCdcBoundaries(c: Column, window: Int, modulus: Int): Column =
    ColumnBridge.column(ByteCdcBoundaries(ColumnBridge.expression(c), window, modulus))
  def float32Decode(c: Column): Column =
    ColumnBridge.column(Float32Decode(ColumnBridge.expression(c)))
  def float32Encode(c: Column): Column =
    ColumnBridge.column(Float32Encode(ColumnBridge.expression(c.cast(ArrayType(FloatType)))))
}
