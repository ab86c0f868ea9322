package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession

/** Cosine similarity over two `array<float>` columns, computed with double
  * accumulation, as a native Catalyst expression with whole-stage codegen.
  *
  * Semantics mirror the reference engine's `cosineSimilarity`
  * (/root/reference/vector_store.cpp:750-762): returns 0.0 on dimension
  * mismatch, empty input, or zero norm — never NaN. This is the single hot
  * scalar op of the whole engine (SURVEY §2 D1); a codegen expression keeps
  * it inside WholeStageCodegen instead of breaking the pipeline at a UDF.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override def foldable: Boolean = left.foldable && right.foldable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0 || y.numElements() != n) 0.0d
    else {
      var dot = 0.0d; var na = 0.0d; var nb = 0.0d; var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
      }
      if (na == 0.0d || nb == 0.0d) 0.0d else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
        |int $n = $a.numElements();
        |if ($n == 0 || $b.numElements() != $n) { ${ev.value} = 0.0; } else {
        |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    double $xi = $a.getFloat($i); double $yi = $b.getFloat($i);
        |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        |  }
        |  ${ev.value} = ($na == 0.0 || $nb == 0.0)
        |    ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product over two `array<float>` columns (double accumulation, codegen).
  * 0.0 on dimension mismatch / empty, matching [[CosineSimilarity]]. Used by
  * sign-LSH bucketing and as the cheap kernel when norms are precomputed. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def foldable: Boolean = left.foldable && right.foldable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (array<float>, array<float>), got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0 || y.numElements() != n) 0.0d
    else {
      var dot = 0.0d; var i = 0
      while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      s"""
        |int $n = $a.numElements();
        |if ($n == 0 || $b.numElements() != $n) { ${ev.value} = 0.0; } else {
        |  double $dot = 0.0;
        |  for (int $i = 0; $i < $n; $i++) { $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i)); }
        |  ${ev.value} = $dot;
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 norm of an `array<float>` column (double accumulation, codegen). Stored
  * as a precomputed column so cosine degrades to dot/const at scan time. */
case class L2Norm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"l2_norm expects array<float>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0d; var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val v = ctx.freshName("v")
      s"""
        |int $n = $a.numElements();
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) { double $v = $a.getFloat($i); $s += $v * $v; }
        |${ev.value} = java.lang.Math.sqrt($s);
      """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Cosine similarity when the norms are PRECOMPUTED: dot(a,b)/(na*nb) with
  * [[CosineSimilarity]]'s exact guard semantics (0.0 on dimension mismatch,
  * empty input, or zero norm — never NaN). Produced by the
  * [[graft.plans.NormPrecomputeRewrite]] analyzer rule, never written by
  * hand: when a stored norm column is in scope the per-row kernel drops
  * from 3 FMAs/element (dot + both norms) to 1 (dot only). Bit-exact vs
  * the fused form — L2Norm runs the same accumulation order and the final
  * `dot / (na * nb)` is the same double op sequence as
  * `dot / (sqrt(na2) * sqrt(nb2))`. */
case class NormalizedDot(a: Expression, b: Expression,
                         normA: Expression, normB: Expression)
    extends QuaternaryExpression {

  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = normA
  override def fourth: Expression = normB

  override def dataType: DataType = DoubleType
  override def prettyName: String = "normalized_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType, normA.dataType, normB.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _), DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"normalized_dot expects (array<float>, array<float>, double, double), got $t")
    }

  override def nullSafeEval(av: Any, bv: Any, nav: Any, nbv: Any): Any = {
    val x = av.asInstanceOf[ArrayData]
    val y = bv.asInstanceOf[ArrayData]
    val na = nav.asInstanceOf[Double]
    val nb = nbv.asInstanceOf[Double]
    val n = x.numElements()
    if (n == 0 || y.numElements() != n || na == 0.0d || nb == 0.0d) 0.0d
    else {
      var dot = 0.0d; var i = 0
      while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      dot / (na * nb)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, bv, nav, nbv) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      s"""
        |int $n = $av.numElements();
        |if ($n == 0 || $bv.numElements() != $n || $nav == 0.0 || $nbv == 0.0) {
        |  ${ev.value} = 0.0;
        |} else {
        |  double $dot = 0.0;
        |  for (int $i = 0; $i < $n; $i++) { $dot += ((double) $av.getFloat($i)) * ((double) $bv.getFloat($i)); }
        |  ${ev.value} = $dot / ($nav * $nbv);
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(a = f, b = s, normA = t, normB = q)
}

/** Product-quantization encoder: per subspace of `subDim` dims, the index
  * of the nearest codebook entry by MICRO-QUANTIZED squared L2 (floor of
  * 1e6× the double sum — the same integers the DuckDB oracle computes, so
  * ties break identically: strict `<` keeps the lowest index). Returns
  * `array<int>` of `vec.length / subDim` codes.
  *
  * This is the PQ hot loop (SURVEY §4: custom codegen Expression where
  * built-ins can't express it efficiently): the higher-order-function
  * formulation (transform + aggregate over sliced arrays) evaluates
  * interpreted with per-element allocations; this expression is one
  * generated triple loop inside WholeStageCodegen. */
/** All `tables` sign-LSH bucket ids of one vector in ONE codegen loop:
  * bucket_t = Σ_i [dot(vec, hp[t·perTable + i]) > 0] << i over the flat
  * literal hyperplane matrix (row-major by table). Semantically identical
  * to composing `tables × perTable` [[DotProduct]] nodes with when/sum —
  * the per-pair dot uses the same index-order double accumulation, so the
  * sign decisions (and therefore the buckets the DuckDB oracle replays)
  * cannot differ — but the expression TREE is one node instead of 64:
  * the generated method is a small triple loop, so plan compilation stays
  * O(1) as tables grow (the multi-table query was plan-compile-bound).
  */
case class SignLshBuckets(vec: Expression, hyperplanes: Expression, tables: Int)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = hyperplanes
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, hyperplanes.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) if tables > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_buckets expects (array<float>, array<array<float>>), got (${vec.dataType.sql}, ${hyperplanes.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val hp = b.asInstanceOf[ArrayData]
    val perTable = hp.numElements() / tables
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L; var i = 0
      while (i < perTable) {
        // a NULL hyperplane row contributes dot 0.0 (bit unset) — the
        // same outcome the composed DotProduct form yields, and a live
        // hazard for SQL users of sign_lsh_buckets with array literals
        val hi = t * perTable + i
        val h = if (hp.isNullAt(hi)) null else hp.getArray(hi)
        val n = v.numElements()
        var dot = 0.0d
        if (h != null && n != 0 && h.numElements() == n) {
          var k = 0
          while (k < n) { dot += v.getFloat(k).toDouble * h.getFloat(k).toDouble; k += 1 }
        }
        if (dot > 0.0d) bucket |= 1L << i
        i += 1
      }
      out(t) = bucket; t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val pt = ctx.freshName("perTable"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket"); val h = ctx.freshName("h")
      s"""
        |int $pt = $b.numElements() / $tables;
        |long[] $out = new long[$tables];
        |int $n = $a.numElements();
        |for (int $t = 0; $t < $tables; $t++) {
        |  long $bucket = 0L;
        |  for (int $i = 0; $i < $pt; $i++) {
        |    org.apache.spark.sql.catalyst.util.ArrayData $h =
        |      $b.isNullAt($t * $pt + $i) ? null : $b.getArray($t * $pt + $i);
        |    double $dot = 0.0;
        |    if ($h != null && $n != 0 && $h.numElements() == $n) {
        |      for (int $k = 0; $k < $n; $k++) { $dot += ((double) $a.getFloat($k)) * ((double) $h.getFloat($k)); }
        |    }
        |    if ($dot > 0.0) $bucket |= 1L << $i;
        |  }
        |  $out[$t] = $bucket;
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, hyperplanes = newRight)
}

case class PqEncode(vec: Expression, codebook: Expression, subDim: Int)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = codebook
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, codebook.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) if subDim > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects (array<float>, array<array<float>>), got (${vec.dataType.sql}, ${codebook.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val m = v.numElements() / subDim
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var bestD = Long.MaxValue; var bestJ = -1; var j = 0
      while (j < cb.numElements()) {
        val cj = cb.getArray(j)
        var s = 0.0d; var k = 0
        val base = mi * subDim
        while (k < subDim) {
          val d = v.getFloat(base + k).toDouble - cj.getFloat(base + k).toDouble
          s += d * d; k += 1
        }
        val dm = math.floor(s * 1000000.0).toLong
        if (dm < bestD) { bestD = dm; bestJ = j }
        j += 1
      }
      codes(mi) = bestJ; mi += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m"); val mi = ctx.freshName("mi"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val dm = ctx.freshName("dm"); val bestD = ctx.freshName("bestD")
      val bestJ = ctx.freshName("bestJ"); val codes = ctx.freshName("codes")
      val cj = ctx.freshName("cj"); val base = ctx.freshName("base")
      s"""
        |int $m = $a.numElements() / $subDim;
        |int[] $codes = new int[$m];
        |for (int $mi = 0; $mi < $m; $mi++) {
        |  long $bestD = Long.MAX_VALUE; int $bestJ = -1;
        |  int $base = $mi * $subDim;
        |  for (int $j = 0; $j < $b.numElements(); $j++) {
        |    org.apache.spark.sql.catalyst.util.ArrayData $cj = $b.getArray($j);
        |    double $s = 0.0;
        |    for (int $k = 0; $k < $subDim; $k++) {
        |      double $d = ((double) $a.getFloat($base + $k)) - ((double) $cj.getFloat($base + $k));
        |      $s += $d * $d;
        |    }
        |    long $dm = (long) java.lang.Math.floor($s * 1000000.0);
        |    if ($dm < $bestD) { $bestD = $dm; $bestJ = $j; }
        |  }
        |  $codes[$mi] = $bestJ;
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, codebook = r)
}

/** Column wrappers + SQL registration for the vector expressions. */
object VectorFunctions {
  private def floatArr(c: Column): Column = c.cast(ArrayType(FloatType))

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(floatArr(a)), ColumnBridge.expression(floatArr(b))))

  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(floatArr(a)), ColumnBridge.expression(floatArr(b))))

  def l2Norm(a: Column): Column =
    ColumnBridge.column(L2Norm(ColumnBridge.expression(floatArr(a))))

  /** Tag a column as holding the L2 norm of vector column `ofVec` (alias
    * metadata `graft.normOf`, persisted through parquet schema metadata),
    * so [[graft.plans.NormPrecomputeRewrite]] can rewrite cosine over
    * `ofVec` into the 1-FMA/element normalized-dot form. Use on the
    * l2Norm(...) projection at ingest time, or to re-tag a norm column
    * after its vector column was renamed. */
  def normTagged(c: Column, as: String, ofVec: String): Column =
    c.as(as, new org.apache.spark.sql.types.MetadataBuilder()
      .putString(graft.plans.NormPrecomputeRewrite.NormOfKey, ofVec).build())

  def signLshBuckets(vec: Column, hyperplanes: Column, tables: Int): Column =
    ColumnBridge.column(SignLshBuckets(
      ColumnBridge.expression(floatArr(vec)),
      ColumnBridge.expression(hyperplanes.cast(ArrayType(ArrayType(FloatType)))), tables))

  def pqEncode(vec: Column, codebook: Column, subDim: Int): Column =
    ColumnBridge.column(PqEncode(
      ColumnBridge.expression(floatArr(vec)),
      ColumnBridge.expression(codebook.cast(ArrayType(ArrayType(FloatType)))), subDim))

  /** Registers `cosine_sim`, `dot_product`, `l2_norm` for `spark.sql(...)`. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSimilarity(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("l2_norm", es => L2Norm(es.head), "built-in")
  }
}
