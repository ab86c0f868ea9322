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

/** Squared-L2 distance from one `array<float>` vector to EVERY centroid of
  * an `array<array<double>>` codebook, in one codegen pass (round-14
  * optimization: the `transform(cents, c -> aggregate(zip_with(...)))`
  * higher-order form this replaces is CodegenFallback — interpreted lambda
  * dispatch per element, measured ~10× slower on the KMeans train path).
  *
  * Arithmetic is BIT-IDENTICAL to the replaced form and to the DuckDB
  * replays (ivLloydIterSql / pqIterSql): per centroid a left-fold
  * s := s + ((double)v[i] − c[i])² starting at 0.0 in index order —
  * the same IEEE op sequence as aggregate(zip_with(v, c, (x,y) →
  * (x−y)·(x−y)), 0.0, s+v). With `micro = true` each cell yields
  * (long) floor(s·10⁶) (the train-time metric); otherwise the raw double
  * (the serve/assign metric). Pinned against the HOF form in
  * VectorExprSpec. */
case class L2CellDistances(vec: Expression, cents: Expression, micro: Boolean)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = cents
  override def dataType: DataType =
    ArrayType(if (micro) LongType else DoubleType, containsNull = false)
  override def prettyName: String = if (micro) "l2_cell_micro" else "l2_cell_d2"

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, cents.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"${prettyName} expects (array<float>, array<array<double>>), got (${vec.dataType.sql}, ${cents.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val k = cb.numElements()
    val n = v.numElements()
    if (micro) {
      val out = new Array[Long](k)
      var j = 0
      while (j < k) {
        val cj = cb.getArray(j)
        var s = 0.0d; var i = 0
        while (i < n) { val d = v.getFloat(i).toDouble - cj.getDouble(i); s += d * d; i += 1 }
        out(j) = math.floor(s * 1000000.0).toLong
        j += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Double](k)
      var j = 0
      while (j < k) {
        val cj = cb.getArray(j)
        var s = 0.0d; var i = 0
        while (i < n) { val d = v.getFloat(i).toDouble - cj.getDouble(i); s += d * d; i += 1 }
        out(j) = s
        j += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val k = ctx.freshName("k"); val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val cj = ctx.freshName("cj"); val out = ctx.freshName("out")
      val elemType = if (micro) "long" else "double"
      val store =
        if (micro) s"$out[$j] = (long) java.lang.Math.floor($s * 1000000.0);"
        else s"$out[$j] = $s;"
      s"""
        |int $k = $b.numElements();
        |int $n = $a.numElements();
        |$elemType[] $out = new $elemType[$k];
        |for (int $j = 0; $j < $k; $j++) {
        |  org.apache.spark.sql.catalyst.util.ArrayData $cj = $b.getArray($j);
        |  double $s = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    double $d = ((double) $a.getFloat($i)) - $cj.getDouble($i);
        |    $s += $d * $d;
        |  }
        |  $store
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, cents = r)
}

/** max(|x|) over an `array<float>` vector with double accumulation — the
  * SQ8 scale denominator, replacing the interpreted
  * `array_max(transform(emb, abs))` pair (round-14). Exact same values:
  * |(double) f| per element, maximum in index order (no NaN/null elements
  * in embedding arrays by construction). */
case class MaxAbs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "max_abs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"max_abs expects array<float>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var m = 0.0d; var i = 0
    val n = x.numElements()
    while (i < n) {
      val v = math.abs(x.getFloat(i).toDouble); if (v > m) m = v; i += 1
    }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val m = ctx.freshName("m"); val v = ctx.freshName("v")
      s"""
        |int $n = $a.numElements();
        |double $m = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $v = java.lang.Math.abs((double) $a.getFloat($i));
        |  if ($v > $m) $m = $v;
        |}
        |${ev.value} = $m;
      """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SQ8 byte codes: floor((double)x · scale) per element, cast to byte with
  * long-truncation semantics — bit-identical to the replaced
  * `transform(emb, x -> floor(x·scale).cast("tinyint"))` chain (Spark's
  * floor(double) is a long; long→tinyint truncates low bits; values are in
  * [−127, 127] by the scale construction so the truncation is the
  * identity). Codegen replaces interpreted per-element lambda dispatch
  * (round-14). */
case class Sq8Code(vec: Expression, scale: Expression) extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = scale
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "sq8_code"

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, scale.dataType) match {
    case (ArrayType(FloatType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"sq8_code expects (array<float>, double), got (${vec.dataType.sql}, ${scale.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val sc = b.asInstanceOf[Double]
    val n = v.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = ((math.floor(v.getFloat(i).toDouble * sc).toLong) & 0xffL).toByte
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val out = ctx.freshName("out")
      s"""
        |int $n = $a.numElements();
        |byte[] $out = new byte[$n];
        |for (int $i = 0; $i < $n; $i++) {
        |  $out[$i] = (byte) ((long) java.lang.Math.floor(((double) $a.getFloat($i)) * $b));
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, scale = r)
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

  /** Distance vector to every centroid of a literal codebook — codegen
    * twin of `transform(typedlit(cents), c => d2(vec, c))` (KMeans). */
  def l2CellDistances(vec: Column, cents: Seq[Seq[Double]], micro: Boolean): Column = {
    import org.apache.spark.sql.functions.typedlit
    ColumnBridge.column(L2CellDistances(
      ColumnBridge.expression(floatArr(vec)),
      ColumnBridge.expression(typedlit(cents.map(_.toSeq))
        .cast(ArrayType(ArrayType(DoubleType)))), micro))
  }

  def maxAbs(a: Column): Column =
    ColumnBridge.column(MaxAbs(ColumnBridge.expression(floatArr(a))))

  def sq8Code(vec: Column, scale: Column): Column =
    ColumnBridge.column(Sq8Code(
      ColumnBridge.expression(floatArr(vec)),
      ColumnBridge.expression(scale.cast(DoubleType))))

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
