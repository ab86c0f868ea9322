package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** Round-14 optimization pins: the codegen expressions that replaced
  * interpreted higher-order forms on the KMeans / SQ8 hot paths must be
  * BIT-IDENTICAL to the forms they replaced — same IEEE op order, same
  * floor/cast semantics — on representative and adversarial inputs
  * (micro-floor boundaries, zero vectors, negative coordinates). */
class VectorExprSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def vecsDf = {
    import spark.implicits._
    // deterministic pseudo-random floats incl. negatives, zeros, tiny and
    // large magnitudes — md5-free so the fixture is self-contained
    val rows = (0 until 257).map { i =>
      val v = Array.tabulate(16) { j =>
        val h = (i * 31 + j * 17) % 101
        if (h % 7 == 0) 0.0f
        else ((h - 50) / 13.0f) * (if (j % 3 == 0) 1e-3f else 1f)
      }
      (i.toLong, v)
    } :+ ((257L, Array.fill(16)(0.0f)))
    rows.toDF("id", "v")
  }

  private val cents: Seq[Seq[Double]] =
    Seq(
      Seq.tabulate(16)(j => (j - 8) / 7.0),
      Seq.tabulate(16)(_ => 0.0),
      Seq.tabulate(16)(j => math.sin(j.toDouble)),
      Seq.tabulate(16)(j => j * 1e-4))

  /** The replaced higher-order form of KMeans.d2 / distances. */
  private def hofDistances(vec: org.apache.spark.sql.Column, micro: Boolean) = {
    def d2(c: org.apache.spark.sql.Column) =
      aggregate(
        zip_with(vec, c, (x, y) =>
          (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (s, v) => s + v)
    if (micro) transform(typedlit(cents), c => floor(d2(c) * 1000000).cast("long"))
    else transform(typedlit(cents), c => d2(c))
  }

  test("l2CellDistances(micro=false) == interpreted transform/aggregate form") {
    val df = vecsDf
      .withColumn("fast", VectorFunctions.l2CellDistances(col("v"), cents, micro = false))
      .withColumn("slow", hofDistances(col("v"), micro = false))
    // exact double equality, elementwise (same IEEE op order)
    assert(df.filter(not(col("fast") === col("slow"))).count() == 0)
  }

  test("l2CellDistances(micro=true) == interpreted micro-floored form") {
    val df = vecsDf
      .withColumn("fast", VectorFunctions.l2CellDistances(col("v"), cents, micro = true))
      .withColumn("slow", hofDistances(col("v"), micro = true))
    assert(df.filter(not(col("fast") === col("slow"))).count() == 0)
  }

  test("maxAbs / sq8Code / l2Norm == the replaced SQ8 quantization chain") {
    val emb = col("v").cast("array<double>")
    val slowScale = lit(127.0) / greatest(array_max(transform(emb, x => abs(x))), lit(1e-12))
    val df = vecsDf
      .withColumn("fast_scale", lit(127.0) / greatest(VectorFunctions.maxAbs(col("v")), lit(1e-12)))
      .withColumn("slow_scale", slowScale)
      .withColumn("fast_code", VectorFunctions.sq8Code(col("v"), col("fast_scale")))
      .withColumn("slow_code", transform(emb, x => floor(x * slowScale).cast("tinyint")))
      .withColumn("fast_norm", VectorFunctions.l2Norm(col("v")))
      .withColumn("slow_norm",
        sqrt(aggregate(zip_with(emb, emb, (a, b) => a * b), lit(0.0), (s, v) => s + v)))
    assert(df.filter(not(col("fast_scale") === col("slow_scale"))).count() == 0)
    assert(df.filter(not(col("fast_code").cast("array<int>") ===
      col("slow_code").cast("array<int>"))).count() == 0)
    assert(df.filter(not(col("fast_norm") === col("slow_norm"))).count() == 0)
  }

  test("fanout: spreads a 1-partition frame, identity on an already-parallel one") {
    import spark.implicits._
    val one = spark.range(0, 1000, 1, 1).toDF("x")
    val fanned = graft.functions.F.fanout(one)
    assert(fanned.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // same multiset of rows
    assert(fanned.agg(sum("x")).head.getLong(0) == one.agg(sum("x")).head.getLong(0))
    assert(fanned.count() == 1000)
    val wide = spark.range(0, 1000, 1, 16).toDF("x")
    assert(graft.functions.F.fanout(wide) eq wide)
  }
}
