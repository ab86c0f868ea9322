package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("as-of join: latest preceding right row per left row, inclusive ties") {
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (1L, 4L, "l0"), (2L, 10L, "l3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 15L, 200.0), (1L, 20L, 300.0), (3L, 1L, 999.0))
      .toDF("k", "rts", "v")
    val out = AsOfJoin.join(left, right, "k", "ts", "rts", Seq("v"))
      .select(col("tag"), col("asof_v")).collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("l0").isEmpty)              // before any right row
    assert(out("l1").contains(100.0))      // 5 <= 10 < 15
    assert(out("l2").contains(300.0))      // ts == rts inclusive
    assert(out("l3").isEmpty)              // key with no right rows
  }

  test("as-of join: NULL payload in the latest right row is carried as NULL, not an older value") {
    val left = Seq((1L, 30L, "l")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 5L, Some(100.0), Some("a")),
      (1L, 20L, None, Some("b"))) // latest preceding row: v is NULL
      .toDF("k", "rts", "v", "w")
    val out = AsOfJoin.join(left, right, "k", "ts", "rts", Seq("v", "w")).head()
    // true as-of semantics (and DuckDB ASOF): ALL payload values come from
    // the single latest row — v stays NULL, w comes from the same row
    assert(out.isNullAt(out.fieldIndex("asof_v")))
    assert(out.getAs[String]("asof_w") == "b")
  }

  test("as-of join: left rows and columns all preserved") {
    val left = Seq((1L, 10L, "x")).toDF("k", "ts", "payload")
    val right = Seq((1L, 5L, 7.0)).toDF("k", "rts", "v")
    val out = AsOfJoin.join(left, right, "k", "ts", "rts", Seq("v"))
    assert(out.columns.toSet == Set("k", "ts", "payload", "asof_v"))
    assert(out.count() == 1)
  }
}
