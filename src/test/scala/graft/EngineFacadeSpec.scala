package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Engine
import graft.post.Calibration

/** End-to-end facade spec: a reference user's full session — index, search,
  * click, re-search, context, deep dive, calibration persistence. */
class EngineFacadeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("full session: index → search → click boost → context → deep dive") {
    val root = Files.createTempDirectory("graft-e2e-").toString
    val engine = Engine.open(spark, root, "main")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)

    val n = engine.index(docs)
    assert(n >= 100)

    val hits = engine.search("what is a merge window")
    assert(hits.size == 5)
    assert(hits.head.chunkType == "definition") // intent boost applied

    // click the top hit; its boost must lift its trust on the rebuilt engine
    engine.recordClick(hits.head.id, "what is a merge window")
    val again = engine.search("what is a merge window")
    assert(again.size == 5)
    val clicked = again.find(_.id == hits.head.id)
    assert(clicked.exists(_.trustScore > hits.head.trustScore))

    val ctx = engine.context(hits.head.id, 1)
    assert(ctx.count() >= 1)

    val claims = engine.deepDive("what is a merge window")
    assert(claims.nonEmpty)

    assert(engine.latencyEmaMs > 0)
  }

  test("summarizeSections writes summary chunks back into the store (C4)") {
    val root = Files.createTempDirectory("graft-sum-").toString
    val engine = Engine.open(spark, root, "main")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    val before = engine.index(docs)
    // baseline: the synthetic corpus already carries some summary-typed chunks
    val preExisting = engine.workspace.readChunks()
      .filter(org.apache.spark.sql.functions.col("chunk_type") === "summary").count()
    val added = engine.summarizeSections()
    assert(added > 0)
    val after = engine.workspace.count()
    assert(after == before + added)
    val summaries = engine.workspace.readChunks()
      .filter(org.apache.spark.sql.functions.col("chunk_type") === "summary")
    assert(summaries.count() == preExisting + added)
    assert(engine.search("summary of the merge window").nonEmpty)
  }

  test("calibration persistence roundtrip (E4)") {
    val root = Files.createTempDirectory("graft-cal-").toString
    val engine = Engine.open(spark, root, "ws")
    assert(engine.loadCalibration("model-x") == Calibration.initial)
    val stats = Calibration.Stats(0.42, 0.13, 7)
    engine.saveCalibration("model-x", stats)
    assert(engine.loadCalibration("model-x") == stats)
    // reopening the workspace sees the persisted stats
    val engine2 = Engine.open(spark, root, "ws")
    assert(engine2.loadCalibration("model-x") == stats)
  }
}
