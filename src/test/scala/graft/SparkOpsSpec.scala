package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.embed.HashNgramEmbedder
import graft.feedback.BoostLedger
import graft.functions.VectorFunctions
import graft.model.SearchOptions
import graft.search.HybridEngine
import graft.store.ChunkStore

/** Spark-level specs: the Catalyst vector expressions (interpreted and
  * codegen paths), the hybrid engine end-to-end, the boost ledger, and a
  * smoke pass over every registered query at sf0.001. */
class SparkOpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val embedder = HashNgramEmbedder(dim = 64)

  test("cosine_sim expression: hand-computed values, both execution paths") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // identical → 1
      (2L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // orthogonal → 0
      (3L, Array(1.0f, 1.0f), Array(-1.0f, -1.0f)), // opposite → -1
      (4L, Array(1.0f, 1.0f), Array(1.0f)),         // dim mismatch → 0
      (5L, Array.empty[Float], Array.empty[Float]), // empty → 0
      (6L, Array(0.0f, 0.0f), Array(1.0f, 1.0f))    // zero norm → 0
    ).toDF("id", "a", "b")
    val expected = Map(1L -> 1.0, 2L -> 0.0, 3L -> -1.0, 4L -> 0.0, 5L -> 0.0, 6L -> 0.0)
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      val got = df.select($"id", VectorFunctions.cosineSim($"a", $"b").as("c"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      expected.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-12, s"id=$k mode=$codegen") }
    }
    spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("cosine_sim: null input → null result") {
    import spark.implicits._
    val df = Seq((1L, Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("id", "a", "b")
    val r = df.select(VectorFunctions.cosineSim($"a", $"b")).collect()
    assert(r.head.isNullAt(0))
  }

  test("dot_product and l2_norm: hand-computed") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dotProduct($"a", $"b"),
      VectorFunctions.l2Norm($"a")).collect().head
    assert(math.abs(r.getDouble(0) - 32.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
  }

  test("SQL registration: cosine_sim usable from spark.sql") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(cast(1.0 as float), cast(0.0 as float)), array(cast(1.0 as float), cast(0.0 as float))) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("chunk store: ingest pipeline produces valid chunk table + dim guardrail") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val chunks = ChunkStore.buildChunks(docs, embedder).cache()
    assert(chunks.count() >= docs.count()) // ≥1 chunk per doc
    assert(ChunkStore.checkDim(chunks, 64) == 0)
    assert(ChunkStore.checkDim(chunks, 128) > 0)
    // ids unique; chunk_idx starts at 0 per doc
    assert(chunks.select("id").distinct().count() == chunks.count())
    assert(chunks.groupBy("doc_id").agg(min("chunk_idx").as("m"))
      .filter(col("m") =!= 0).count() == 0)
  }

  test("hybrid engine: returns k intent-boosted results; cache works when enabled") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val chunks = ChunkStore.buildChunks(docs, embedder).cache()
    val engine = new HybridEngine(spark, chunks,
      SearchOptions(deterministic = false)) // cache on
    val r1 = engine.search("what is a merge window", embedder, 5)
    assert(r1.size == 5)
    // Definition intent boosts definition chunks to the top
    assert(r1.head.chunkType == "definition")
    // exact cache: second identical query returns the same object
    val r2 = engine.search("  WHAT IS A MERGE WINDOW ", embedder, 5)
    assert(r1 == r2)
  }

  test("hybrid engine: stability grows with consistent repeated queries") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val chunks = ChunkStore.buildChunks(docs, embedder).cache()
    val engine = new HybridEngine(spark, chunks, SearchOptions())
    val q = "example of a vector batch"
    // no history => fully stable (reference: AVG over empty log is NULL->0)
    assert(engine.stability(q) == 1.0)
    engine.search(q, embedder, 5)
    val s1 = engine.stability(q)
    assert(s1 >= 0.0 && s1 <= 1.0)
  }

  test("boost ledger: exploration clicks quarantined, boosts compound") {
    val ledger = BoostLedger.append(BoostLedger.emptyLedger(spark), Seq(
      BoostLedger.Click(10, "q", isExploration = false),
      BoostLedger.Click(10, "q", isExploration = false),
      BoostLedger.Click(20, "q", isExploration = true)))
    val boosts = BoostLedger.effectiveBoosts(ledger).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(boosts(10L) - 1.2) < 1e-9)
    assert(!boosts.contains(20L)) // quarantined
  }

  test("smoke: every registered query runs at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, name)
    }
  }

  test("entry: flagship pipeline returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle map: every oracle key has a query; column names match plan output") {
    SparkEntry.oracleSql.keys.foreach(k => assert(SparkEntry.queries.contains(k), k))
  }

  test("registry: query names are unique (a duplicate would silently shadow in the map)") {
    val names = SparkEntry.registryNames
    val dups = names.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(names.length == SparkEntry.queries.size)
  }
}
