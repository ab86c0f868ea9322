package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

import graft.embed.{HashNgramEmbedder, ModelDiscovery}
import graft.model.{ScoredChunk, SearchOptions}
import graft.post.{DeepDive, ExtractiveSummaryModel, LexicalOverlapModel, Reranker, Summarizer, Calibration}
import graft.search.{HybridEngine, LatencyPolicy}
import graft.store.{ChunkStore, TokenIndex, Workspace}

/** Specs for workspace/store ops (A4–A8, D20/D21), reranker (E1–E3),
  * latency policy (D17), model discovery (A9), summarizer (C4), deep dive
  * (E8). */
class StoreAndPostSpec extends AnyFunSuite {

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

  private def freshWorkspace(): Workspace = {
    val root = Files.createTempDirectory("graft-ws-").toString
    new Workspace(spark, s"$root/main")
  }

  test("docKey (Scala) and docKeyCol (Column) agree for every doc-id shape") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ids = Seq("0", "42", "999999999999999999",      // numeric, 18 digits max
      "9999999999999999999", "12345678901234567890123", // overlong → hashed
      "-3", "+5", "3.7", "abc", "a-1", "")              // non-decimal → hashed
    val fromCol = ids.toDF("doc_id")
      .select(col("doc_id"), ChunkStore.docKeyCol(col("doc_id")).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(fromCol(id) == ChunkStore.docKey(id),
        s"docKey mismatch for '$id': col=${fromCol(id)} scala=${ChunkStore.docKey(id)}")
    }
    assert(ChunkStore.docKey("42") == 42L) // numeric ids keep their value
  }

  test("workspace: write registers dim, guardrail rejects mismatched batch") {
    val ws = freshWorkspace()
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(20)
    val chunks = ChunkStore.buildChunks(docs, embedder)
    ws.writeChunks(chunks)
    assert(ws.registeredDim.contains(64))
    assert(ws.count() == chunks.count())
    // second write with different dim must be rejected (C3)
    val wrong = ChunkStore.buildChunks(docs, HashNgramEmbedder(dim = 32))
    val e = intercept[IllegalArgumentException](ws.writeChunks(wrong))
    assert(e.getMessage.contains("guardrail"))
  }

  test("workspace: appendChunks with zero rows is a no-op (empty first micro-batch must not kill the stream)") {
    val ws = freshWorkspace()
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(20)
    val chunks = ChunkStore.buildChunks(docs, embedder)
    // empty append into a FRESH workspace: no dim registration off head(),
    // no exception, nothing written
    ws.appendChunks(chunks.filter(org.apache.spark.sql.functions.lit(false)))
    assert(ws.registeredDim.isEmpty)
    // the real first batch then registers normally
    ws.appendChunks(chunks)
    assert(ws.registeredDim.contains(64))
    assert(ws.count() == chunks.count())
    // and an empty append onto a populated workspace stays a no-op
    ws.appendChunks(chunks.filter(org.apache.spark.sql.functions.lit(false)))
    assert(ws.count() == chunks.count())
  }

  test("workspace: index writes are versioned — the previous version survives one rebuild cycle") {
    import java.nio.file.{Files, Paths}
    val ws = freshWorkspace()
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(20)
    ws.writeChunks(ChunkStore.buildChunks(docs, embedder))
    def postings = TokenIndex.build(
      ws.readChunks().select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("text_chunk").as("t")), "id", "t")
    ws.writePostings(postings)
    val v1 = ws.postingsPath
    val readerOnV1 = ws.readPostings() // an in-flight reader's plan
    ws.writePostings(postings) // v2: pointer moves, v1 must SURVIVE
    assert(ws.postingsPath != v1)
    assert(Files.exists(Paths.get(v1)), "previous version deleted under an in-flight reader")
    assert(readerOnV1.count() > 0, "in-flight reader broken by the rebuild")
    ws.writePostings(postings) // v3: v1 still inside the 2-cycle retention
    assert(Files.exists(Paths.get(v1)), "v(n-2) reclaimed before its retention window")
    ws.writePostings(postings) // v4: now v1 is out of the grace window
    assert(!Files.exists(Paths.get(v1)),
      s"v(n-${graft.store.Workspace.RetainPriorVersions + 1}) should be reclaimed")
    assert(ws.readPostings().count() > 0)
  }

  test("workspace: metadata KV roundtrip + clear drops dim registration (D21)") {
    val ws = freshWorkspace()
    ws.setMeta("engine", "ollama")
    ws.setMeta("calib", "0.5,0.2")
    assert(ws.getMeta("engine").contains("ollama"))
    assert(ws.getMeta("calib").contains("0.5,0.2"))
    ws.setMeta("engine", "lmstudio") // overwrite
    assert(ws.getMeta("engine").contains("lmstudio"))
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(5)
    ws.writeChunks(ChunkStore.buildChunks(docs, embedder))
    assert(ws.registeredDim.contains(64))
    ws.clear()
    assert(ws.registeredDim.isEmpty)
    assert(ws.getMeta("engine").contains("lmstudio")) // other keys survive
  }

  test("workspace: csv + matrix export, discovery (A4/A5/A8)") {
    val root = Files.createTempDirectory("graft-app-").toString
    val ws = Workspace.open(spark, root, "wsA")
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(10)
    ws.writeChunks(ChunkStore.buildChunks(docs, embedder))
    val csvPath = s"$root/export.csv"
    ws.exportCsv(csvPath)
    val csv = spark.read.option("header", "true").csv(csvPath)
    assert(csv.columns.toSeq == Seq("id", "source_file", "text_chunk"))
    assert(csv.count() == ws.count())
    val matPath = s"$root/matrix"
    ws.exportMatrix(matPath)
    val mat = spark.read.parquet(matPath)
    assert(mat.columns.toSeq == Seq("id", "text_chunk", "embedding"))
    val jlPath = s"$root/jsonl"
    ws.exportJsonl(jlPath)
    val jl = spark.read.json(jlPath)
    assert(jl.count() == ws.count())
    assert(Seq("id", "doc_id", "source", "heading_path", "text")
      .forall(jl.columns.contains), jl.columns.mkString(","))
    // one output file, rows id-ordered within it (the deterministic
    // single-file handoff layout)
    val lines = java.nio.file.Files.list(java.nio.file.Paths.get(jlPath))
      .iterator().asScala.map(_.toString)
      .filter(f => f.endsWith(".json")).toList
    assert(lines.size == 1, s"expected one part file: $lines")
    val ids = scala.io.Source.fromFile(lines.head).getLines()
      .map(l => "\"id\":(\\d+)".r.findFirstMatchIn(l).get.group(1).toLong).toSeq
    assert(ids == ids.sorted, "rows not id-ordered within the export file")
    assert(Workspace.discover(spark, root) == Seq("wsA"))
  }

  test("reranker: caps batch at 10, truncates text, reorders by calibrated score") {
    val cands = (1 to 12).map { i =>
      ScoredChunk(i.toLong, s"d$i", null, "text", if (i == 5) "merge window hash" else s"noise only $i",
        1.0 - i * 0.01, 0.9, i, 0, 1.0, isExploration = false)
    }
    val res = Reranker.rerank("merge window hash", cands, 5, LexicalOverlapModel(), Calibration.initial)
    assert(!res.modelFrozen)
    assert(res.reranked.head.id == 5) // overlap winner promoted
    assert(res.reranked.size == 5)
  }

  test("reranker: frozen model leaves order unchanged and stats untouched") {
    object FrozenModel extends graft.post.RerankModel {
      override def score(q: String, t: Seq[String]): Seq[Double] = t.map(_ => 0.5)
    }
    val cands = (1 to 5).map(i =>
      ScoredChunk(i.toLong, s"d$i", null, "text", s"text $i", 1.0 - i * 0.1, 0.9, i, 0, 1.0, isExploration = false))
    val res = Reranker.rerank("q", cands, 3, FrozenModel, Calibration.initial)
    assert(res.modelFrozen)
    assert(res.reranked.map(_.id) == Seq(1L, 2L, 3L))
    assert(res.stats == Calibration.initial)
  }

  test("latency policy: EMA seed 100, thresholds drive degradation (D17)") {
    val p = new LatencyPolicy()
    assert(p.emaMs == 100.0)
    assert(p.decide(isSummaryIntent = false) == p.Normal)
    p.record(5000.0) // ema = 0.8*100 + 0.2*5000 = 1080
    assert(math.abs(p.emaMs - 1080.0) < 1e-9)
    assert(p.decide(isSummaryIntent = false) == p.Normal)
    (1 to 5).foreach(_ => p.record(8000.0))
    assert(p.emaMs > 4000.0)
    assert(p.decide(isSummaryIntent = false) == p.KeywordOnly)
    assert(p.decide(isSummaryIntent = true) == p.Degraded) // Summary never bypasses vectors
    assert(p.depthFactor(6) == 3)
  }

  test("model discovery: capability inference from names (A9)") {
    import ModelDiscovery._
    assert(inferCapabilities("nomic-embed-text") == Set(Embedding))
    assert(inferCapabilities("bge-reranker-large") == Set(Rerank))
    assert(inferCapabilities("llama3:8b-instruct") == Set(Chat, Summary, Rerank))
    val models = classify(Seq(
      ("nomic-embed-text", "ollama"), ("llama3", "ollama"), ("gpt-x", "lmstudio")))
    assert(pick(models, Embedding).map(_.name).contains("nomic-embed-text"))
    assert(pick(models, Chat).map(_.name).contains("llama3")) // provider order
  }

  test("summarizer: extractive summaries become summary-typed level-1 rows (C4)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(20)
    val chunks = ChunkStore.buildChunks(docs, embedder)
    val rows = Summarizer.summaryRows(chunks, ExtractiveSummaryModel(), embedder)
    assert(rows.count() > 0)
    val r = rows.head()
    assert(r.getAs[String]("chunk_type") == "summary")
    assert(r.getAs[Int]("heading_level") == 1)
    assert(r.getAs[scala.collection.Seq[Float]]("embedding").size == 64)
  }

  test("deep dive: claims cite valid sources with confidence from scores (E8)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val chunks = ChunkStore.buildChunks(docs, embedder).cache()
    val engine = new HybridEngine(spark, chunks)
    val claims = DeepDive.run(engine, "what is a merge window", embedder)
    assert(claims.nonEmpty)
    claims.foreach { c =>
      assert(c.sources.forall(i => i >= 0 && i < 5))
      assert(c.confidence > 0.0)
      assert(c.statement.nonEmpty)
    }
  }

  test("hybrid engine with rerank: returns k results, audit populated (E1/G4)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val chunks = ChunkStore.buildChunks(docs, embedder).cache()
    val engine = new HybridEngine(spark, chunks, SearchOptions(useRerank = true))
    val out = engine.search("merge window hash partition", embedder, 5)
    assert(out.size == 5)
    assert(engine.lastAudit.execMs > 0)
  }
}
