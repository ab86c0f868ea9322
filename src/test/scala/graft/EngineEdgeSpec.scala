package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.embed.HashNgramEmbedder
import graft.ingest.{CloudOcrExtractor, PdfSource}
import graft.model.SearchOptions
import graft.search.HybridEngine
import graft.store.ChunkStore

/** Edge cases of the search engine + the cloud-OCR extractor path. */
class EngineEdgeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val embedder = HashNgramEmbedder(dim = 64)

  private lazy val chunks = ChunkStore.buildChunks(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50), embedder).cache()

  test("search with no alphanumeric tokens still returns semantic results") {
    val engine = new HybridEngine(spark, chunks)
    val out = engine.search("!!! ??? ***", embedder, 5)
    assert(out.size == 5) // keyword branch empty; semantic branch carries
  }

  test("k larger than corpus returns all chunks, ranked") {
    val tiny = ChunkStore.buildChunks(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(3), embedder).cache()
    val engine = new HybridEngine(spark, tiny)
    val out = engine.search("merge window", embedder, 50)
    assert(out.nonEmpty && out.size <= 50)
    assert(out.map(_.score) == out.map(_.score).sorted.reverse)
  }

  test("empty query string: embeds to zero vector, still deterministic") {
    val engine = new HybridEngine(spark, chunks)
    val a = engine.search("", embedder, 5)
    val b = engine.search("", embedder, 5)
    assert(a.map(_.id) == b.map(_.id))
  }

  test("cloud OCR extractor: payload -> transport -> layout pipeline (A2)") {
    val fakeOcr: Array[Byte] => String = bytes =>
      s"Chapter 1 Scanned\n\nRecovered text of ${bytes.length} bytes from the scan."
    val dir = java.nio.file.Files.createTempDirectory("graft-ocr-")
    java.nio.file.Files.write(dir.resolve("scan.bin"), Array.fill[Byte](64)(7))
    val chunksDf = PdfSource.extractChunks(spark, dir.toString, "*.bin", CloudOcrExtractor(fakeOcr))
    val rows = chunksDf.collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[String]("text_chunk").contains("Recovered text of 64 bytes")))
    assert(rows.forall(_.getAs[String]("heading_path") == "Chapter 1 Scanned"))
  }

  test("exploration injection fires end-to-end for a stable query with similar below-cutoff chunks") {
    import spark.implicits._
    // corpus: many near-duplicates of the query → below-cutoff candidates
    // with raw cosine > 0.65; fresh chunks have trust ≤ 1.0 (never clicked)
    val docs = (0 until 30).map { i =>
      (i.toLong, s"merge window hash partition variant $i", "en", s"src$i", 40L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val chunks = ChunkStore.buildChunks(docs, embedder).cache()
    val engine = new HybridEngine(spark, chunks,
      SearchOptions(enableExploration = true))
    // fresh query: stability = 1.0 ≥ 0.6, General intent → gate open
    val out = engine.search("merge window hash partition", embedder, 5)
    assert(out.size == 5)
    assert(out(1).isExploration, s"expected probe at rank 2: $out")
    assert(out(1).score == out.head.score * 0.95)
    assert(out.map(_.id).distinct.size == 5) // no duplicates
  }

  test("rerank disabled vs enabled: same candidate set, possibly different order") {
    val plain = new HybridEngine(spark, chunks, SearchOptions())
    val rr = new HybridEngine(spark, chunks, SearchOptions(useRerank = true))
    val q = "merge window hash partition"
    val a = plain.search(q, embedder, 5).map(_.id).toSet
    val b = rr.search(q, embedder, 5).map(_.id).toSet
    assert(a == b) // rerank reorders within the batch, never changes membership at k<=batch
  }
}
