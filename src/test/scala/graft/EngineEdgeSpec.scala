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
    .config("spark.sql.extensions", "graft.GraftExtensions")
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

  test("D15 semantic cache: 0.951-cosine paraphrase hits, 0.949 misses; a hit serves the CACHED ranking") {
    import graft.search.QueryCache
    // --- threshold straddle (vector_store.cpp:292-300): cached entry
    // e1 = (1,0,0,0); probe u(c) = (c, sqrt(1-c²), 0, 0) has cosine
    // exactly c with e1 up to float32 rounding (~6e-8, three orders of
    // magnitude inside the 1e-3 margins either side of 0.95).
    def unit(c: Double): Array[Float] = {
      val v = new Array[Float](4)
      v(0) = c.toFloat
      v(1) = math.sqrt(1.0 - c * c).toFloat
      v
    }
    val cache = new QueryCache[String](capacity = 10, semanticThreshold = 0.95)
    cache.put("anchor query", unit(1.0), "ranking_v1")
    assert(cache.getSemantic(unit(0.951)).contains("ranking_v1"),
      "0.951-cosine paraphrase must be a semantic hit")
    assert(cache.getSemantic(unit(0.949)).isEmpty,
      "0.949-cosine paraphrase must miss (threshold is strict >0.95)")
    // --- a hit returns the result captured at put() time even when the
    // backing corpus answers differently NOW (the cache stores rankings,
    // not providers — exactly the reference's in-process result vectors)
    cache.put("anchor query", unit(1.0), "ranking_v2_after_corpus_change")
    assert(cache.getSemantic(unit(0.951)).contains("ranking_v2_after_corpus_change"))

    // --- engine-level distinguishing test: a paraphrase whose FRESH
    // search result differs must still return the cached ranking when it
    // semantically hits. Stub embedder: two queries share a >0.95-cosine
    // embedding but carry different keyword tokens, so a recompute would
    // fuse different keyword ranks — if search(q2) equals search(q1)'s
    // output verbatim, it can only have come from the cache.
    import spark.implicits._
    val docs = (0 until 20).map { i =>
      val tok = if (i % 2 == 0) "alpha" else "beta"
      (i.toLong, s"$tok corpus document number $i about partitions", "en", s"s$i", 40L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val base = embedder
    val stub = new graft.embed.Embedder {
      val dim = 64
      val modelSig = "stub-paraphrase"
      // v1 and v2: unit-ish vectors at cosine ≈ 0.96 in the (0,1) plane,
      // constant across calls; all other texts take the real embedder
      private def planar(c: Double): Array[Float] = {
        val v = new Array[Float](64)
        v(0) = c.toFloat; v(1) = math.sqrt(1.0 - c * c).toFloat
        v
      }
      def embed(text: String): Array[Float] = text match {
        case "alpha partitions"  => planar(1.0)
        case "beta partitions"   => planar(0.96)
        case other               => base.embed(other)
      }
    }
    val corpus = ChunkStore.buildChunks(docs, stub).cache()
    // deterministic=false enables the cache (D19: benchmarks bypass it)
    val cached = new HybridEngine(spark, corpus, SearchOptions(deterministic = false))
    val r1 = cached.search("alpha partitions", stub, 5)
    val r2 = cached.search("beta partitions", stub, 5)
    assert(r2.map(c => (c.id, c.score)) == r1.map(c => (c.id, c.score)),
      "semantic hit must serve the CACHED ranking verbatim")
    // a cache-free engine recomputes: different keyword tokens → different fusion
    val fresh = new HybridEngine(spark, corpus, SearchOptions(deterministic = true))
    val r2fresh = fresh.search("beta partitions", stub, 5)
    assert(r2fresh.map(c => (c.id, c.score)) != r1.map(c => (c.id, c.score)),
      "distinguisher broken: a fresh recompute of q2 must differ from q1's ranking")
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
