package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.embed.Embedder
import graft.feedback.BoostLedger
import graft.model.SearchOptions
import graft.queries.RetrievalQueries
import graft.search.HybridEngine

/** Round-4 "What's missing #2": the fused scoring path inside
  * HybridEngine.search (RRF + semantic-gated type boost + stability bias +
  * trust, vector_store.cpp:390-458) had no end-to-end gate — only its
  * parts did. hybrid_search_fused now carries the exact DuckDB oracle;
  * THIS spec closes the other half: the live engine (MMR / exploration /
  * rerank off) must return the same ids in the same order as the
  * registered query over the same corpus, ledger, and log-derived
  * stability — composition proven, not just parts. */
class HybridEngineFusedSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("HybridEngine.search returns the registered fused query's ids in order") {
    val dir = "/root/testdata/sf0.001"

    // the chunk table the engine searches: the SAME corpus the registered
    // query scores (id, embedding, text), with the d8 chunk_type
    // derivation and the seeded click ledger applied as boost_factor
    val ctype = col("id") % 5
    val base = RetrievalQueries.fusedCorpus(spark, dir).select(
      col("id"),
      col("id").cast("string").as("doc_id"),
      lit(0).as("chunk_idx"),
      col("text").as("text_chunk"),
      col("embedding"),
      lit(null).cast("string").as("heading_path"),
      lit(0).as("heading_level"),
      when(ctype === 0, "text").when(ctype === 1, "definition").when(ctype === 2, "list")
        .when(ctype === 3, "example").otherwise("summary").as("chunk_type"),
      current_timestamp().as("created_at"))
    val ledger = BoostLedger.append(BoostLedger.emptyLedger(spark),
      RetrievalQueries.fusedClicks.map { case (id, ex) => BoostLedger.Click(id, "q", ex) })
    val chunks = BoostLedger.withBoost(base, ledger, "id")

    // the embedder pins the query vector to the corpus's vec_id=0 row —
    // exactly the query vector the registered query scores against
    val qv0 = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val fixedEmbedder = new Embedder {
      override def dim: Int = qv0.length
      override def modelSig: String = "fixed-qv0"
      override def embed(text: String): Array[Float] = qv0
    }

    // stability base = the registered query's seeded-log aggregate
    val stabBase = RetrievalQueries.fusedStabilityBase(spark, dir)

    val engine = new HybridEngine(spark, chunks,
      opts = SearchOptions(), // deterministic; MMR/exploration/rerank off
      stabilityLookup = _ => stabBase)

    // k=20 → Definition overfetch 3 → candidate depth 60 = fusedDepth
    val got = engine.search(RetrievalQueries.fusedQueryText, fixedEmbedder, k = 20)
    val gotIds = got.map(_.id)

    val want = SparkEntry.queries("hybrid_search_fused")(spark, dir)
      .select("id").collect().map(_.getLong(0)).toSeq

    assert(gotIds == want,
      s"fused engine path diverges from the oracled query:\n engine: $gotIds\n query:  $want")

    // the gated boost actually fired: Definition intent must surface
    // definition-typed chunks at the top (id % 5 == 1)
    assert(got.take(5).forall(_.chunkType == "definition"),
      s"definition boost not applied: ${got.take(5).map(c => (c.id, c.chunkType))}")
  }
}
