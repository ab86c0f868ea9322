package graft.model

import java.sql.Timestamp

/** Core record types of the engine (SURVEY §1.3), as Spark-encodable case
  * classes. */

/** One embedded text chunk — the fact-table row (embeddings v15 schema,
  * vector_store.cpp:67-141). */
final case class Chunk(
    id: Long,
    docId: String,
    sourceFile: String,
    chunkIdx: Int,
    pageNum: Int,
    textChunk: String,
    embedding: Array[Float],
    modelSig: String,
    modelDim: Int,
    headingPath: String,
    headingLevel: Int,
    chunkType: String,
    sentenceCount: Int,
    listType: String,
    listLength: Int,
    boostFactor: Float,
    createdAt: Timestamp)

/** A scored search hit (VectorEntry with query-time fields,
  * vector_store.h:13-35). */
final case class ScoredChunk(
    id: Long,
    docId: String,
    headingPath: String,
    chunkType: String,
    text: String,
    score: Double,
    semScore: Double, // raw cosine — the D11 exploration gate operates on this
    semanticRank: Int,
    keywordRank: Int,
    trustScore: Double,
    isExploration: Boolean)

/** One retrieval-log row (A6) — the reference's full retrieval_logs schema
  * (vector_store.cpp:90-101 create-table, :581-608 logRetrieval): one row
  * per search describing the top result, four latency stages, the MMR
  * penalty spent, and the stability score that regulated the ranking. */
final case class RetrievalLogRow(
    query: String,
    semanticRank: Int,
    keywordRank: Int,
    finalRank: Int,
    latencyEmbedMs: Double,
    latencySearchMs: Double,
    latencyFusionMs: Double,
    latencyRerankMs: Double,
    topScore: Double,
    mmrPenalty: Double,
    isExploration: Boolean,
    rankDelta: Int,
    stability: Double,
    createdAt: Timestamp)

/** Query intent classes (vector_store.h:70). */
sealed abstract class Intent(val name: String)
object Intent {
  case object General extends Intent("General")
  case object Definition extends Intent("Definition")
  case object Summary extends Intent("Summary")
  case object Procedure extends Intent("Procedure")
  case object Example extends Intent("Example")

  /** Regex cascade in the reference's check order (vector_store.cpp:239-246). */
  def detect(query: String): Intent = {
    val q = query.toLowerCase
    if (q.matches(".*(what is|define|meaning of|definition|theorem).*")) Definition
    else if (q.matches(".*(how to|steps|procedure|process).*")) Procedure
    else if (q.matches(".*(summary|summarize|overview).*")) Summary
    else if (q.matches(".*(example|case study|instance).*")) Example
    else General
  }

  /** Intent-weighted retrieval sizing (vector_store.cpp:306-319):
    * (semanticWeight, keywordWeight, overfetchFactor). */
  def weights(i: Intent): (Double, Double, Int) = i match {
    case Definition | Procedure => (0.35, 0.65, 3)
    case Summary                => (0.7, 0.3, 6)
    case _                      => (0.5, 0.5, 4)
  }

  /** Intent×chunk-type additive boost (vector_store.cpp:402-409). */
  def typeBoost(i: Intent, chunkType: String, headingLevel: Int): Double = {
    val base = (i, chunkType) match {
      case (Definition, "definition") => 0.5
      case (Summary, "summary")       => 0.5
      case (Procedure, "list")        => 0.3
      case (Example, "example")       => 0.4
      case _                          => 0.0
    }
    base + (if (i == Summary && headingLevel == 1) 0.2 else 0.0)
  }

  /** Stability multiplier (vector_store.cpp:443-446). */
  def stabilityMultiplier(i: Intent): Double = i match {
    case Definition => 2.0
    case Procedure  => 1.5
    case Summary    => 1.0
    case _          => 0.5
  }
}

/** Search configuration (SearchOptions, vector_store.h:82-91).
  *
  * The `ann*` fields are the Spark-scale extension beyond the reference
  * struct: the semantic branch's candidate source. "exact" keeps the
  * reference's full-corpus cosine scan (zero recall loss); "ivf" probes
  * `annProbes` nearest of `annCells` trained k-means cells, built at
  * index() time alongside the posting index — the 100 TB path where a
  * per-query full scan is no longer the plan you'd want. */
final case class SearchOptions(
    limit: Int = 5,
    semanticThreshold: Double = 0.95,
    deterministic: Boolean = true,
    experimentalMmr: Boolean = false,
    enableExploration: Boolean = false,
    useRerank: Boolean = false,
    annMode: String = "exact",
    annCells: Int = 16,
    // probe width for "ivf": ≥ 1 = fixed; 0 = AUTO — derived at index
    // build time from the measured cell-coverage ceiling of the trained
    // index (smallest nprobe whose sampled ground-truth coverage ≥ 0.9,
    // AnnIndex.chooseNprobe) and persisted with the workspace, so a
    // clustered corpus serves narrow probes and a near-uniform one is
    // never silently capped at a blind default's ceiling
    annProbes: Int = 2,
    // quantized phase-1 serving columns persisted with the IVF index:
    // "sq8" (int8 codes, 4× fewer scan bytes than float32) or "pq"
    // (4-bit residual-PQ codes + frozen codebook, 8× fewer than SQ8 —
    // the IVFADC tier); both re-rank survivors with the exact cosine
    annQuant: String = "sq8",
    // streaming self-compaction: once the live chunk version holds more
    // data files than this, the engine schedules a background rewrite
    // (appendChunks adds one file set per micro-batch — unbounded
    // accumulation degrades scan planning on a long-running stream)
    compactFileThreshold: Int = 64,
    // starvation guard: after this many CONSECUTIVE background-maintenance
    // attempts (ANN retrain / chunk compaction) lose their commit race to
    // inline rebuilds, the next loss runs the job inline under the
    // maintenance lock — a supersession storm can no longer discard
    // background work indefinitely
    maxMaintenanceDiscards: Int = 3,
    // delete hygiene: once the tombstone set outgrows this, deletes
    // schedule a background FULL compaction (purge + set reset) — a
    // delete-heavy workload otherwise grows the set, and with it every
    // read's anti-join build side, until someone calls compactIndexes()
    maxTombstones: Long = 100000L,
    // opt-in near-dup ingest admission: refuse a document whose MinHash
    // band buckets are all already occupied (first-in-wins) BEFORE
    // paying its embedding/indexing cost. Cross-batch state is a Bloom
    // bitmap over occupied buckets — O(batch) per micro-batch and tiny
    // to persist, at the price of a documented false-REJECT rate
    // (fpr ≈ (inserted·k/m)^k per bucket); the exact form is the
    // streaming nearDupStream state
    dedupIngest: Boolean = false,
    dedupBloomBits: Int = 1 << 22,
    // D19 benchmark mode (the reference's setBenchmarkingMode,
    // vector_store.cpp:576-579): freeze the D17 latency EMA at its
    // 100 ms seed — measured wall-clock never feeds back into the
    // policy, so the overfetch depth (and therefore the result set) is
    // machine-speed-INDEPENDENT. The pipeline itself is already
    // deterministic (D19); this removes the one coupling through which
    // a slow machine could change ranked output (EMA > 1500 ms caps the
    // next query's depth at 3×). Used by measurement/oracle paths.
    benchmarkMode: Boolean = false)
