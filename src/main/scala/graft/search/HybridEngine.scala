package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.embed.Embedder
import graft.functions.F
import graft.model.{Intent, RetrievalLogRow, ScoredChunk, SearchOptions}
import graft.post.{Calibration, LexicalOverlapModel, Reranker, RerankModel}
import graft.store.TokenIndex

/** The hybrid search orchestrator (SURVEY §3.2): the engine's "SELECT".
  *
  * Distributed part (everything until ~depth·2 rows): two independent DAG
  * branches over the chunk table — semantic (cosine vs broadcast query
  * vector, TakeOrderedAndProject) and keyword (token-overlap score) — fused
  * by weighted RRF (K=60) with intent-dependent weights and chunk-type
  * boosts, trust/recency scoring, and stability bias from the retrieval log.
  *
  * Driver part (≤ ~30 rows, exactly where the reference collapses to
  * in-memory vectors): MMR diversification, exploration injection, caching,
  * retrieval logging.
  */
final class HybridEngine(
    spark: SparkSession,
    chunks: DataFrame,
    opts: SearchOptions = SearchOptions(),
    rerankModel: RerankModel = LexicalOverlapModel(),
    postings: Option[DataFrame] = None,
    initialLog: Vector[RetrievalLogRow] = Vector.empty,
    initialCalib: Calibration.Stats = Calibration.initial,
    stabilityLookup: String => (Double, Long) = _ => (0.0, 0L),
    semanticGen: Option[CandidateGenerator] = None) {

  import spark.implicits._

  /** The semantic branch's candidate source: exact full scan by default
    * (reference semantics), or an injected ANN probe (IVF cells) — the
    * scale seam. Everything downstream (rank, fusion, boosts) is
    * generator-agnostic. */
  private val semGen: CandidateGenerator =
    semanticGen.getOrElse(new ExactScanGenerator(chunks))

  /** Which candidate source this engine searches with (specs/logs). */
  def semanticMode: String = semGen.mode

  private val cache = new QueryCache[Seq[ScoredChunk]](
    capacity = 100, semanticThreshold = opts.semanticThreshold,
    enabled = !opts.deterministic)

  /** Retrieval log (SURVEY §2 A6/D9): append-only rows pending flush to the
    * workspace parquet log table; full reference schema (one row per
    * search, vector_store.cpp:566-571). */
  private var logRows = initialLog
  private var searchCount = 0L
  private var entropyEma: Option[Double] = None
  private var calibStats = initialCalib

  /** Snapshots for carrying state across engine rebuilds (the facade
    * persists these — the analog of the reference's retrieval_logs +
    * calibration rows). */
  def logSnapshot: Vector[RetrievalLogRow] = synchronized(logRows)
  def calibSnapshot: Calibration.Stats = synchronized(calibStats)

  /** Remove and return the pending log rows (the facade appends them to
    * the persisted parquet log; stability then reads them back via
    * [[stabilityBase]] on the next engine build). */
  def drainLog(): Vector[RetrievalLogRow] = synchronized {
    val r = logRows
    logRows = Vector.empty
    r
  }

  /** Per-stage latency audit of the last search (SURVEY §2 G4,
    * SearchAudit vector_store.h:72-80). */
  final case class SearchAudit(embedMs: Double, planMs: Double, execMs: Double)
  @volatile var lastAudit: SearchAudit = SearchAudit(0, 0, 0)

  /** Rank-stability for a query from its history: 1 − avg|Δrank|/5, clamped
    * to [0,1], exploration rows excluded. History = the persisted log's
    * per-query aggregate (`stabilityLookup` — a partition-pruned lookup
    * over the parquet log table, the way the reference queries its own
    * retrieval_logs, vector_store.cpp:430-439) plus this session's pending
    * rows. A query with NO history is fully stable (1.0). */
  def stability(query: String): Double = {
    val canon = cache.canonical(query)
    val (baseSum, baseN) = stabilityLookup(canon)
    val session = logRows.filter(r => r.query == canon && !r.isExploration)
    val n = baseN + session.size
    if (n == 0) 1.0
    else {
      val sumAbs = baseSum + session.map(r => math.abs(r.rankDelta)).sum
      math.max(0.0, math.min(1.0, 1.0 - sumAbs / n / 5.0))
    }
  }

  /** Keyword candidate generation: a posting-list join when the workspace
    * index is present (candidate cost ∝ posting lists, partition-pruned by
    * token bucket — the 100 TB shape), else the fallback full scan. Both
    * produce identical (id, kw_score, kw_rank) rows. */
  private[graft] def keywordCandidates(qToks: Seq[String], depth: Int): DataFrame = {
    val scored = postings match {
      case Some(post) =>
        TokenIndex.search(post, qToks, depth)
          .select(col("chunk_id").as("id"), col("score").as("kw_score"))
      case None =>
        // heading words are keyword-searchable: the FTS mirror indexes
        // "[CONTEXT: heading] text" (vector_store.cpp:195-201)
        val indexed = concat_ws(" ", coalesce(col("heading_path"), lit("")), col("text_chunk"))
        val score = size(filter(F.tokens(indexed), t => t.isin(qToks: _*)))
        chunks.select(col("id"), score.as("kw_score"))
          .filter(col("kw_score") > 0)
          .orderBy(col("kw_score").desc, col("id"))
          .limit(depth)
    }
    scored.withColumn("kw_rank",
      row_number().over(Window.orderBy(col("kw_score").desc, col("id"))))
  }

  /** Keyword candidates for a query using MATCH operators — `"exact
    * phrase"` / `prefix*` with implicit AND (FTS5 fidelity,
    * vector_store.cpp:252): positional posting-list search when the index
    * is present (and carries positions), else the scan-side twin with
    * identical semantics. Same (id, kw_score, kw_rank) shape as
    * [[keywordCandidates]]. */
  private[graft] def keywordTermCandidates(terms: Seq[TokenIndex.Term], depth: Int): DataFrame = {
    val needsPositions = terms.exists(_.isInstanceOf[TokenIndex.Term.Phrase])
    val scored = postings match {
      case Some(post) if !needsPositions || post.columns.contains("positions") =>
        TokenIndex.searchTerms(post, terms, depth)
          .select(col("chunk_id").as("id"), col("score").as("kw_score"))
      case _ =>
        val indexed = concat_ws(" ", coalesce(col("heading_path"), lit("")), col("text_chunk"))
        chunks.select(col("id"),
            TokenIndex.termScore(F.tokens(indexed), terms).as("kw_score"))
          .filter(col("kw_score") > 0)
          .orderBy(col("kw_score").desc, col("id"))
          .limit(depth)
    }
    scored.withColumn("kw_rank",
      row_number().over(Window.orderBy(col("kw_score").desc, col("id"))))
  }

  /** @param maxDepthFactor D17 degradation hook: caps the intent overfetch
    *        factor (the facade passes LatencyPolicy.depthFactor under high
    *        latency, vector_store.cpp:334-337).
    * @param keywordOnly D17 critical bypass: skip the vector branch, flat
    *        0.5 base scores (vector_store.cpp:324-332). */
  def search(query: String, embedder: Embedder, k: Int = 5,
             maxDepthFactor: Int = Int.MaxValue,
             keywordOnly: Boolean = false): Seq[ScoredChunk] = {
    cache.getExact(query) match {
      case Some(hit) => return hit
      case None =>
    }
    val t0 = System.nanoTime()
    val qv = embedder.embed(query)
    val tEmbed = System.nanoTime()
    cache.getSemantic(qv) match {
      case Some(hit) => return hit
      case None =>
    }

    val intent = Intent.detect(query)
    val (semW, kwW, factor) = Intent.weights(intent)
    val depth = math.min(factor, maxDepthFactor) * k

    // semantic branch: candidate rows from the generator (full scan or ANN
    // probe) + top-depth (ids + ranks only; metadata re-joined once the
    // candidate set is tiny); empty under the D17 critical bypass
    val sem =
      if (keywordOnly) Seq.empty[(Long, Double, Int)].toDF("id", "sem_score", "sem_rank")
      else semGen.candidates(qv, depth)
        // top-depth first (TakeOrderedAndProject — per-partition top-k, no
        // global-window shuffle); rank the <=depth survivors
        .orderBy(col("sem_score").desc, col("id"))
        .limit(depth)
        .withColumn("sem_rank", row_number().over(Window.orderBy(col("sem_score").desc, col("id"))))

    // keyword branch: MATCH-operator queries (quotes / trailing *) take
    // the FTS5-fidelity term path; plain queries keep the historical
    // bag-of-tokens overlap via the posting index (or the fallback scan)
    val qToks = query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct.toSeq
    val emptyKw = Seq.empty[(Long, Int, Int)].toDF("id", "kw_score", "kw_rank")
    val kw =
      if (TokenIndex.hasOperators(query)) {
        val terms = TokenIndex.parse(query)
        if (terms.isEmpty) emptyKw else keywordTermCandidates(terms, depth)
      } else if (qToks.isEmpty) emptyKw
      else keywordCandidates(qToks, depth)

    // weighted RRF fusion, K=60 + intent×type boost + trust/recency
    val stab = stability(query)
    val stabBias = stab * Intent.stabilityMultiplier(intent) * 0.1
    val typeBoost = {
      val base = intent match {
        case Intent.Definition => when(col("chunk_type") === "definition", 0.5).otherwise(0.0)
        case Intent.Summary    => when(col("chunk_type") === "summary", 0.5).otherwise(0.0)
        case Intent.Procedure  => when(col("chunk_type") === "list", 0.3).otherwise(0.0)
        case Intent.Example    => when(col("chunk_type") === "example", 0.4).otherwise(0.0)
        case _                 => lit(0.0)
      }
      if (intent == Intent.Summary) base + when(col("heading_level") === 1, 0.2).otherwise(0.0)
      else base
    }
    val ageSec = unix_timestamp(current_timestamp()) - unix_timestamp(col("created_at"))
    val fusedIds = sem.select("id", "sem_score", "sem_rank")
      .join(kw.select("id", "kw_rank"), Seq("id"), "full_outer")
      .withColumn("rrf",
        if (keywordOnly) lit(0.5) // FTS-only emergency: flat baseline score
        else coalesce(lit(semW) / (lit(60.0) + col("sem_rank")), lit(0.0)) +
             coalesce(lit(kwW) / (lit(60.0) + col("kw_rank")), lit(0.0)))
    // candidate set is ≤ 2·depth rows — broadcast it back onto the chunk
    // table once for metadata, then score
    val fused = chunks
      .join(broadcast(fusedIds), Seq("id"))
      .withColumn("trust", F.trustScore(col("boost_factor"), ageSec))
      // intent×type boost applies only to rows the SEMANTIC branch surfaced:
      // the reference adds intentBoost while iterating semantic candidates
      // (vector_store.cpp:402-409), so keyword-only hits never receive it
      .withColumn("score",
        col("rrf") + when(col("sem_rank").isNotNull, typeBoost).otherwise(lit(0.0)) + lit(stabBias))
      .orderBy(col("score").desc, col("id"))
      .limit(depth * 2)

    val tPlan = System.nanoTime()
    val collectedRows = fused.collect()
    val tExec = System.nanoTime()
    val collected = collectedRows.toSeq.map { r =>
      ScoredChunk(
        id = r.getAs[Long]("id"),
        docId = Option(r.getAs[String]("doc_id")).getOrElse(""),
        headingPath = r.getAs[String]("heading_path"),
        chunkType = Option(r.getAs[String]("chunk_type")).getOrElse("text"),
        text = Option(r.getAs[String]("text_chunk")).getOrElse(""),
        score = r.getAs[Double]("score"),
        semScore = Option(r.getAs[Any]("sem_score")).map(_.toString.toDouble).getOrElse(0.0),
        semanticRank = Option(r.getAs[Any]("sem_rank")).map(_.toString.toInt).getOrElse(0),
        keywordRank = Option(r.getAs[Any]("kw_rank")).map(_.toString.toInt).getOrElse(0),
        trustScore = Option(r.getAs[Any]("trust")).map(_.toString.toDouble).getOrElse(1.0),
        isExploration = false)
    }

    // driver-side tail: MMR → exploration → truncate (reference collapses to
    // memory at the same point, SURVEY §3.2). Synchronized: the EMA /
    // calibration / log-buffer updates must not interleave when searches
    // run concurrently with a streaming-ingest thread (microseconds over
    // ≤ depth rows — never held during cluster work).
    synchronized {
    val (diversified, mmrPenalty) =
      if (opts.experimentalMmr) {
        val lam = Mmr.lambda(query, intent)
        val rawEntropy = Mmr.docEntropy(collected)
        val ent = Mmr.smoothEntropy(entropyEma, rawEntropy, searchCount)
        entropyEma = Some(ent)
        val sel = Mmr.select(collected, k, lam, ent)
        (sel.selected, sel.penaltyTotal)
      } else (collected.take(k), 0.0)

    val withExploration =
      if (opts.enableExploration) {
        // below-cutoff pool excludes anything already selected (MMR may
        // have reached past rank k, which would otherwise duplicate a row)
        val selectedIds = diversified.map(_.id).toSet
        val pool = collected.filterNot(c => selectedIds.contains(c.id))
        Mmr.injectExploration(diversified, pool, stab, intent).take(k)
      } else diversified
    val tMmr = System.nanoTime()

    // E1: optional cross-encoder rerank of the final batch (cap 10,
    // 500-char texts), scores calibrated (E2) with frozen-model guard (E3)
    val reranked =
      if (opts.useRerank) {
        val res = Reranker.rerank(query, withExploration, k, rerankModel, calibStats)
        calibStats = res.stats
        res.reranked
      } else withExploration
    val tRerank = System.nanoTime()

    searchCount += 1
    // one log row per search, describing the top result — the reference's
    // exact logRetrieval call shape (vector_store.cpp:566-571)
    if (reranked.nonEmpty) {
      val top = reranked.head
      val delta = if (top.semanticRank > 0) top.semanticRank - 1 else 0
      logRows :+= RetrievalLogRow(
        query = cache.canonical(query),
        semanticRank = top.semanticRank,
        keywordRank = top.keywordRank,
        finalRank = 1,
        latencyEmbedMs = (tEmbed - t0) / 1e6,
        latencySearchMs = (tExec - tPlan) / 1e6,
        latencyFusionMs = (tMmr - tExec) / 1e6,
        latencyRerankMs = (tRerank - tMmr) / 1e6,
        topScore = top.score,
        mmrPenalty = mmrPenalty,
        isExploration = withExploration.exists(_.isExploration),
        rankDelta = delta,
        stability = stab,
        createdAt = new java.sql.Timestamp(System.currentTimeMillis()))
    }
    cache.put(query, qv, reranked)
    lastAudit = SearchAudit((tEmbed - t0) / 1e6, (tPlan - tEmbed) / 1e6, (tExec - tPlan) / 1e6)
    reranked
    }
  }

  /** Context-window expansion around a hit (SURVEY §2 D13/D14). */
  def context(chunkId: Long, offset: Int): DataFrame = {
    val target = chunks.filter(col("id") === chunkId)
      .select(col("doc_id").as("t_doc"), col("chunk_idx").as("t_idx"))
    chunks.join(broadcast(target),
        col("doc_id") === col("t_doc") &&
        col("chunk_idx").between(col("t_idx") - offset, col("t_idx") + offset))
      .orderBy(col("chunk_idx"))
      .select(col("id"), col("doc_id"), col("chunk_idx"), col("text_chunk"))
  }
}
