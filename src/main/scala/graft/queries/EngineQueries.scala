package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.embed.HashNgramEmbedder
import graft.feedback.BoostLedger
import graft.model.SearchOptions
import graft.post.{Calibration, Synthesis}
import graft.search.{HybridEngine, QueryCache}
import graft.store.{ChunkStore, TokenIndex}

/** End-to-end engine operators: the ingest→index→search pipeline plus the
  * deliberately driver-side ops (MMR, exploration, caches, calibration,
  * clustering — all ≤30 rows, SURVEY §3.2). Driver-side ops are registered
  * rows-only (not SQL-expressible); the boost ledger has an exact oracle.
  */
object EngineQueries {

  private val embedder = HashNgramEmbedder(dim = 64)

  // one embedded chunk table per (session, sfdir) across all engine
  // queries — Verify runs 7 of them; re-embedding the corpus each time
  // would 7x the ingest cost for identical data
  private val chunkCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private[graft] def chunksFor(spark: SparkSession, dir: String): DataFrame =
    chunkCache.getOrElseUpdate((spark, dir),
      ChunkStore.buildChunks(table(spark, dir, "documents"), embedder).cache())

  // posting index over the same indexed text as the chunk cache — the e2e
  // queries exercise the live engine's posting-join keyword branch
  private val postingCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private[graft] def postingsFor(spark: SparkSession, dir: String): DataFrame =
    postingCache.getOrElseUpdate((spark, dir), {
      val chunks = chunksFor(spark, dir)
      TokenIndex.build(
        chunks.select(col("id"), concat_ws(" ",
          coalesce(col("heading_path"), lit("")), col("text_chunk")).as("itext")),
        "id", "itext").cache()
    })

  /** Full pipeline: chunk + embed + hybrid search, fixed query set. */
  def hybridSearch(spark: SparkSession, dir: String,
                   mmr: Boolean = false, exploration: Boolean = false): DataFrame = {
    import spark.implicits._
    val engine = new HybridEngine(spark, chunksFor(spark, dir),
      SearchOptions(experimentalMmr = mmr, enableExploration = exploration),
      postings = Some(postingsFor(spark, dir)))
    val queries = Seq(
      "what is a merge window",
      "how to hash a partition: steps",
      "summary of scan and sort",
      "example of a vector batch")
    queries.flatMap { q =>
      engine.search(q, embedder, k = 5).zipWithIndex.map { case (c, i) =>
        (q, i + 1, c.id, c.docId, c.chunkType,
          math.floor(c.score * 1e6).toLong, c.isExploration)
      }
    }.toDF("query", "rank", "chunk_id", "doc_id", "chunk_type", "score_micro", "is_exploration")
  }

  val all: Seq[Q] = Seq(

    // A3+C1+D1–D8+D12 composed: the flagship ingest→index→hybrid-search
    // pipeline (rows-only: the chunker+embedder are not SQL-expressible).
    Q.noOracle("hybrid_search_e2e") { (spark, dir) => hybridSearch(spark, dir) },

    // D2 scale path LIVE: the same hybrid pipeline with the semantic branch
    // fed by the PERSISTED IVF cell index instead of the exact full scan.
    // Engine.index() trains + writes the cid-partitioned index (annMode=
    // "ivf"); each search probes its nprobe nearest cells — the parquet
    // scan prunes to those cid= partitions (asserted in AnnEngineSpec).
    Q.noOracle("hybrid_search_ann") { (spark, dir) =>
      import spark.implicits._
      val root = graft.util.TempRoot.dir("ann-ws-").toString
      val engine = graft.api.Engine.open(spark, root, "main",
        SearchOptions(annMode = "ivf", annCells = 8, annProbes = 3))
      engine.index(table(spark, dir, "documents"))
      val queries = Seq(
        "what is a merge window",
        "how to hash a partition: steps",
        "summary of scan and sort",
        "example of a vector batch")
      queries.flatMap { q =>
        engine.search(q, k = 5).zipWithIndex.map { case (c, i) =>
          (q, i + 1, c.id, c.docId, c.chunkType, math.floor(c.score * 1e6).toLong)
        }
      }.toDF("query", "rank", "chunk_id", "doc_id", "chunk_type", "score_micro")
    },

    // D10 — adaptive MMR diversification on the collected top-N.
    Q.noOracle("d10_mmr_diversify") { (spark, dir) =>
      hybridSearch(spark, dir, mmr = true)
    },

    // D11 — exploration injection (stability-gated on query history; the
    // probe itself also requires a below-cutoff candidate with raw cosine
    // > 0.65, so whether one appears is corpus-dependent — the
    // EngineEdgeSpec fixture forces it deterministically).
    Q.noOracle("d11_exploration") { (spark, dir) =>
      import spark.implicits._
      val engine = new HybridEngine(spark, chunksFor(spark, dir),
        SearchOptions(enableExploration = true))
      val q = "example of a vector batch"
      // repeat the query to build a stable history, then observe injection
      (1 to 3).foreach(_ => engine.search(q, embedder, 5))
      engine.search(q, embedder, 5).zipWithIndex.map { case (c, i) =>
        (i + 1, c.id, c.isExploration, math.floor(engine.stability(q) * 1e6).toLong)
      }.toDF("rank", "chunk_id", "is_exploration", "stability_micro")
    },

    // D14 — context-window expansion around a hit (self-join on
    // (doc_id, chunk_idx) range; broadcast target).
    Q.noOracle("d14_context_expand") { (spark, dir) =>
      val engine = new HybridEngine(spark, chunksFor(spark, dir))
      val top = engine.search("what is a merge window", embedder, 1)
      engine.context(top.head.id, offset = 2)
    },

    // D15/D16 — exact + semantic query cache (driver-side LRU; output pins
    // hit/miss semantics).
    Q.noOracle("d15_query_cache") { (spark, dir) =>
      import spark.implicits._
      val cache = new QueryCache[Int](capacity = 3, semanticThreshold = 0.95)
      val e1 = embedder.embed("merge window hash")
      cache.put("Merge Window Hash", e1, 1)
      val rows = Seq(
        ("exact_hit", cache.getExact("  merge window HASH ").isDefined),
        ("semantic_hit", cache.getSemantic(embedder.embed("merge window hash")).isDefined),
        ("semantic_miss", cache.getSemantic(embedder.embed("completely different text")).isDefined),
        ("exact_miss", cache.getExact("no such query").isDefined))
      rows.toDF("case", "hit")
    },

    // E2/E3 — rerank score calibration (EMA, drift reset, z-reject, sigmoid).
    Q.noOracle("e2_calibration") { (spark, dir) =>
      import spark.implicits._
      val batches = Seq(
        "normal" -> Seq(0.2, 0.4, 0.6, 0.8),
        "drifted" -> Seq(0.9, 0.95, 0.85, 0.92),
        "frozen" -> Seq(0.5, 0.5, 0.5001, 0.4999),
        "outlier" -> Seq(0.5, 0.5, 0.5, 99.0))
      var stats = Calibration.initial
      batches.flatMap { case (name, batch) =>
        val (next, calibrated) = Calibration.calibrate(stats, batch)
        val frozen = Calibration.isFrozen(batch)
        stats = next
        calibrated.zipWithIndex.map { case (s, i) =>
          (name, i, math.floor(s * 1e6).toLong, frozen,
            math.floor(next.mean * 1e6).toLong)
        }
      }.toDF("batch", "idx", "calibrated_micro", "is_frozen", "mean_micro")
    },

    // E5 — greedy single-link semantic clustering of retrieved contexts.
    Q.noOracle("e5_fact_clustering") { (spark, dir) =>
      import spark.implicits._
      val texts = Seq(
        "the merge window hash", "the merge window hash!", // near-identical
        "scan sort filter table", "scan sort filter tables",
        "completely unrelated payload")
      val embs = texts.map(embedder.embed)
      val clusters = Synthesis.clusterContexts(embs, threshold = 0.85)
      texts.zip(clusters).zipWithIndex
        .map { case ((t, c), i) => (i, t, c) }
        .toDF("ctx_idx", "text", "cluster")
    },

    // F1/F2 — click boost with exploration quarantine, as a ledger join
    // (exact oracle via inline VALUES).
    Q("f1_boost_ledger",
      """WITH clicks(chunk_id, is_exploration) AS
        |  (VALUES (1, false), (1, false), (2, true), (3, false)),
        |b AS (SELECT chunk_id, 1.0 + 0.1 * count(*) AS boost
        |      FROM clicks WHERE NOT is_exploration GROUP BY chunk_id)
        |SELECT d.doc_id, round(coalesce(b.boost, 1.0), 6) AS boost_factor
        |FROM documents d LEFT JOIN b ON b.chunk_id = d.doc_id
        |ORDER BY d.doc_id LIMIT 100""".stripMargin) { (spark, dir) =>
      val ledger = BoostLedger.append(BoostLedger.emptyLedger(spark), Seq(
        BoostLedger.Click(1, "q", isExploration = false),
        BoostLedger.Click(1, "q", isExploration = false),
        BoostLedger.Click(2, "q", isExploration = true),
        BoostLedger.Click(3, "q", isExploration = false)))
      BoostLedger.withBoost(table(spark, dir, "documents"), ledger, "doc_id")
        .select(col("doc_id"), round(col("boost_factor"), 6).as("boost_factor"))
        .orderBy("doc_id")
        .limit(100)
    },

    // C3 — dimension guardrail: embedding length vs registered dim.
    Q("c3_dim_guardrail",
      """SELECT count(*) AS n_total,
        |       count(*) FILTER (WHERE len(embedding) = 64) AS n_ok,
        |       count(*) FILTER (WHERE len(embedding) <> 64) AS n_rejected
        |FROM embeddings""".stripMargin) { (spark, dir) =>
      table(spark, dir, "embeddings")
        .agg(
          count(lit(1)).as("n_total"),
          count(when(size(col("embedding")) === 64, 1)).as("n_ok"),
          count(when(size(col("embedding")) =!= 64, 1)).as("n_rejected"))
    }
  )
}
