package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.embed.HashNgramEmbedder
import graft.model.SearchOptions
import graft.post.{DeepDive, ExtractiveSummaryModel, Summarizer}
import graft.search.HybridEngine

/** Post-retrieval model operators (SURVEY §2 C4, E1–E8) and the
  * presentation-derived queries (G2–G4). */
object PostQueries {

  private val embedder = HashNgramEmbedder(dim = 64)

  val all: Seq[Q] = Seq(

    // E1 — cross-encoder rerank of the final batch (pluggable model;
    // deterministic lexical stand-in), calibrated scores (E2), frozen guard
    // (E3). Rows-only: the scorer runs driver-side on ≤10 rows.
    Q.noOracle("e1_rerank") { (spark, dir) =>
      import spark.implicits._
      val chunks = EngineQueries.chunksFor(spark, dir)
      val engine = new HybridEngine(spark, chunks, SearchOptions(useRerank = true))
      val q = "merge window hash partition"
      engine.search(q, embedder, 5).zipWithIndex.map { case (c, i) =>
        (q, i + 1, c.id, math.floor(c.score * 1e6).toLong)
      }.toDF("query", "rank", "chunk_id", "calibrated_micro")
    },

    // C4 — section summarization re-indexed as chunk_type='summary' rows
    // (extractive stand-in model; same pipeline shape as the LLM path).
    Q.noOracle("c4_summarize_sections") { (spark, dir) =>
      val chunks = EngineQueries.chunksFor(spark, dir)
      Summarizer.summaryRows(chunks, ExtractiveSummaryModel(), embedder)
        .select(col("doc_id"), col("heading_path"), col("chunk_type"),
          col("heading_level"), length(col("summary")).as("summary_len"),
          size(col("embedding")).as("model_dim"))
        .orderBy("doc_id", "heading_path")
        .limit(1000)
    },

    // E8 — deep-dive orchestration: top-5 → context ±2 → cluster → claims
    // with validated sources and confidence.
    Q.noOracle("e8_deep_dive") { (spark, dir) =>
      import spark.implicits._
      val chunks = EngineQueries.chunksFor(spark, dir)
      val engine = new HybridEngine(spark, chunks)
      DeepDive.run(engine, "what is a merge window", embedder).zipWithIndex.map {
        case (c, i) =>
          (i, c.statement.take(80), c.sources.mkString(","),
            math.floor(c.confidence * 1e6).toLong)
      }.toDF("claim_idx", "statement", "sources", "confidence_micro")
    },

    // G2 — rank-shift between the fused order and a rerank order (here: the
    // keyword score as the second ranking), fully SQL-expressible.
    Q("g2_rank_shift",
      """WITH scored AS (
        |  SELECT doc_id,
        |         len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |                         t -> t IN ('merge', 'window', 'hash'))) AS kw,
        |         n_chars
        |  FROM documents),
        |ranked AS (
        |  SELECT doc_id,
        |         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS orig_rank,
        |         row_number() OVER (ORDER BY kw DESC, doc_id) AS rerank_rank
        |  FROM scored)
        |SELECT doc_id, orig_rank, rerank_rank, orig_rank - rerank_rank AS shift
        |FROM ranked WHERE orig_rank <= 20
        |ORDER BY orig_rank""".stripMargin) { (spark, dir) =>
      import graft.functions.F
      val scored = table(spark, dir, "documents")
        .select(col("doc_id"),
          size(filter(F.tokens(col("text")),
            t => t.isin("merge", "window", "hash"))).as("kw"),
          col("n_chars"))
      // scale shape: NO full-corpus window. orig_rank comes from a
      // TakeOrderedAndProject top-20 (the only rows kept) ranked over ≤20
      // rows; each survivor's GLOBAL rerank_rank is its count-ahead in
      // (kw desc, doc_id) order — a broadcast of 20 rows against one
      // corpus scan with map-side partial counts, identical to the
      // oracle's global row_number.
      val top = scored.orderBy(col("n_chars").desc, col("doc_id")).limit(20)
        .withColumn("orig_rank",
          row_number().over(Window.orderBy(col("n_chars").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id").as("s_id"), col("kw").as("s_kw"), col("orig_rank"))
      scored.join(broadcast(top),
          col("kw") > col("s_kw") ||
            (col("kw") === col("s_kw") && col("doc_id") <= col("s_id")))
        .groupBy(col("s_id"), col("orig_rank"))
        .agg(count(lit(1)).as("rerank_rank"))
        .select(col("s_id").as("doc_id"), col("orig_rank"), col("rerank_rank"),
          (col("orig_rank") - col("rerank_rank")).as("shift"))
        .orderBy("orig_rank")
    },

    // G3 — stability badge over the D9 aggregate.
    Q("g3_stability_badge",
      """SELECT user_id,
        |       CASE WHEN greatest(0.0, 1.0 - avg(abs(value / 50.0)) / 5.0) > 0.8
        |            THEN 'Stable' ELSE 'Volatile' END AS badge
        |FROM events WHERE event_type <> 'click'
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
      events(spark, dir)
        .filter(col("event_type") =!= "click")
        .groupBy("user_id")
        .agg(when(greatest(lit(0.0), lit(1.0) - avg(abs(col("value") / 50.0)) / 5.0) > 0.8, "Stable")
          .otherwise("Volatile").as("badge"))
        .orderBy("user_id")
    },

    // G4 — per-stage latency audit of a live search (engine metrics).
    Q.noOracle("g4_latency_audit") { (spark, dir) =>
      import spark.implicits._
      val chunks = EngineQueries.chunksFor(spark, dir)
      val engine = new HybridEngine(spark, chunks)
      engine.search("what is a merge window", embedder, 5)
      val a = engine.lastAudit
      Seq(("embed", a.embedMs > 0), ("plan", a.planMs > 0), ("exec", a.execMs > 0))
        .toDF("stage", "measured")
    }
  )
}
