package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.embed.HashNgramEmbedder
import graft.post.{DeepDive, ExtractiveSummaryModel, Summarizer}
import graft.search.HybridEngine

/** Post-retrieval model operators (SURVEY §2 C4, E1–E8) and the
  * presentation-derived queries (G2–G4). */
object PostQueries {

  private val embedder = HashNgramEmbedder(dim = 64)

  /** The E1/E2 rerank-trace oracle, shared by e1_rerank (HTTP transport)
    * and e1_rerank_scores (in-process model): candidate slate, lexical
    * Jaccard, cold-stats calibration, replayed stage by stage in DuckDB. */
  private val E1TraceOracleSql: String =
    """WITH cand AS (
      |  SELECT doc_id, coalesce(text, '') AS text,
      |         len(list_filter(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+'),
      |             t -> t IN ('merge', 'window', 'hash', 'partition'))) AS k
      |  FROM documents),
      |top AS (SELECT doc_id, text, row_number() OVER (ORDER BY k DESC, doc_id) AS rn
      |        FROM cand WHERE k > 0 QUALIFY rn <= 10),
      |raw AS (SELECT doc_id, rn,
      |          list_distinct(regexp_extract_all(lower(substr(text, 1, 500)), '[a-z0-9]+')) AS tt
      |        FROM top),
      |sc AS (SELECT doc_id, rn,
      |         CASE WHEN len(tt) = 0 THEN 0.0
      |              ELSE len(list_intersect(tt, ['merge', 'window', 'hash', 'partition']))::DOUBLE
      |                   / (len(tt) + 4 - len(list_intersect(tt, ['merge', 'window', 'hash', 'partition'])))
      |         END AS s
      |       FROM raw),
      |b AS (SELECT list(s ORDER BY rn) AS vals FROM sc),
      |ag AS (SELECT vals, list_aggregate(vals, 'sum') / len(vals) AS bmean FROM b),
      |ag2 AS (SELECT *, greatest(sqrt(list_aggregate(
      |          list_transform(vals, x -> (x - bmean) * (x - bmean)), 'sum') / len(vals)),
      |          0.000001) AS bstd FROM ag)
      |SELECT row_number() OVER (ORDER BY cal DESC, doc_id) AS rank,
      |       doc_id AS chunk_id,
      |       CAST(floor(s * 1000000) AS BIGINT) AS raw_micro,
      |       CAST(floor(cal * 1000000) AS BIGINT) AS calibrated_micro
      |FROM (SELECT sc.doc_id, sc.s,
      |        CASE WHEN abs((sc.s - a.bmean) / greatest(a.bstd, 0.000001)) > 5.0 THEN 0.5
      |             ELSE 1.0 / (1.0 + exp(-greatest(-3.0, least(3.0,
      |                    (sc.s - a.bmean) / greatest(a.bstd, 0.000001)))))
      |        END AS cal
      |      FROM sc, ag2 a)
      |ORDER BY rank""".stripMargin

  /** The E1 scoring trace: top-10 lexical candidate slate → model.score
    * (the injected boundary — in-process or an HTTP hop) → Reranker.rerank
    * from cold Calibration stats. Bounded driver hop by design: the
    * reference's own rerank batch is ≤ 10 candidates. */
  private def rerankTrace(spark: org.apache.spark.sql.SparkSession, dir: String,
                          model: graft.post.RerankModel): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import graft.functions.F
    import graft.model.ScoredChunk
    import graft.post.{Calibration, Reranker}
    val q = "merge window hash partition"
    val qTerms = Seq("merge", "window", "hash", "partition")
    val kscore = size(filter(F.tokens(col("text")), t => t.isin(qTerms: _*)))
    val cands = table(spark, dir, "documents")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"), kscore.as("k"))
      .filter(col("k") > 0)
      .orderBy(col("k").desc, col("doc_id"))
      .limit(10)
      .collect()
      .map(r => ScoredChunk(r.getLong(0), "", "", "", r.getString(1),
        0.0, 0.0, 0, 0, 1.0, isExploration = false))
    val rawById = cands.map(_.id)
      .zip(model.score(q, cands.map(_.text.take(Reranker.TextCap)).toSeq)).toMap
    val res = Reranker.rerank(q, cands.toSeq, 10, model, Calibration.initial)
    require(!res.modelFrozen,
      "rerank fixture drifted into the frozen-model branch — oracle assumes live scores")
    res.reranked.zipWithIndex.map { case (c, i) =>
      ((i + 1).toLong, c.id, math.floor(rawById(c.id) * 1e6).toLong,
        math.floor(c.score * 1e6).toLong)
    }.toDF("rank", "chunk_id", "raw_micro", "calibrated_micro")
      .orderBy("rank")
  }

  val all: Seq[Q] = Seq(

    // E1 — cross-encoder rerank through the REAL HTTP transport,
    // ORACLE-GREEN since round 11: the same candidate slate and scoring
    // trace as e1_rerank_scores, but the scores travel a genuine loopback
    // HTTP hop — HttpRerankModel builds the generateContent-style request,
    // LoopbackProviderServer answers with the deterministic
    // lexical-overlap scores as a JSON score array in the candidate text
    // (gemini_api.cpp:79-178 parity), and the client parses it exactly as
    // the reference parses its model reply. Same oracle as the in-process
    // variant: the transport must be value-preserving, so any
    // serialization/parse defect flips the hash.
    Q("e1_rerank", E1TraceOracleSql) { (spark, dir) =>
      rerankTrace(spark, dir,
        graft.post.HttpRerankModel(
          graft.embed.LoopbackTransport(
            graft.embed.LoopbackProviderServer.url("/rerank"))))
    },

    // E1's SCORER + E2's calibration over a corpus-derived batch,
    // ORACLE-GREEN (round 9; the c1_embed_hash_coords discipline): the
    // deterministic lexical-overlap rerank model — 10-candidate cap,
    // 500-char truncation, token-SET Jaccard against the query — runs
    // through the REAL Reranker.rerank from cold Calibration stats
    // (n=0 → drift-reset to the batch, then z-clamp + sigmoid), and
    // DuckDB replays every stage with ORDERED list folds for the double
    // sums (the e2_calibration trick). Since round 11 the SAME trace also
    // runs through the HTTP transport as e1_rerank (same oracle, two
    // transports — an in-process model call and a loopback HTTP hop).
    Q("e1_rerank_scores", E1TraceOracleSql) { (spark, dir) =>
      rerankTrace(spark, dir, graft.post.LexicalOverlapModel())
    },
    // C4 — section summarization re-indexed as chunk_type='summary' rows,
    // ORACLE-GREEN (round 9; previously rows-only for the model
    // boundary): the extractive stand-in is first-3-sentences over the
    // per-(doc, heading) section concat capped at 5000 chars, and every
    // upstream stage is now replayable — the chunk TEXTS come from the
    // TextChunker recursive CTE (foldCtes gained a chunk_text column),
    // sections re-join and the b9 sentence-split mirror takes the first
    // three. The LLM summary boundary itself remains exactly as pluggable
    // as the reference's; this pins the hermetic path end to end.
    Q("c4_summarize_sections",
      """WITH RECURSIVE
        |sec AS (SELECT doc_id::VARCHAR AS source, coalesce(text, '') AS text FROM documents),
        |""".stripMargin + graft.queries.B9OracleSql.foldCtes + """,
        |ch AS (SELECT c.source AS doc_id, d.src AS heading_path, c.chunk_idx, c.chunk_text
        |       FROM chunks c JOIN (SELECT doc_id::VARCHAR AS id, source AS src FROM documents) d
        |         ON d.id = c.source
        |       WHERE length(c.chunk_text) > 5),
        |secs AS (SELECT doc_id, heading_path,
        |                string_agg(chunk_text, chr(10) ORDER BY chunk_idx) AS section_text
        |         FROM ch GROUP BY doc_id, heading_path),
        |summ AS (SELECT doc_id, heading_path,
        |           list_filter(string_split(regexp_replace(substr(section_text, 1, 5000),
        |             '([.?!])\s+', '\1' || chr(1), 'g'), chr(1)), x -> length(x) > 0) AS sl
        |         FROM secs)
        |SELECT doc_id, heading_path, 'summary' AS chunk_type, 1 AS heading_level,
        |       length(array_to_string(sl[1:least(len(sl), 3)], ' ')) AS summary_len,
        |       64 AS model_dim
        |FROM summ ORDER BY doc_id, heading_path LIMIT 1000""".stripMargin) { (spark, dir) =>
      val chunks = EngineQueries.chunksFor(spark, dir)
      Summarizer.summaryRows(chunks, ExtractiveSummaryModel(), embedder)
        .select(col("doc_id"), col("heading_path"), col("chunk_type"),
          col("heading_level"), length(col("summary")).cast("long").as("summary_len"),
          size(col("embedding")).as("model_dim"))
        .orderBy("doc_id", "heading_path")
        .limit(1000)
    },

    // E8 — deep-dive orchestration: top-5 → context ±2 → cluster → claims
    // with validated sources and confidence. ORACLE-GREEN since round 9:
    // every stage replays (see EngineQueries.E8OracleSql).
    Q("e8_deep_dive", EngineQueries.E8OracleSql) { (spark, dir) =>
      import spark.implicits._
      val chunks = EngineQueries.chunksFor(spark, dir)
      val engine = new HybridEngine(spark, chunks)
      DeepDive.run(engine, "what is a merge window", embedder).zipWithIndex.map {
        case (c, i) =>
          (i.toLong, c.statement.take(80), c.sources.mkString(","),
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

    // G4 — per-stage latency audit of a live search (engine metrics,
    // vector_store.h:72-80 SearchAudit). The latencies themselves are
    // measured wall-clock (unoracleable by nature); what IS constant —
    // and what the oracle pins (round 12, the d15 constant-expectation
    // precedent) — is the audit's SHAPE: exactly the three stage rows,
    // each with a non-negative measured duration. `measured` must use
    // >= 0, not > 0: a warm sub-millisecond stage legitimately reports 0.
    Q("g4_latency_audit",
      """SELECT * FROM (VALUES ('embed', true), ('plan', true), ('exec', true))
        |       AS t(stage, measured)
        |ORDER BY stage""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val chunks = EngineQueries.chunksFor(spark, dir)
      val engine = new HybridEngine(spark, chunks)
      engine.search("what is a merge window", embedder, 5)
      val a = engine.lastAudit
      Seq(("embed", a.embedMs >= 0), ("exec", a.execMs >= 0), ("plan", a.planMs >= 0))
        .toDF("stage", "measured")
    }
  )
}
