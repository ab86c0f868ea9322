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
  // would 7x the ingest cost for identical data. LRU-bounded + race-safe
  // ([[graft.util.SessionCache]], docs/PLANS.md "Session caches");
  // eviction unpersists the cached blocks.
  private val chunkCache =
    new graft.util.SessionCache[(SparkSession, String), DataFrame](
      8, _.unpersist(false))

  private[graft] def chunksFor(spark: SparkSession, dir: String): DataFrame =
    chunkCache.getOrBuild((spark, dir))(
      ChunkStore.buildChunks(table(spark, dir, "documents"), embedder).cache())

  // one persisted-IVF workspace per (session, sfdir): built on first call,
  // served warm thereafter (the chunkCache discipline applied to the
  // flagship ANN serving path — see the hybrid_search_ann registration).
  // The holder pattern matters most HERE: a racing loser would build a
  // whole workspace (ingest + IVF train + persist) and leak it. Eviction
  // CLOSES the engine — flushing its log, unpersisting the pinned chunk
  // cache (the blocks a dropped reference would otherwise hold until JVM
  // exit), and deleting its throwaway temp workspace (the shutdown hook
  // stays as backstop).
  //
  // CONCURRENCY CONTRACT (r13 advice): getOrBuild hands out raw engine
  // references with no refcount, so an engine evicted while another
  // thread is mid-search would have its cache unpersisted and workspace
  // deleted under the active query. That interleaving requires (a) > 8
  // concurrently-live corpora (cap 8 vs <= 3 in any gate/bench lifecycle
  // — docs/PLANS.md) AND (b) concurrent callers, and every driver
  // surface (Verify, Bench, Dev) runs queries SEQUENTIALLY on one
  // thread. A future parallel driver must either raise the cap above
  // its live-corpus count or add refcounted release before relying on
  // eviction. Post-eviction use now fails fast (engine closed-flag,
  // round 14) instead of corrupting silently.
  private val annServeCache =
    new graft.util.SessionCache[(SparkSession, String), graft.api.Engine](
      8, _.close(deleteWorkspace = true))

  // posting index over the same indexed text as the chunk cache — the e2e
  // queries exercise the live engine's posting-join keyword branch
  private val postingCache =
    new graft.util.SessionCache[(SparkSession, String), DataFrame](
      8, _.unpersist(false))

  private[graft] def postingsFor(spark: SparkSession, dir: String): DataFrame =
    postingCache.getOrBuild((spark, dir)) {
      val chunks = chunksFor(spark, dir)
      TokenIndex.build(
        chunks.select(col("id"), concat_ws(" ",
          coalesce(col("heading_path"), lit("")), col("text_chunk")).as("itext")),
        "id", "itext").cache()
    }

  private val MmrSlate = 30
  private val MmrK = 10

  /** DuckDB replay of the d10 greedy MMR selection: 10 unrolled pick/sel
    * CTE steps (the pqIterSql unrolling technique applied to greedy
    * selection). λ = σ(5·(5/10 − 0.5)) = 0.5 exactly; relevance is the
    * micro-floored cosine, identical cross-engine; entropy is summed in
    * pinned (count, doc) order. */
  private def mmrOracleSql: String = {
    val steps = (1 to MmrK).map { i =>
      val prev = if (i == 1) "sel0" else s"sel${i - 1}"
      s"""pick$i AS (SELECT c.id, c.doc, c.hp, c.score,
         |  lam.l * c.score - (1 - lam.l) *
         |    (CASE WHEN list_contains(s.docs, c.doc) THEN 0.15 * (1.1 - ent.h) ELSE 0 END +
         |     CASE WHEN list_contains(s.hps, c.hp) THEN 0.1 ELSE 0 END) AS mmr
         |  FROM cand c, $prev s, ent, lam
         |  WHERE NOT list_contains(s.ids, c.id)
         |  ORDER BY mmr DESC, c.score DESC, c.id LIMIT 1),
         |sel$i AS (SELECT list_append(s.ids, p.id) AS ids,
         |                 list_append(s.docs, p.doc) AS docs,
         |                 list_append(s.hps, p.hp) AS hps
         |          FROM $prev s, pick$i p)""".stripMargin
    }.mkString(",\n")
    val out = (1 to MmrK).map(i =>
      s"SELECT $i::BIGINT AS rank, id AS chunk_id, doc AS doc_key, " +
        s"CAST(floor(score * 1000000) AS BIGINT) AS score_micro FROM pick$i")
      .mkString("\nUNION ALL\n")
    s"""WITH qe AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
       |cand AS (SELECT e.vec_id AS id, (e.vec_id % 7)::VARCHAR AS doc,
       |                'h' || (e.vec_id % 3)::VARCHAR AS hp,
       |                floor(list_cosine_similarity(e.embedding::DOUBLE[], qe.embedding::DOUBLE[]) * 1000000) / 1000000.0 AS score
       |         FROM embeddings e, qe WHERE e.vec_id <> 0
       |         ORDER BY score DESC, id LIMIT $MmrSlate),
       |ent AS (SELECT -list_aggregate(list_transform(l, c -> (c / $MmrSlate.0) * (ln(c / $MmrSlate.0) / ln(2.0))), 'sum') AS h
       |        FROM (SELECT list(cnt ORDER BY cnt, doc) AS l
       |              FROM (SELECT doc, count(*)::DOUBLE AS cnt FROM cand GROUP BY doc))),
       |lam AS (SELECT greatest(0.2, least(0.8, 1.0 / (1.0 + exp(-5.0 * (5 / 10.0 - 0.5))))) AS l),
       |sel0 AS (SELECT CAST([] AS BIGINT[]) AS ids, CAST([] AS VARCHAR[]) AS docs, CAST([] AS VARCHAR[]) AS hps),
       |$steps
       |$out
       |ORDER BY rank""".stripMargin
  }

  /** DuckDB replay of the e2 calibration fold: the four fixed batches'
    * stats chain unrolls as st1..st4 CTEs (EMA / drift-reset / frozen-skip
    * exactly as Calibration.update — note `(1 - 0.15)`, the same double
    * the Scala `1 - Alpha` produces, NOT the different literal 0.85), and
    * each batch's scores normalize against ITS post-update stats. */
  private def calibrationOracleSql: String = {
    def step(i: Int) =
      s"""st$i AS (SELECT
         |  CASE WHEN a.frozen THEN p.mean
         |       WHEN p.n = 0 OR abs(a.bmean - p.mean) > 0.4 THEN a.bmean
         |       ELSE (1 - 0.15) * p.mean + 0.15 * a.bmean END AS mean,
         |  CASE WHEN a.frozen THEN p.std
         |       WHEN p.n = 0 OR abs(a.bmean - p.mean) > 0.4 THEN a.bstd
         |       ELSE greatest((1 - 0.15) * p.std + 0.15 * a.bstd, 0.000001) END AS std,
         |  CASE WHEN a.frozen THEN p.n
         |       WHEN p.n = 0 OR abs(a.bmean - p.mean) > 0.4 THEN 1
         |       ELSE p.n + 1 END AS n
         |  FROM agg a, st${i - 1} p WHERE a.bi = $i),
         |out$i AS (SELECT a.batch, t.i AS idx, a.vals[t.i + 1] AS s, a.frozen, st.mean, st.std
         |          FROM agg a, st$i st, (SELECT unnest(range(4)) AS i) t WHERE a.bi = $i)""".stripMargin
    val steps = (1 to 4).map(step).mkString(",\n")
    val union = (1 to 4).map(i => s"SELECT * FROM out$i").mkString("\nUNION ALL\n")
    s"""WITH batches AS (
       |  SELECT * FROM (VALUES
       |    (1, 'normal',  [0.2, 0.4, 0.6, 0.8]),
       |    (2, 'drifted', [0.9, 0.95, 0.85, 0.92]),
       |    (3, 'frozen',  [0.5, 0.5, 0.5001, 0.4999]),
       |    (4, 'outlier', [0.5, 0.5, 0.5, 99.0])) AS t(bi, batch, vals)),
       |agg0 AS (SELECT bi, batch, vals,
       |                list_aggregate(vals, 'sum') / len(vals) AS bmean,
       |                list_aggregate(list_transform(vals, s -> (s - 0.5) * (s - 0.5)), 'sum') / len(vals) < 0.001 AS frozen
       |         FROM batches),
       |agg AS (SELECT *, greatest(sqrt(list_aggregate(list_transform(vals, s -> (s - bmean) * (s - bmean)), 'sum') / len(vals)), 0.000001) AS bstd
       |        FROM agg0),
       |st0 AS (SELECT 0.5::DOUBLE AS mean, 0.2::DOUBLE AS std, 0::BIGINT AS n),
       |$steps,
       |uni AS ($union)
       |SELECT batch, idx,
       |       CAST(floor(CASE WHEN abs((s - mean) / greatest(std, 0.000001)) > 5.0 THEN 0.5
       |                       ELSE 1.0 / (1.0 + exp(-greatest(-3.0, least(3.0, (s - mean) / greatest(std, 0.000001)))))
       |                  END * 1000000) AS BIGINT) AS calibrated_micro,
       |       frozen AS is_frozen,
       |       CAST(floor(mean * 1000000) AS BIGINT) AS mean_micro
       |FROM uni
       |ORDER BY batch, idx""".stripMargin
  }

  /** Run independent per-query searches CONCURRENTLY from a small driver
    * pool (optimization guide §2.6 "overlap independent jobs": each search
    * is several short single-digit-task Spark jobs, so sequential
    * submission leaves the cluster idle between actions; concurrent
    * submission back-fills it). Results keep the caller's query order.
    * ONLY sound when searches share no cross-search state — the callers
    * guard on MMR/exploration/rerank off (those paths thread entropy-EMA /
    * calibration state through the search SEQUENCE, where order matters). */
  private[queries] def searchAll[A](queries: Seq[String])(one: String => A): Seq[A] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(queries.size)
    try {
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val futs = queries.map(q => Future(one(q)))
      futs.map(Await.result(_, Duration.Inf))
    } finally pool.shutdown()
  }

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
    // cross-search state (entropy EMA under MMR, exploration history)
    // must observe the sequence order → keep those variants sequential
    val perQuery: Seq[Seq[graft.model.ScoredChunk]] =
      if (mmr || exploration) queries.map(engine.search(_, embedder, k = 5))
      else searchAll(queries)(engine.search(_, embedder, k = 5))
    queries.zip(perQuery).flatMap { case (q, res) =>
      res.zipWithIndex.map { case (c, i) =>
        (q, (i + 1).toLong, c.id, c.docId, c.chunkType,
          math.floor(c.score * 1e6).toLong, c.isExploration)
      }
    }.toDF("query", "rank", "chunk_id", "doc_id", "chunk_type", "score_micro", "is_exploration")
  }


  /** The FLAGSHIP query's exact DuckDB replay (round 9): the whole
    * ingest→embed→hybrid-search pipeline — TextChunker chunking (the B9
    * recursive CTE with chunk texts), chunk identities/types
    * (ChunkStore.buildChunks), the hash-ngram embedder coordinate-exact
    * over queries AND every chunk text, the exact-scan cosine ranks, the
    * posting-equivalent keyword tf ranks, intent-weighted RRF K=60,
    * sem-gated intent×type boosts and the empty-history stability bias —
    * per query, to the micro-floored score. The only engine parts NOT on
    * this path are the explicitly-off options (MMR, exploration, rerank,
    * caches) and the time-dependent trust column, which the output does
    * not carry. Intent constants are inlined per query from
    * Intent.detect/weights; the stability term replays 1.0·mult·0.1 with
    * the same double op order. */
  private val E2EChainSql: String =
    """
        |qmeta(qi, query, semw, kww, factor, btype, bboost, mult) AS (VALUES
        |  (0, 'what is a merge window',         0.35::DOUBLE, 0.65::DOUBLE, 3, 'definition', 0.5::DOUBLE, 2.0::DOUBLE),
        |  (1, 'how to hash a partition: steps', 0.35::DOUBLE, 0.65::DOUBLE, 3, 'list',       0.3::DOUBLE, 1.5::DOUBLE),
        |  (2, 'summary of scan and sort',       0.7::DOUBLE,  0.3::DOUBLE,  6, 'summary',    0.5::DOUBLE, 1.0::DOUBLE),
        |  (3, 'example of a vector batch',      0.5::DOUBLE,  0.5::DOUBLE,  4, 'example',    0.4::DOUBLE, 0.5::DOUBLE)),
        |sec AS (SELECT doc_id::VARCHAR AS source, coalesce(text, '') AS text FROM documents),
        |""".stripMargin + B9OracleSql.foldCtes + """,
        |cht AS (SELECT c.source::BIGINT * 1000000 + c.chunk_idx AS id,
        |               c.source AS doc_id, c.chunk_idx, c.chunk_text,
        |               d.source AS hpath,
        |               ['text','definition','list','example','summary']
        |                 [((c.source::BIGINT + c.chunk_idx) % 5 + 1)::INT] AS chunk_type
        |        FROM chunks c JOIN (SELECT doc_id::VARCHAR AS id, source FROM documents) d
        |          ON d.id = c.source),
        |embin AS (SELECT 'q' || qi AS k, query AS txt FROM qmeta
        |          UNION ALL SELECT 'c' || id AS k, chunk_text FROM cht),
        |etk AS (SELECT k, unnest(regexp_extract_all(lower(txt), '[a-z0-9]+')) AS tok FROM embin),
        |efeat AS (SELECT k, 'w:' || tok AS f FROM etk
        |          UNION ALL
        |          SELECT k, 'c:' || substr(tok, i::INT + 1, 3)
        |          FROM etk, unnest(range(greatest(length(tok) - 2, 0))) AS u(i)
        |          WHERE length(tok) >= 3),
        |eh AS (SELECT k, ('0x' || substr(md5('42:' || f), 1, 16))::UBIGINT AS hu FROM efeat),
        |ecs AS (SELECT k, ((hu // 2) % 64)::BIGINT AS idx,
        |               sum(CASE WHEN hu % 2 = 0 THEN 1 ELSE -1 END)::BIGINT AS cnt
        |        FROM eh GROUP BY k, idx),
        |edense AS (SELECT e.k, u.i AS idx, coalesce(ecs.cnt, 0) AS cnt
        |           FROM (SELECT DISTINCT k FROM embin) e CROSS JOIN range(64) u(i)
        |           LEFT JOIN ecs ON ecs.k = e.k AND ecs.idx = u.i),
        |enrm AS (SELECT k, sum(cnt * cnt)::BIGINT AS n2 FROM edense GROUP BY k),
        |emb AS (SELECT d.k,
        |          list((((d.cnt::DOUBLE * (CASE WHEN n.n2 = 0 THEN 0.0 ELSE 1.0 / sqrt(n.n2::DOUBLE) END))::REAL)::DOUBLE) ORDER BY d.idx) AS v
        |        FROM edense d JOIN enrm n USING (k) GROUP BY d.k),
        |semr AS (SELECT q.qi, q.factor, c.id,
        |           row_number() OVER (PARTITION BY q.qi
        |             ORDER BY list_cosine_similarity(ce.v, qe.v) DESC, c.id) AS sem_rank
        |         FROM qmeta q, emb qe, cht c, emb ce
        |         WHERE qe.k = 'q' || q.qi AND ce.k = 'c' || c.id),
        |sem AS (SELECT qi, id, sem_rank FROM semr WHERE sem_rank <= factor * 5),
        |qt AS (SELECT qi, list_distinct(regexp_extract_all(lower(query), '[a-z0-9]+')) AS toks FROM qmeta),
        |kwr AS (SELECT q.qi, q.factor, c.id,
        |          len(list_filter(regexp_extract_all(lower(c.hpath || ' ' || c.chunk_text), '[a-z0-9]+'),
        |              t -> list_contains(qt.toks, t))) AS kw_score
        |        FROM qmeta q JOIN qt USING (qi) CROSS JOIN cht c),
        |kw AS (SELECT qi, id, kw_rank FROM (
        |         SELECT qi, id, factor,
        |                row_number() OVER (PARTITION BY qi ORDER BY kw_score DESC, id) AS kw_rank
        |         FROM kwr WHERE kw_score > 0)
        |       WHERE kw_rank <= factor * 5),
        |fusedi AS (SELECT coalesce(s.qi, k.qi) AS qi, coalesce(s.id, k.id) AS id, s.sem_rank, k.kw_rank
        |           FROM sem s FULL OUTER JOIN kw k ON k.qi = s.qi AND k.id = s.id),
        |scored AS (SELECT f.qi, f.id, c.doc_id, c.chunk_type, m.query,
        |             coalesce(m.semw / (60.0 + f.sem_rank), 0.0)
        |               + coalesce(m.kww / (60.0 + f.kw_rank), 0.0)
        |               + CASE WHEN f.sem_rank IS NOT NULL AND c.chunk_type = m.btype THEN m.bboost ELSE 0.0 END
        |               + 1.0 * m.mult * 0.1 AS score
        |           FROM fusedi f JOIN cht c ON c.id = f.id JOIN qmeta m ON m.qi = f.qi)
        |""".stripMargin.stripSuffix("\n")

  private val E2EOracleSql: String =
    "WITH RECURSIVE\n" + E2EChainSql + """
        |SELECT query, row_number() OVER (PARTITION BY qi ORDER BY score DESC, id) AS rank,
        |       id AS chunk_id, doc_id, chunk_type,
        |       CAST(floor(score * 1000000) AS BIGINT) AS score_micro,
        |       FALSE AS is_exploration
        |FROM scored QUALIFY rank <= 5 ORDER BY qi, rank""".stripMargin

  /** The hybrid_search_ann IVF geometry (Engine facade serving path):
    * 8 trained cells, fixed nprobe 3, SQ8 phase-1 quantization (the
    * SearchOptions defaults the query opens the engine with). */
  private val AnnCells = 8
  private val AnnNprobe = 3

  /** Micro-floored squared L2 between two DOUBLE[64] lists — the exact
    * left-fold KMeans.microDistances generates (training metric). */
  private def ivD2Micro(v: String, c: String): String =
    s"CAST(floor(list_aggregate(list_transform(range(64), i -> " +
      s"($v[i+1] - $c[i+1]) * ($v[i+1] - $c[i+1])), 'sum') * 1000000) AS BIGINT)"

  /** EXACT (double) squared L2 — KMeans.assign / IvfGenerator.nearestCells
    * both compare un-quantized doubles (serving metric). */
  private def ivD2(v: String, c: String): String =
    s"list_aggregate(list_transform(range(64), i -> " +
      s"($v[i+1] - $c[i+1]) * ($v[i+1] - $c[i+1])), 'sum')"

  /** One Lloyd iteration of KMeans.train over the chunk-embedding CTE
    * `ivemb(id, v)` (the ann_ivf_trained replay re-keyed to chunk ids):
    * micro-L2 argmin assignment (lowest-cid ties), integer micro-sum
    * update with means (sm/n)/10⁶, empty cells keep their centroid. */
  private def ivLloydIterSql(cbIn: String, n: Int): String =
    s"""ivd$n AS (SELECT e.id, cb.cid, ${ivD2Micro("e.v", "cb.c")} AS d2
       |          FROM ivemb e CROSS JOIN $cbIn cb),
       |iva$n AS (SELECT id, cid FROM
       |          (SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM ivd$n)
       |          WHERE rn = 1),
       |ivu$n AS (SELECT a.cid, ks.k,
       |                 sum(CAST(floor(e.v[ks.k+1] * 1000000) AS BIGINT)) AS sm,
       |                 count(*) AS n
       |          FROM iva$n a JOIN ivemb e USING (id) CROSS JOIN ivks ks
       |          GROUP BY a.cid, ks.k),
       |ivcb$n AS (SELECT c0.cid, coalesce(u.c, c0.c) AS c
       |           FROM $cbIn c0 LEFT JOIN
       |             (SELECT cid, list((sm::DOUBLE / n) / 1000000.0 ORDER BY k) AS c
       |              FROM ivu$n GROUP BY cid) u ON u.cid = c0.cid)""".stripMargin

  /** hybrid_search_ann's exact DuckDB replay — the flagship e2e chain with
    * the semantic branch served through the PERSISTED IVF index exactly as
    * the live Engine facade serves it (round-10 graduation; D19 benchmark
    * mode freezes the D17 EMA so the facade's output is machine-speed-
    * independent): KMeans.train over the chunk embeddings (init = first 8
    * chunks by id, 2 micro-quantized Lloyd rounds — the ann_ivf_trained
    * replay re-keyed), final assignment by EXACT double L2 argmin
    * (KMeans.assign), SQ8 serving columns (scale 127/max|x|, floor codes,
    * float norm — AnnIndex.withSq8), per-query probe of the 3 nearest
    * cells by double L2 (IvfGenerator.nearestCells), phase-1 approximate
    * cosine over the integer codes with the 4× overfetch cut, phase-2
    * exact-cosine rerank of the survivors, then the SAME intent-weighted
    * RRF fusion/boost/stability scoring as hybrid_search_e2e. The keyword
    * branch and every constant are shared with the e2e oracle verbatim. */
  private val HybridAnnOracleSql: String =
    "WITH RECURSIVE\n" + E2EChainSql + s""",
        |ivks AS (SELECT unnest(range(64)) AS k),
        |ivemb AS (SELECT substr(k, 2)::BIGINT AS id, v FROM emb WHERE k LIKE 'c%'),
        |ivcb0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cid, v AS c
        |          FROM (SELECT * FROM ivemb ORDER BY id LIMIT $AnnCells)),
        |${ivLloydIterSql("ivcb0", 1)},
        |${ivLloydIterSql("ivcb1", 2)},
        |ivdf AS (SELECT e.id, cb.cid, ${ivD2("e.v", "cb.c")} AS d2
        |         FROM ivemb e CROSS JOIN ivcb2 cb),
        |ivasg AS (SELECT id, cid FROM
        |          (SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn FROM ivdf)
        |          WHERE rn = 1),
        |ivsq AS (SELECT id,
        |           127.0 / greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) AS s,
        |           sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm,
        |           v
        |         FROM ivemb),
        |ivcode AS (SELECT id, list_transform(v, x -> floor(x * s)) AS code, s, nrm FROM ivsq),
        |ivqn AS (SELECT q.qi, sqrt(list_aggregate(list_transform(qe.v, x -> x * x), 'sum')) AS qnorm
        |         FROM qmeta q JOIN emb qe ON qe.k = 'q' || q.qi),
        |ivprobe AS (SELECT qi, cid FROM (
        |    SELECT q.qi, cb.cid,
        |           row_number() OVER (PARTITION BY q.qi
        |             ORDER BY ${ivD2("qe.v", "cb.c")}, cb.cid) AS rn
        |    FROM qmeta q JOIN emb qe ON qe.k = 'q' || q.qi CROSS JOIN ivcb2 cb)
        |  WHERE rn <= $AnnNprobe),
        |ivph1 AS (SELECT qi, id FROM (
        |    SELECT p.qi, c.id, m.factor,
        |           row_number() OVER (PARTITION BY p.qi ORDER BY
        |             (CASE WHEN c.nrm > 0 THEN
        |                list_dot_product(c.code, qe.v) / c.s / (c.nrm * qn.qnorm)
        |              ELSE -1.0 END) DESC, c.id) AS rn
        |    FROM ivprobe p
        |    JOIN ivasg a ON a.cid = p.cid
        |    JOIN ivcode c ON c.id = a.id
        |    JOIN qmeta m ON m.qi = p.qi
        |    JOIN emb qe ON qe.k = 'q' || p.qi
        |    JOIN ivqn qn ON qn.qi = p.qi)
        |  WHERE rn <= factor * 5 * 4),
        |ivsem AS (SELECT qi, id, sem_rank FROM (
        |    SELECT s.qi, s.id, m.factor,
        |           row_number() OVER (PARTITION BY s.qi ORDER BY
        |             list_cosine_similarity(ce.v, qe.v) DESC, s.id) AS sem_rank
        |    FROM ivph1 s
        |    JOIN emb ce ON ce.k = 'c' || s.id
        |    JOIN qmeta m ON m.qi = s.qi
        |    JOIN emb qe ON qe.k = 'q' || s.qi)
        |  WHERE sem_rank <= factor * 5),
        |ivfused AS (SELECT coalesce(s.qi, k.qi) AS qi, coalesce(s.id, k.id) AS id,
        |                   s.sem_rank, k.kw_rank
        |            FROM ivsem s FULL OUTER JOIN kw k ON k.qi = s.qi AND k.id = s.id),
        |ivscored AS (SELECT f.qi, f.id, c.doc_id, c.chunk_type, m.query,
        |               coalesce(m.semw / (60.0 + f.sem_rank), 0.0)
        |                 + coalesce(m.kww / (60.0 + f.kw_rank), 0.0)
        |                 + CASE WHEN f.sem_rank IS NOT NULL AND c.chunk_type = m.btype THEN m.bboost ELSE 0.0 END
        |                 + 1.0 * m.mult * 0.1 AS score
        |             FROM ivfused f JOIN cht c ON c.id = f.id JOIN qmeta m ON m.qi = f.qi)
        |SELECT query, row_number() OVER (PARTITION BY qi ORDER BY score DESC, id) AS rank,
        |       id AS chunk_id, doc_id, chunk_type,
        |       CAST(floor(score * 1000000) AS BIGINT) AS score_micro
        |FROM ivscored QUALIFY rank <= 5 ORDER BY qi, rank""".stripMargin

  /** D14's oracle: the anchor search runs at k = 1, so its overfetch
    * depth is factor·1 = 3 — NOT the e2e chain's factor·5 — and the
    * candidate slices re-cut from the unfiltered rank CTEs (semr/kwr)
    * accordingly. The rank-1 hit of that depth-3 fusion anchors the ±2
    * chunk_idx window, chunk TEXTS byte-exact from the fold. */
  private val D14OracleSql: String =
    "WITH RECURSIVE\n" + E2EChainSql + """,
        |sem3 AS (SELECT id, sem_rank FROM semr WHERE qi = 0 AND sem_rank <= 3),
        |kw3 AS (SELECT id, kw_rank FROM (
        |          SELECT id, row_number() OVER (ORDER BY kw_score DESC, id) AS kw_rank
        |          FROM kwr WHERE qi = 0 AND kw_score > 0)
        |        WHERE kw_rank <= 3),
        |f3 AS (SELECT coalesce(s.id, k.id) AS id, s.sem_rank, k.kw_rank
        |       FROM sem3 s FULL OUTER JOIN kw3 k ON k.id = s.id),
        |sc3 AS (SELECT f.id,
        |          coalesce(0.35::DOUBLE / (60.0 + f.sem_rank), 0.0)
        |            + coalesce(0.65::DOUBLE / (60.0 + f.kw_rank), 0.0)
        |            + CASE WHEN f.sem_rank IS NOT NULL AND c.chunk_type = 'definition'
        |                   THEN 0.5::DOUBLE ELSE 0.0 END
        |            + 1.0 * 2.0::DOUBLE * 0.1 AS score
        |        FROM f3 f JOIN cht c ON c.id = f.id),
        |top1 AS (SELECT id FROM sc3
        |         QUALIFY row_number() OVER (ORDER BY score DESC, id) = 1),
        |tgt AS (SELECT c.doc_id AS t_doc, c.chunk_idx AS t_idx
        |        FROM cht c JOIN top1 ON top1.id = c.id)
        |SELECT c.id, c.doc_id, c.chunk_idx::BIGINT AS chunk_idx, c.chunk_text AS text_chunk
        |FROM cht c JOIN tgt ON c.doc_id = tgt.t_doc
        |  AND c.chunk_idx BETWEEN tgt.t_idx - 2 AND tgt.t_idx + 2
        |ORDER BY chunk_idx""".stripMargin


  /** E8's oracle — the deep-dive orchestration composed from proven
    * replays: the e2e chain's Definition top-5 (k=5, so the chain's
    * depth-15 ranks ARE the anchor slate), ±2 context windows joined
    * byte-exact, the hash-ngram embedder over the five context texts,
    * Synthesis.cosine as ordered double folds, the greedy single-link
    * anchor fold as a recursive CTE, lead-sentence claims (b9 split
    * mirror, 80-char cap) and mean-of-cited-scores confidence with the
    * member-ordered sum. */
  private[queries] val E8OracleSql: String =
    "WITH RECURSIVE\n" + E2EChainSql + """,
        |top5 AS (SELECT id, score, row_number() OVER (ORDER BY score DESC, id) - 1 AS hidx
        |         FROM scored WHERE qi = 0 QUALIFY row_number() OVER (ORDER BY score DESC, id) <= 5),
        |ctx AS (SELECT t.hidx, string_agg(c2.chunk_text, ' ' ORDER BY c2.chunk_idx) AS txt
        |        FROM top5 t JOIN cht c ON c.id = t.id
        |        JOIN cht c2 ON c2.doc_id = c.doc_id
        |          AND c2.chunk_idx BETWEEN c.chunk_idx - 2 AND c.chunk_idx + 2
        |        GROUP BY t.hidx),
        |xin AS (SELECT 'x' || hidx AS k, txt FROM ctx),
        |xtk AS (SELECT k, unnest(regexp_extract_all(lower(txt), '[a-z0-9]+')) AS tok FROM xin),
        |xfeat AS (SELECT k, 'w:' || tok AS f FROM xtk
        |          UNION ALL
        |          SELECT k, 'c:' || substr(tok, i::INT + 1, 3)
        |          FROM xtk, unnest(range(greatest(length(tok) - 2, 0))) AS u(i)
        |          WHERE length(tok) >= 3),
        |xh AS (SELECT k, ('0x' || substr(md5('42:' || f), 1, 16))::UBIGINT AS hu FROM xfeat),
        |xcs AS (SELECT k, ((hu // 2) % 64)::BIGINT AS idx,
        |               sum(CASE WHEN hu % 2 = 0 THEN 1 ELSE -1 END)::BIGINT AS cnt
        |        FROM xh GROUP BY k, idx),
        |xdense AS (SELECT e.k, u.i AS idx, coalesce(x.cnt, 0) AS cnt
        |           FROM (SELECT DISTINCT k FROM xin) e CROSS JOIN range(64) u(i)
        |           LEFT JOIN xcs x ON x.k = e.k AND x.idx = u.i),
        |xnrm AS (SELECT k, sum(cnt * cnt)::BIGINT AS n2 FROM xdense GROUP BY k),
        |xemb AS (SELECT d.k,
        |           list((((d.cnt::DOUBLE * (CASE WHEN n.n2 = 0 THEN 0.0 ELSE 1.0 / sqrt(n.n2::DOUBLE) END))::REAL)::DOUBLE) ORDER BY d.idx) AS v
        |         FROM xdense d JOIN xnrm n USING (k) GROUP BY d.k),
        |xpair AS (SELECT a.hidx AS ai, b.hidx AS bi,
        |            list_aggregate(list_transform(range(64), i -> ea.v[i+1] * eb.v[i+1]), 'sum') AS dot,
        |            list_aggregate(list_transform(range(64), i -> ea.v[i+1] * ea.v[i+1]), 'sum') AS na,
        |            list_aggregate(list_transform(range(64), i -> eb.v[i+1] * eb.v[i+1]), 'sum') AS nb
        |          FROM ctx a, ctx b, xemb ea, xemb eb
        |          WHERE b.hidx > a.hidx AND ea.k = 'x' || a.hidx AND eb.k = 'x' || b.hidx),
        |xedge AS (SELECT ai, bi FROM xpair
        |          WHERE na <> 0.0 AND nb <> 0.0 AND dot / (sqrt(na) * sqrt(nb)) > 0.85),
        |xgreedy AS (
        |  SELECT 0::BIGINT AS i, [0::BIGINT] AS anchors
        |  UNION ALL
        |  SELECT g.i + 1,
        |         CASE WHEN (SELECT count(*) FROM xedge e
        |                    WHERE e.bi = g.i + 1 AND list_contains(g.anchors, e.ai)) > 0
        |              THEN g.anchors ELSE list_append(g.anchors, g.i + 1) END
        |  FROM xgreedy g WHERE g.i < (SELECT max(hidx) FROM ctx)),
        |xfin AS (SELECT anchors FROM xgreedy ORDER BY i DESC LIMIT 1),
        |xasg AS (SELECT c.hidx,
        |           CASE WHEN list_contains(f.anchors, c.hidx)
        |                THEN list_position(f.anchors, c.hidx) - 1
        |                ELSE (SELECT min(list_position(f.anchors, e.ai)) - 1
        |                      FROM xedge e WHERE e.bi = c.hidx AND list_contains(f.anchors, e.ai)) END AS cl
        |         FROM ctx c, xfin f),
        |xclaims AS (SELECT a.cl AS claim_idx,
        |              list(a.hidx ORDER BY a.hidx) AS members,
        |              list(t.score ORDER BY a.hidx) AS svals,
        |              min(a.hidx) AS anchor
        |            FROM xasg a JOIN top5 t ON t.hidx = a.hidx GROUP BY a.cl)
        |SELECT c.claim_idx::BIGINT AS claim_idx,
        |       substr(string_split(regexp_replace(ct.txt, '([.?!])\s+', '\1' || chr(1), 'g'), chr(1))[1], 1, 80) AS statement,
        |       array_to_string(c.members, ',') AS sources,
        |       CAST(floor(list_aggregate(c.svals, 'sum') / len(c.svals) * 1000000) AS BIGINT) AS confidence_micro
        |FROM xclaims c JOIN ctx ct ON ct.hidx = c.anchor
        |ORDER BY claim_idx""".stripMargin


  /** D11's oracle: with deterministic repeats the query's rank history is
    * all zeros, so stability is EXACTLY 1.0 (≥ the 0.6 gate) and the
    * trust ≤ 1.0 quarantine is tautological on this corpus (boost = 1,
    * trust = boost·max(0.5, 1 − age/30d) ≤ 1) — injection reduces to
    * "first below-cutoff candidate of the Example query's depth·2 slate
    * with raw cosine > 0.65, spliced at rank 2 behind the top hit".
    * The slate and cosines replay through the e2e chain. */
  /** D15/D16's constant-expectation oracle: the deterministic cache trace
    * the Spark side must reproduce (see the registration's comment for why
    * every row is machine-independent). */
  private val D15CacheOracleSql: String =
    """SELECT * FROM (VALUES
      |  (CAST(1 AS BIGINT),  'exact_hit_canonical',  TRUE,  'r_v1'),
      |  (CAST(2 AS BIGINT),  'exact_miss',           FALSE, ''),
      |  (CAST(3 AS BIGINT),  'semantic_hit_0951',    TRUE,  'r_v1'),
      |  (CAST(4 AS BIGINT),  'semantic_miss_0949',   FALSE, ''),
      |  (CAST(5 AS BIGINT),  'put_time_serve',       TRUE,  'r_v2'),
      |  (CAST(6 AS BIGINT),  'touch_q1',             TRUE,  'r1'),
      |  (CAST(7 AS BIGINT),  'evicted_lru_q2',       FALSE, ''),
      |  (CAST(8 AS BIGINT),  'touched_survives_q1',  TRUE,  'r1'),
      |  (CAST(9 AS BIGINT),  'newest_present_q4',    TRUE,  'r4'),
      |  (CAST(10 AS BIGINT), 'size_at_capacity',     TRUE,  '3')
      |) AS t(step, label, hit, served)""".stripMargin

  private val D11OracleSql: String =
    "WITH RECURSIVE\n" + E2EChainSql + """,
        |col40 AS (SELECT sc.id, se.sem_rank,
        |                 row_number() OVER (ORDER BY sc.score DESC, sc.id) AS pos
        |          FROM (SELECT * FROM scored WHERE qi = 3) sc
        |          LEFT JOIN sem se ON se.qi = 3 AND se.id = sc.id
        |          QUALIFY row_number() OVER (ORDER BY sc.score DESC, sc.id) <= 40),
        |d11p AS (SELECT s.id, s.pos,
        |           CASE WHEN s.sem_rank IS NOT NULL THEN
        |             (SELECT list_cosine_similarity(ce.v, qe.v) FROM emb ce, emb qe
        |              WHERE ce.k = 'c' || s.id AND qe.k = 'q3') ELSE 0.0 END AS sems
        |         FROM col40 s),
        |probe AS (SELECT id, pos FROM d11p WHERE pos > 5 AND sems > 0.65 ORDER BY pos LIMIT 1),
        |outx AS (
        |  SELECT 1 AS rank, id, FALSE AS is_exploration FROM col40 WHERE pos = 1
        |  UNION ALL
        |  SELECT 2, id, TRUE FROM probe
        |  UNION ALL
        |  SELECT CASE WHEN EXISTS (SELECT 1 FROM probe) THEN pos + 1 ELSE pos END, id, FALSE
        |  FROM col40 WHERE pos BETWEEN 2 AND (CASE WHEN EXISTS (SELECT 1 FROM probe) THEN 4 ELSE 5 END))
        |SELECT rank::BIGINT AS rank, id AS chunk_id, is_exploration,
        |       1000000::BIGINT AS stability_micro
        |FROM outx ORDER BY rank""".stripMargin

  val all: Seq[Q] = Seq(

    // A3+C1+D1–D8+D12 composed: the flagship ingest→index→hybrid-search
    // pipeline — ORACLE-GREEN since round 9 (the driver's smoke-check
    // query is now hash-exact against a full DuckDB replay; see
    // E2EOracleSql).
    Q("hybrid_search_e2e", E2EOracleSql) { (spark, dir) => hybridSearch(spark, dir) },

    // D2 scale path LIVE: the same hybrid pipeline with the semantic branch
    // fed by the PERSISTED IVF cell index instead of the exact full scan.
    // Engine.index() trains + writes the cid-partitioned index (annMode=
    // "ivf"); each search probes its nprobe nearest cells — the parquet
    // scan prunes to those cid= partitions (asserted in AnnEngineSpec).
    // ORACLE-GREEN since round 10: D19 benchmark mode (setBenchmarkingMode,
    // vector_store.cpp:576-579) freezes the D17 latency EMA at its seed so
    // the facade's ranked output is machine-speed-independent, and the
    // whole serving path — Lloyd training, double-L2 cell assignment, SQ8
    // phase-1 + 4× overfetch, exact rerank, RRF fusion — replays in
    // HybridAnnOracleSql. EngineFacadeSpec pins that the frozen-EMA flag
    // never changes results on a fast machine (live-path parity).
    // Index-BUILD throughput row (round-12 verdict task 6): the warm
    // flagship below measures SERVING; this row measures the build it
    // amortizes — chunk + embed + versioned table write + posting build
    // + IVF train + persist on a FRESH workspace every call (deliberately
    // uncached: at 100 TB the build IS the ingest SLA, and a committed
    // trend for it is what catches an ingest-path regression). Oracle:
    // the chunk count the build must land on — the TextChunker fold
    // replayed per document (the foldCtes spec, B9OracleSql).
    Q("ann_index_build",
      """WITH RECURSIVE
        |sec AS (SELECT doc_id::VARCHAR AS source, coalesce(text, '') AS text FROM documents),
        |""".stripMargin + B9OracleSql.foldCtes + """
        |SELECT count(*)::BIGINT AS n_chunks FROM chunks""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val root = graft.util.TempRoot.dir("ann-build-").toString
      val e = graft.api.Engine.open(spark, root, "main",
        SearchOptions(annMode = "ivf", annCells = 8, annProbes = 3,
          benchmarkMode = true))
      // close immediately: the engine is discarded after the count, and a
      // bench window (runs ≥ 3) plus the gate would otherwise stack
      // corpus-scale temp workspaces on disk until the shutdown hook
      try {
        val n = e.index(table(spark, dir, "documents"))
        Seq(n).toDF("n_chunks")
      } finally {
        e.close() // flush + unpersist the build's pinned blocks
        graft.util.TempRoot.deleteRecursively(java.nio.file.Paths.get(root))
      }
    },

    Q("hybrid_search_ann", HybridAnnOracleSql) { (spark, dir) =>
      import spark.implicits._
      // Index ONCE per (session, corpus), serve on every call — the real
      // serving architecture (the reference's ingest phase is separate
      // from the vector_store hot path, and a persisted index exists to
      // be reused). Bench min-of-n therefore measures the WARM serving
      // path, not a per-run rebuild of the whole workspace. Repeat
      // searches exercise the full ANN probe each time: the D15 query
      // cache is disabled under the default deterministic=true
      // (HybridEngine cache `enabled = !opts.deterministic`).
      val engine = annServeCache.getOrBuild((spark, dir)) {
        val root = graft.util.TempRoot.dir("ann-ws-").toString
        val e = graft.api.Engine.open(spark, root, "main",
          SearchOptions(annMode = "ivf", annCells = 8, annProbes = 3,
            benchmarkMode = true))
        e.index(table(spark, dir, "documents"))
        e
      }
      val queries = Seq(
        "what is a merge window",
        "how to hash a partition: steps",
        "summary of scan and sort",
        "example of a vector batch")
      // concurrent independent searches (§2.6; see searchAll): sound here
      // because benchmarkMode freezes the D17 EMA (no cross-search state),
      // MMR/exploration/rerank are off, and engine() init is synchronized
      queries.zip(searchAll(queries)(engine.search(_, k = 5))).flatMap { case (q, res) =>
        res.zipWithIndex.map { case (c, i) =>
          (q, (i + 1).toLong, c.id, c.docId, c.chunkType, math.floor(c.score * 1e6).toLong)
        }
      }.toDF("query", "rank", "chunk_id", "doc_id", "chunk_type", "score_micro")
    },

    // D10 — adaptive MMR diversification (the REAL Mmr.lambda/docEntropy/
    // select code the engine calls) over a deterministic top-30 slate:
    // relevance = MICRO-FLOORED cosine to query vector 0 (floor(c·10⁶)/10⁶
    // is the same double in both engines, so every greedy comparison
    // replays), doc/heading keys = vec_id mod 7/3 (both penalties fire).
    // The 5-word query pins λ = σ(0) = 0.5 EXACTLY (no exp-library
    // dependence in the weights). The oracle unrolls the 10 greedy picks
    // as CTE steps — the pqIterSql technique applied to selection: each
    // step takes argmax(mmr) over the un-picked pool with the Scala
    // tie-break (mmr desc, score desc, id asc — the pool is score-sorted
    // and the scan keeps the first strict max). Entropy sums in pinned
    // (count, doc) order; its ulp-level library variance only shifts all
    // repeated-doc penalties together, never a comparison at the 10⁻⁴
    // score scale. Greedy-over-top-N is driver-side BY DESIGN (the
    // reference collapses to in-memory vectors at exactly this point,
    // vector_store.cpp:460-554); the engine-path MMR (full hybrid search
    // with experimentalMmr) stays covered by EngineEdgeSpec + Mmr specs.
    Q("d10_mmr_diversify", mmrOracleSql) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.VectorFunctions.cosineSim
      import graft.model.{Intent, ScoredChunk}
      import graft.search.Mmr
      val e = table(spark, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
      val cands = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          (floor(cosineSim(col("embedding"), typedlit(qv)) * 1e6) / lit(1e6)).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(MmrSlate)
        .collect()
        .map { r =>
          val id = r.getLong(0)
          ScoredChunk(id = id, docId = (id % 7).toString, headingPath = "h" + (id % 3),
            chunkType = "", text = "", score = r.getDouble(1), semScore = r.getDouble(1),
            semanticRank = 0, keywordRank = 0, trustScore = 1.0, isExploration = false)
        }.toSeq
      val lam = Mmr.lambda("diversify the retrieved result set", Intent.General)
      val sel = Mmr.select(cands, k = MmrK, lam, Mmr.docEntropy(cands))
      sel.selected.zipWithIndex.map { case (c, i) =>
        ((i + 1).toLong, c.id, c.docId, math.floor(c.score * 1e6).toLong)
      }.toDF("rank", "chunk_id", "doc_key", "score_micro")
    },

    // D11 — exploration injection (stability-gated on query history; the
    // probe itself also requires a below-cutoff candidate with raw cosine
    // > 0.65, so whether one appears is corpus-dependent — the
    // EngineEdgeSpec fixture forces it deterministically).
    Q("d11_exploration", D11OracleSql) { (spark, dir) =>
      import spark.implicits._
      val engine = new HybridEngine(spark, chunksFor(spark, dir),
        SearchOptions(enableExploration = true))
      val q = "example of a vector batch"
      // repeat the query to build a stable history, then observe injection
      (1 to 3).foreach(_ => engine.search(q, embedder, 5))
      engine.search(q, embedder, 5).zipWithIndex.map { case (c, i) =>
        ((i + 1).toLong, c.id, c.isExploration,
          math.floor(engine.stability(q) * 1e6).toLong)
      }.toDF("rank", "chunk_id", "is_exploration", "stability_micro")
    },

    // D14 — context-window expansion around a hit (self-join on
    // (doc_id, chunk_idx) range; broadcast target). ORACLE-GREEN since
    // round 9: the live search that anchors it replays through the e2e
    // chain, and the window slice carries byte-exact chunk texts.
    Q("d14_context_expand", D14OracleSql) { (spark, dir) =>
      val engine = new HybridEngine(spark, chunksFor(spark, dir))
      val top = engine.search("what is a merge window", embedder, 1)
      engine.context(top.head.id, offset = 2)
        .withColumn("chunk_idx", col("chunk_idx").cast("long"))
    },

    // D15/D16 — exact + semantic query cache (driver-side LRU,
    // vector_store.cpp:281-300). ORACLE-GREEN since round 11 via a
    // constant-expectation oracle (the q_approx_distinct precedent: the
    // oracle pins a deterministic contract rather than replaying
    // internals): the trace below is fully deterministic — exact unit
    // vectors straddle the 0.95 threshold by ±1e-3 (float32 rounding
    // ~6e-8, three orders of magnitude inside the margin), LRU eviction
    // order is fixed by the access sequence, and the served values are
    // pinned at put() time — so the oracle is the expected trace itself,
    // and ANY behavioral regression (canonicalization, threshold
    // strictness, access-order eviction, put-time result pinning, size
    // accounting) flips a row and fails the hash gate.
    Q("d15_query_cache", D15CacheOracleSql) { (spark, dir) =>
      import spark.implicits._
      // unit(c) = (c, sqrt(1-c²), 0, 0): cosine with unit(1.0) is exactly
      // c up to float32 rounding (same geometry as EngineEdgeSpec).
      def unit(c: Double): Array[Float] = {
        val v = new Array[Float](4)
        v(0) = c.toFloat; v(1) = math.sqrt(1.0 - c * c).toFloat
        v
      }
      def basis(i: Int): Array[Float] = {
        val v = new Array[Float](4); v(i) = 1.0f; v
      }
      val t = Seq.newBuilder[(Long, String, Boolean, String)]
      def row(step: Long, label: String, got: Option[String]): Unit =
        t += ((step, label, got.isDefined, got.getOrElse("")))

      // --- canonicalization + threshold straddle + put-time serve
      val a = new QueryCache[String](capacity = 3, semanticThreshold = 0.95)
      a.put("Merge Window Hash", unit(1.0), "r_v1")
      row(1, "exact_hit_canonical", a.getExact("  merge window HASH "))
      row(2, "exact_miss", a.getExact("no such query"))
      row(3, "semantic_hit_0951", a.getSemantic(unit(0.951)))
      row(4, "semantic_miss_0949", a.getSemantic(unit(0.949)))
      a.put("Merge Window Hash", unit(1.0), "r_v2")
      row(5, "put_time_serve", a.getSemantic(unit(0.951)))

      // --- LRU eviction at capacity (access-order: touching q1 makes q2
      // the eldest, so the overflow put of q4 evicts q2, not q1)
      val b = new QueryCache[String](capacity = 3, semanticThreshold = 0.95)
      b.put("q1", basis(0), "r1"); b.put("q2", basis(1), "r2")
      b.put("q3", basis(2), "r3")
      row(6, "touch_q1", b.getExact("q1"))
      b.put("q4", basis(3), "r4")
      row(7, "evicted_lru_q2", b.getExact("q2"))
      row(8, "touched_survives_q1", b.getExact("q1"))
      row(9, "newest_present_q4", b.getExact("q4"))
      t += ((10L, "size_at_capacity", b.size == 3, b.size.toString))
      t.result().toDF("step", "label", "hit", "served")
    },

    // E2/E3 — rerank score calibration (EMA, drift reset, z-reject,
    // sigmoid) over four fixed batches; the oracle unrolls the stats fold
    // as CTE steps and normalizes each score against its post-update
    // stats — bit-for-bit the Calibration.calibrate sequence.
    Q("e2_calibration", calibrationOracleSql) { (spark, dir) =>
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
          (name, i.toLong, math.floor(s * 1e6).toLong, frozen,
            math.floor(next.mean * 1e6).toLong)
        }
      }.toDF("batch", "idx", "calibrated_micro", "is_frozen", "mean_micro")
    },

    // E5 — greedy single-link semantic clustering of retrieved contexts,
    // ORACLE-GREEN (round 9): the five-text fixture embeds through the
    // REAL hash-ngram embedder and clusters via Synthesis.clusterContexts;
    // DuckDB replays the embedder coordinate-exact (the
    // c1_embed_hash_coords machinery over a VALUES table), the ordered
    // double-fold cosine, and the greedy anchor fold as a recursive CTE
    // (anchors accumulate in index order; a member joins the FIRST anchor
    // whose cosine clears 0.85 — single-link, not transitive closure).
    Q("e5_fact_clustering",
      """WITH RECURSIVE
        |txts(ctx_idx, text) AS (VALUES (0::BIGINT, 'the merge window hash'), (1, 'the merge window hash!'),
        |  (2, 'scan sort filter table'), (3, 'scan sort filter tables'), (4, 'completely unrelated payload')),
        |tk AS (SELECT ctx_idx, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM txts),
        |feat AS (SELECT ctx_idx, 'w:' || tok AS f FROM tk
        |         UNION ALL
        |         SELECT ctx_idx, 'c:' || substr(tok, i::INT + 1, 3)
        |         FROM tk, unnest(range(greatest(length(tok) - 2, 0))) AS u(i)
        |         WHERE length(tok) >= 3),
        |h AS (SELECT ctx_idx, ('0x' || substr(md5('42:' || f), 1, 16))::UBIGINT AS hu FROM feat),
        |cs AS (SELECT ctx_idx, ((hu // 2) % 64)::BIGINT AS idx,
        |              sum(CASE WHEN hu % 2 = 0 THEN 1 ELSE -1 END)::BIGINT AS cnt
        |       FROM h GROUP BY ctx_idx, idx),
        |dense AS (SELECT t.ctx_idx, u.i AS idx, coalesce(cs.cnt, 0) AS cnt
        |          FROM txts t CROSS JOIN range(64) u(i)
        |          LEFT JOIN cs ON cs.ctx_idx = t.ctx_idx AND cs.idx = u.i),
        |nrm AS (SELECT ctx_idx, sum(cnt * cnt)::BIGINT AS n2 FROM dense GROUP BY ctx_idx),
        |emb AS (SELECT d.ctx_idx,
        |               list((((d.cnt::DOUBLE * (CASE WHEN n.n2 = 0 THEN 0.0 ELSE 1.0 / sqrt(n.n2::DOUBLE) END))::REAL)::DOUBLE) ORDER BY d.idx) AS v
        |        FROM dense d JOIN nrm n USING (ctx_idx) GROUP BY d.ctx_idx),
        |pair AS (SELECT a.ctx_idx AS ai, b.ctx_idx AS bi,
        |           list_aggregate(list_transform(range(64), i -> a.v[i+1] * b.v[i+1]), 'sum') AS dot,
        |           list_aggregate(list_transform(range(64), i -> a.v[i+1] * a.v[i+1]), 'sum') AS na,
        |           list_aggregate(list_transform(range(64), i -> b.v[i+1] * b.v[i+1]), 'sum') AS nb
        |         FROM emb a JOIN emb b ON b.ctx_idx > a.ctx_idx),
        |edge AS (SELECT ai, bi FROM pair
        |         WHERE na <> 0.0 AND nb <> 0.0 AND dot / (sqrt(na) * sqrt(nb)) > 0.85),
        |greedy AS (
        |  SELECT 0::BIGINT AS i, [0::BIGINT] AS anchors
        |  UNION ALL
        |  SELECT g.i + 1,
        |         CASE WHEN (SELECT count(*) FROM edge e
        |                    WHERE e.bi = g.i + 1 AND list_contains(g.anchors, e.ai)) > 0
        |              THEN g.anchors ELSE list_append(g.anchors, g.i + 1) END
        |  FROM greedy g WHERE g.i < 4),
        |fin AS (SELECT anchors FROM greedy WHERE i = 4),
        |asg AS (SELECT t.ctx_idx, t.text,
        |          CASE WHEN list_contains(f.anchors, t.ctx_idx)
        |               THEN list_position(f.anchors, t.ctx_idx) - 1
        |               ELSE (SELECT min(list_position(f.anchors, e.ai)) - 1
        |                     FROM edge e WHERE e.bi = t.ctx_idx AND list_contains(f.anchors, e.ai)) END AS cluster
        |        FROM txts t, fin f)
        |SELECT ctx_idx, text, cluster::BIGINT AS cluster FROM asg ORDER BY ctx_idx""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val texts = Seq(
        "the merge window hash", "the merge window hash!", // near-identical
        "scan sort filter table", "scan sort filter tables",
        "completely unrelated payload")
      val embs = texts.map(embedder.embed)
      val clusters = Synthesis.clusterContexts(embs, threshold = 0.85)
      texts.zip(clusters).zipWithIndex
        .map { case ((t, c), i) => (i.toLong, t, c.toLong) }
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
