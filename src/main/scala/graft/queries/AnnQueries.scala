package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions.{cosineSim, dotProduct, pqEncode, signLshBuckets}

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * `ann_bruteforce_topk` is the exact baseline: broadcast the (tiny) query
  * set against a single scan of the corpus, per-query top-k via window rank —
  * per-partition partial top-k, one shuffle of k·|Q| rows.
  *
  * `ann_lsh_bucketed` is the scale path: an 8-bit sign-LSH signature
  * (hyperplanes drawn deterministically from the corpus) buckets the corpus;
  * each query only scans its own bucket — at 1000 executors the bucket id is
  * the shuffle/partition key and the full-corpus scan disappears.
  */
object AnnQueries {

  private val NumQueries = 5
  private val K = 10
  // auto-geometry sample size + table budget (ann_lsh_auto_geometry)
  private val GeoQueries = 16
  private val GeoTables = 8
  private val HpLo = 8
  private val HpHi = 15 // 8 hyperplanes → 256 buckets

  // Product quantization geometry: 64-dim vectors → 8 subspaces × 8 dims,
  // 16 centroids per subspace (codebook rows CbLo..CbHi), 4-bit codes.
  private val SubSpaces = 8
  private[queries] val SubDim = 8
  private val CbLo = 16
  private val CbHi = 31

  // IVF coarse-quantizer centroids for ann_ivfpq (16 cells; distinct from
  // the PQ-init rows so the two quantizers are independent).
  private val IvfLo = 32
  private val IvfHi = 47

  // Multi-vector MaxSim geometry: 4-vector bags, the first bag (vec_ids
  // 0..3) is the query; corpus docs start at the second bag.
  private val MaxSimBag = 4
  private val MaxSimQ = 4

  // ADC-slate size for the refine stage: output k (20) × the FAISS-style
  // refine overfetch — the exact pass reads this many float vectors.
  private val RefineSlate = 20 * graft.search.IvfGenerator.PqRefineOverfetch

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")

  /** The deterministic untrained codebook: corpus rows CbLo..CbHi — the
    * trainer's init (and the recall-improvement baseline in AnnEngineSpec). */
  private[graft] def standinCodebook(spark: SparkSession, dir: String): Seq[Seq[Float]] =
    embeddings(spark, dir).filter(col("vec_id").between(CbLo, CbHi))
      .select((col("vec_id") - CbLo).cast("int").as("j"), col("embedding"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toSeq).sortBy(_._1).map(_._2).toSeq

  // trained codebook per (session, sfdir): the query and the recall spec
  // share one training run — re-training for each caller would duplicate
  // the 2-iteration Lloyd job on identical data
  private val cbCache =
    new graft.util.SessionCache[(SparkSession, String), Seq[Seq[Float]]](8)

  private[graft] def trainedCodebook(spark: SparkSession, dir: String): Seq[Seq[Float]] =
    cbCache.getOrBuild((spark, dir))(
      graft.ml.KMeans.trainPq(embeddings(spark, dir), "embedding", SubDim,
        standinCodebook(spark, dir), iters = 2))

  /** Scan-local cell assignment PLUS the IVFADC residual: each row gets
    * its argmax-cosine cell (lowest-cid ties, the assignCosineCells
    * contract) and rv = float32(x⁽ᵈ⁾ − centroid(cell)⁽ᵈ⁾) — the vector the
    * PQ codebook is trained on and encodes. Subtracting in double and
    * casting to float is a deterministic IEEE op sequence, so the DuckDB
    * oracle replays the residuals bit-for-bit (same discipline as the
    * trainer's REAL-cast means). Still one broadcast + one scan: the
    * centroid array rides along, nothing shuffles the embeddings. */
  private def assignResiduals(vectors: DataFrame, centsArr: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.cosineSim
    vectors.crossJoin(broadcast(centsArr))
      .withColumn("best", array_max(transform(col("cents"),
        c => struct(cosineSim(col("embedding"), c.getField("ce")).as("cos"),
                    (-c.getField("cid")).as("ncid")))))
      .withColumn("cid", -col("best").getField("ncid"))
      .withColumn("cent", element_at(
        filter(col("cents"), c => c.getField("cid") === col("cid")), 1).getField("ce"))
      .select(col("vec_id"), col("embedding"), col("cid"),
        zip_with(col("embedding"), col("cent"),
          (x, y) => (x.cast("double") - y.cast("double")).cast("float")).as("rv"))
  }

  private def ivfCentRows(e: DataFrame): DataFrame =
    e.filter(col("vec_id").between(IvfLo, IvfHi))
      .select((col("vec_id") - IvfLo).as("cid"), col("embedding").as("ce"))

  // residual-PQ codebook per (session, sfdir) — trained on x − centroid
  // (FAISS IVFADC): within a cell the vectors share their centroid
  // component, so raw-vector codes degenerate exactly where IVF routes
  // queries; residual codes spend all 4 bits on the in-cell offsets.
  private val rcbCache =
    new graft.util.SessionCache[(SparkSession, String), Seq[Seq[Float]]](8)

  private[graft] def residualCodebook(spark: SparkSession, dir: String): Seq[Seq[Float]] =
    rcbCache.getOrBuild((spark, dir)) {
      val rf = assignResiduals(embeddings(spark, dir),
        centArray(ivfCentRows(embeddings(spark, dir)))).localCheckpoint()
      try {
        val init = rf.filter(col("vec_id").between(CbLo, CbHi))
          .select(col("vec_id").cast("int").as("j"), col("rv"))
          .collect().map(r => (r.getInt(0) - CbLo) -> r.getSeq[Float](1).toSeq)
          .sortBy(_._1).map(_._2).toSeq
        graft.ml.KMeans.trainPq(rf, "rv", SubDim, init, iters = 2)
      } finally graft.functions.Checkpoints.release(rf)
    }

  /** The per-query ADC lookup table: 8×16 query-to-centroid micro-distances
    * computed ONCE driver-side (the float→double subtract/multiply/left-fold
    * is the exact op sequence both engines run, so the integers are
    * bit-identical) and inlined as a literal. At cluster scale this is the
    * per-query LUT broadcast; the scan side then touches only code bytes +
    * 8 array lookups per row. */
  private def adcLut(qv: Seq[Float], cb: Seq[Seq[Float]]): Seq[Seq[Long]] =
    (0 until SubSpaces).map { m =>
      cb.map { c =>
        var s = 0.0
        var k = 0
        while (k < SubDim) {
          val d = qv(m * SubDim + k).toDouble - c(m * SubDim + k).toDouble
          s += d * d
          k += 1
        }
        math.floor(s * 1000000).toLong
      }
    }

  /** Per-(query, probe-cell) ADC column for RESIDUAL codes: the query's
    * residual against EACH probed cell gets its own 8×16 micro-floored LUT
    * (the same double-subtract/square/floor sequence as the oracle's
    * pqD2l over qsl), and the row's cid selects its LUT — nprobe tiny
    * literal arrays riding the scan, a CASE per row. Expects a `codes`
    * column (pqEncode over `rv`) and a `cid` column in scope. */
  private def residualAdcColumn(e: DataFrame, qv: Seq[Float],
                                probes: Seq[Long], rcb: Seq[Seq[Float]]): Column = {
    // ONE centroid-row definition (ivfCentRows) — a future change to the
    // IVF id range must not need a second edit here
    val cents: Map[Long, Seq[Float]] = ivfCentRows(e)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    def adcOf(cell: Long): Column = {
      val c = cents(cell)
      val rq = qv.indices.map(i => (qv(i).toDouble - c(i).toDouble).toFloat)
      val lut = adcLut(rq, rcb)
      (0 until SubSpaces)
        .map(m => element_at(typedlit(lut(m)), element_at(col("codes"), m + 1) + 1))
        .reduce(_ + _)
    }
    probes.init.foldRight(adcOf(probes.last)) { (p, acc) =>
      when(col("cid") === lit(p), adcOf(p)).otherwise(acc)
    }
  }

  // ---- DuckDB replay of KMeans.trainPq (shared by ann_pq_adc/ann_ivfpq) ----

  /** Micro-quantized squared L2 between two 1-indexed REAL[SubDim] lists
    * (the exact left-fold PqEncode generates). */
  private def pqD2l(v: String, c: String) =
    s"CAST(floor(list_aggregate(list_transform(range($SubDim), i -> " +
      s"($v[i+1]::DOUBLE - $c[i+1]::DOUBLE) * ($v[i+1]::DOUBLE - $c[i+1]::DOUBLE)), " +
      s"'sum') * 1000000) AS BIGINT)"

  /** One Lloyd iteration: assign by micro-L2 argmin (lowest-j ties), update
    * as integer micro-sums, means float-cast; empty cells keep their
    * centroid slice. */
  private def pqIterSql(cbIn: String, n: Int) =
    s"""d$n AS (SELECT sl.vec_id, sl.m, cb.j, ${pqD2l("sl.v", "cb.c")} AS d2
       |       FROM sl JOIN $cbIn cb ON cb.m = sl.m),
       |a$n AS (SELECT vec_id, m, j FROM
       |        (SELECT vec_id, m, j, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, j) AS rn FROM d$n)
       |       WHERE rn = 1),
       |u$n AS (SELECT a.m, a.j, ks.k,
       |              sum(CAST(floor(sl.v[ks.k+1]::DOUBLE * 1000000) AS BIGINT)) AS sm,
       |              count(*) AS n
       |       FROM a$n a JOIN sl ON sl.vec_id = a.vec_id AND sl.m = a.m CROSS JOIN ks
       |       GROUP BY a.m, a.j, ks.k),
       |cbi$n AS (SELECT c0.m, c0.j, coalesce(u.c, c0.c) AS c
       |       FROM $cbIn c0 LEFT JOIN
       |         (SELECT m, j, list(CAST((sm::DOUBLE / n) / 1000000.0 AS REAL) ORDER BY k) AS c
       |          FROM u$n GROUP BY m, j) u ON u.m = c0.m AND u.j = c0.j)""".stripMargin

  /** CTE chain subspace slices → 2 Lloyd iterations; final codebook = cbi2,
    * corpus slices = sl, subspace/dim ranges = ms/ks. */
  private def pqTrainCtes: String =
    s"""ms AS (SELECT unnest(range($SubSpaces)) AS m),
       |ks AS (SELECT unnest(range($SubDim)) AS k),
       |cb0 AS (SELECT ms.m, vec_id - $CbLo AS j,
       |               list_transform(range($SubDim), k -> embedding[ms.m * $SubDim + k + 1]) AS c
       |        FROM embeddings, ms WHERE vec_id BETWEEN $CbLo AND $CbHi),
       |sl AS (SELECT vec_id, ms.m,
       |              list_transform(range($SubDim), k -> embedding[ms.m * $SubDim + k + 1]) AS v
       |       FROM embeddings, ms),
       |${pqIterSql("cb0", 1)},
       |${pqIterSql("cbi1", 2)}""".stripMargin

  /** Residual-IVFPQ CTE chain (FAISS IVFADC): coarse cells → per-row
    * residual x − centroid(cell) (double subtract, REAL cast — the exact
    * op sequence assignResiduals runs) → the SAME two Lloyd iterations as
    * [[pqTrainCtes]] but over residual slices (`sl` here IS the residual
    * slice table, so [[pqIterSql]] replays unchanged) → per-(probe-cell)
    * query residual slices `qsl` (ADC lookups are asymmetric against the
    * query's residual IN THAT CELL). */
  private def pqResidualCtes: String =
    pqResidualCtesWith("",
      s"probes AS (SELECT cid FROM asn WHERE vec_id = 0 AND rn <= 2)")

  /** [[pqResidualCtes]] with a pluggable probe-cell CTE (and optional
    * extra CTEs between `cells` and `probes`) — the auto-nprobe variant
    * derives the probe count from a measured coverage curve instead of
    * the fixed nprobe=2. */
  private def pqResidualCtesWith(extra: String, probesCte: String): String = {
    val dim = SubSpaces * SubDim
    s"""ivf AS (SELECT vec_id - $IvfLo AS cid, embedding AS ce FROM embeddings
       |        WHERE vec_id BETWEEN $IvfLo AND $IvfHi),
       |asn AS (SELECT e.vec_id, ivf.cid,
       |               row_number() OVER (PARTITION BY e.vec_id
       |                                  ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], ivf.ce::DOUBLE[]) DESC, ivf.cid) AS rn
       |        FROM embeddings e CROSS JOIN ivf),
       |cells AS (SELECT vec_id, cid FROM asn WHERE rn = 1),
       |${if (extra.isEmpty) "" else extra + ",\n"}$probesCte,
       |ms AS (SELECT unnest(range($SubSpaces)) AS m),
       |ks AS (SELECT unnest(range($SubDim)) AS k),
       |res AS (SELECT e.vec_id, cells.cid,
       |               list_transform(range($dim), i ->
       |                 CAST(e.embedding[i+1]::DOUBLE - ivf.ce[i+1]::DOUBLE AS REAL)) AS rv
       |        FROM embeddings e JOIN cells ON cells.vec_id = e.vec_id
       |        JOIN ivf ON ivf.cid = cells.cid),
       |sl AS (SELECT res.vec_id, res.cid, ms.m,
       |              list_transform(range($SubDim), k -> rv[ms.m * $SubDim + k + 1]) AS v
       |       FROM res CROSS JOIN ms),
       |cb0 AS (SELECT m, vec_id - $CbLo AS j, v AS c FROM sl
       |        WHERE vec_id BETWEEN $CbLo AND $CbHi),
       |${pqIterSql("cb0", 1)},
       |${pqIterSql("cbi1", 2)},
       |qsl AS (SELECT p.cid, ms.m,
       |               list_transform(range($SubDim), k ->
       |                 CAST(q.embedding[ms.m * $SubDim + k + 1]::DOUBLE - ivf.ce[ms.m * $SubDim + k + 1]::DOUBLE AS REAL)) AS qv
       |        FROM embeddings q CROSS JOIN probes p JOIN ivf ON ivf.cid = p.cid
       |        CROSS JOIN ms WHERE q.vec_id = 0)""".stripMargin
  }

  /** The shared ADC tail over [[pqResidualCtes]]: per-row code assignment
    * (argmin micro-L2 vs the trained residual codebook, lowest-j ties) and
    * the summed per-(probe-cell) asymmetric lookups. */
  private def residualAdcCtes: String =
    s"""f AS (SELECT sl.vec_id, sl.cid, sl.m, cb.j,
       |             ${pqD2l("sl.v", "cb.c")} AS d2, ${pqD2l("qsl.qv", "cb.c")} AS dq
       |      FROM sl JOIN cbi2 cb ON cb.m = sl.m
       |      JOIN qsl ON qsl.m = sl.m AND qsl.cid = sl.cid
       |      WHERE sl.vec_id <> 0),
       |best AS (SELECT vec_id, cid, m, dq,
       |                row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, j) AS rn
       |         FROM f),
       |adc AS (SELECT vec_id, cid, sum(dq)::BIGINT AS adc_micro
       |        FROM best WHERE rn = 1 GROUP BY vec_id, cid)""".stripMargin

  val all: Seq[Q] = Seq(

    Q("ann_bruteforce_topk",
      s"""SELECT q.vec_id AS q_id, e.vec_id AS n_id,
         |       round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS score,
         |       row_number() OVER (PARTITION BY q.vec_id
         |                          ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC, e.vec_id) AS rank
         |FROM embeddings q CROSS JOIN embeddings e
         |WHERE q.vec_id < $NumQueries AND e.vec_id <> q.vec_id
         |QUALIFY rank <= $K
         |ORDER BY q_id, rank""".stripMargin) { (spark, dir) =>
      val e = embeddings(spark, dir)
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val scored = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          cosineSim(col("embedding"), col("qv")).as("s"))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("s").desc, col("n_id"))))
        .filter(col("rank") <= K)
        .select(col("q_id"), col("n_id"), round(col("s"), 6).as("score"), col("rank").cast("long").as("rank"))
        .orderBy(col("q_id"), col("rank"))
    },

    Q("ann_lsh_bucketed",
      s"""WITH hp AS (SELECT vec_id - $HpLo AS hid, embedding AS he FROM embeddings
         |            WHERE vec_id BETWEEN $HpLo AND $HpHi),
         |bk AS (SELECT e.vec_id, sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], hp.he::DOUBLE[]) > 0
         |                               THEN (1 << hid) ELSE 0 END)::BIGINT AS bucket
         |       FROM embeddings e CROSS JOIN hp GROUP BY e.vec_id),
         |qs AS (SELECT vec_id AS q_id, bucket FROM bk WHERE vec_id < $NumQueries)
         |SELECT qs.q_id, c.vec_id AS n_id,
         |       round(list_cosine_similarity(ce.embedding::DOUBLE[], qe.embedding::DOUBLE[]), 6) AS score,
         |       row_number() OVER (PARTITION BY qs.q_id
         |                          ORDER BY list_cosine_similarity(ce.embedding::DOUBLE[], qe.embedding::DOUBLE[]) DESC, c.vec_id) AS rank
         |FROM qs
         |JOIN bk c ON c.bucket = qs.bucket AND c.vec_id <> qs.q_id
         |JOIN embeddings ce ON ce.vec_id = c.vec_id
         |JOIN embeddings qe ON qe.vec_id = qs.q_id
         |QUALIFY rank <= $K
         |ORDER BY q_id, rank""".stripMargin) { (spark, dir) =>
      val e = embeddings(spark, dir)
      val hp = e.filter(col("vec_id").between(HpLo, HpHi))
        .select((col("vec_id") - HpLo).as("hid"), col("embedding").as("he"))
      // 8-bit signature: one broadcast of 8 hyperplanes, map-side partial agg
      val bk = e.crossJoin(broadcast(hp))
        .groupBy(col("vec_id"))
        .agg(sum(when(dotProduct(col("embedding"), col("he")) > 0,
          expr("shiftleft(1, cast(hid as int))")).otherwise(0)).as("bucket"))
      val qs = bk.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("bucket").as("qbucket"))
      val cands = bk.join(broadcast(qs),
          col("bucket") === col("qbucket") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"))
      val withVecs = cands
        .join(e.select(col("vec_id").as("n_id"), col("embedding").as("nv")), Seq("n_id"))
        .join(broadcast(e.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("qv"))), Seq("q_id"))
        .select(col("q_id"), col("n_id"), cosineSim(col("nv"), col("qv")).as("s"))
      withVecs
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("s").desc, col("n_id"))))
        .filter(col("rank") <= K)
        .select(col("q_id"), col("n_id"), round(col("s"), 6).as("score"), col("rank").cast("long").as("rank"))
        .orderBy(col("q_id"), col("rank"))
    },

    // Multi-table sign-LSH (the Indyk–Motwani construction): L=8
    // independent 8-bit tables, candidates = the UNION of the query's
    // buckets across tables, exact cosine re-rank of that union. The
    // standard fix for single-table LSH's recall collapse (RECALL_r07:
    // 8-hyperplane single-table recall@10 is 0.0 uniform / 0.365
    // clustered — one 256-bucket table leaves ~corpus/256 candidates,
    // far too few): each extra table multiplies the chance a true
    // neighbor shares at least one bucket while costing only one more
    // scan-local signature. Plan shape: all 64 hyperplanes are DRIVER
    // literals (corpus rows — driver-sized by construction), every
    // table's bucket is a scan-local codegen fold, the candidate test is
    // an OR of 8 literal comparisons, and the re-rank is TakeOrdered —
    // ONE corpus scan, zero exchanges, however many tables.
    Q("ann_lsh_multitable",
      s"""WITH hp AS (SELECT (vec_id - 56) // 8 AS tbl, (vec_id - 56) % 8 AS hid,
         |             embedding AS he FROM embeddings WHERE vec_id BETWEEN 56 AND 119),
         |bk AS (SELECT e.vec_id, hp.tbl,
         |         sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], hp.he::DOUBLE[]) > 0
         |                  THEN (1 << hid) ELSE 0 END)::BIGINT AS bucket
         |       FROM embeddings e CROSS JOIN hp GROUP BY e.vec_id, hp.tbl),
         |qb AS (SELECT tbl, bucket FROM bk WHERE vec_id = 0),
         |cand AS (SELECT DISTINCT b.vec_id
         |         FROM bk b JOIN qb ON qb.tbl = b.tbl AND qb.bucket = b.bucket
         |         WHERE b.vec_id <> 0)
         |SELECT c.vec_id AS n_id,
         |       round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS score,
         |       row_number() OVER (ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC, c.vec_id) AS rank
         |FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
         |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
         |QUALIFY rank <= $K ORDER BY rank""".stripMargin) { (spark, dir) =>
      val e = embeddings(spark, dir)
      val hpRows: Seq[Seq[Float]] = e.filter(col("vec_id").between(56, 119))
        .select(col("vec_id"), col("embedding")).collect()
        .sortBy(_.getLong(0)).map(_.getSeq[Float](1).toSeq).toSeq
      // ALL 8 table buckets from ONE codegen expression over ONE flat
      // hyperplane literal — semantically the 64-dot when/sum composition
      // (same index-order double accumulation, so the oracle's sign
      // decisions replay identically), but the plan carries a single
      // node: compile cost stays flat as tables grow
      val bkts = signLshBuckets(col("embedding"), typedlit(hpRows), tables = 8)
      // the query's 8 bucket ids: computed by the SAME expression over
      // the one query row, so signature arithmetic can't diverge (one
      // driver action fetches buckets + vector together)
      val qRow = e.filter(col("vec_id") === 0)
        .select(col("embedding"), bkts.as("qb")).head()
      val qv = qRow.getSeq[Float](0).toSeq
      val qb = qRow.getSeq[Long](1)
      val isCand = (0 until 8).map(t =>
        element_at(col("bkts"), t + 1) === lit(qb(t))).reduce(_ || _)
      e.filter(col("vec_id") =!= 0)
        .withColumn("bkts", bkts)
        .filter(isCand)
        .select(col("vec_id").as("n_id"), cosineSim(col("embedding"), typedlit(qv)).as("s"))
        .orderBy(col("s").desc, col("n_id"))
        .limit(K)
        .select(col("n_id"), round(col("s"), 6).as("score"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("s").desc, col("n_id"))).cast("long").as("rank"))
        .orderBy("rank")
    },

    // Product quantization + asymmetric-distance (ADC) scan — the 100 TB
    // ANN compression path: each vector collapses to an 8×4-bit code, so
    // the scan side carries bytes, not floats. The codebook is TRAINED:
    // two per-subspace Lloyd iterations (graft.ml.KMeans.trainPq) from
    // the deterministic rows-16..31 init, with micro-quantized distances
    // and integer-sum updates so the trained centroids are bit-identical
    // across engines — the oracle replays the identical training.
    // Encoding is SCAN-LOCAL: one literal codebook, a codegen triple-loop
    // argmin per subspace, zero exchanges carrying embeddings.
    Q("ann_pq_adc",
      s"""WITH $pqTrainCtes,
         |qsl AS (SELECT ms.m,
         |               list_transform(range($SubDim), k -> embedding[ms.m * $SubDim + k + 1]) AS qv
         |        FROM embeddings, ms WHERE vec_id = 0),
         |f AS (SELECT sl.vec_id, sl.m, cb.j,
         |             ${pqD2l("sl.v", "cb.c")} AS d2, ${pqD2l("qsl.qv", "cb.c")} AS dq
         |      FROM sl JOIN cbi2 cb ON cb.m = sl.m JOIN qsl ON qsl.m = sl.m
         |      WHERE sl.vec_id <> 0),
         |best AS (SELECT vec_id, m, j, dq,
         |                row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, j) AS rn
         |         FROM f)
         |SELECT vec_id, array_to_string(list(j ORDER BY m), '-') AS code,
         |       sum(dq)::BIGINT AS adc_micro
         |FROM best WHERE rn = 1
         |GROUP BY vec_id
         |ORDER BY adc_micro, vec_id LIMIT 50""".stripMargin) { (spark, dir) =>
      val e = embeddings(spark, dir)
      val cb = trainedCodebook(spark, dir)
      val qv = e.filter(col("vec_id") === 0).select(col("embedding")).head().getSeq[Float](0)
      val lut = adcLut(qv, cb)
      // encode = ONE codegen expression (graft.functions.PqEncode): the
      // whole 16-way × 8-subspace argmin runs as a generated triple loop
      // against the literal trained codebook — same micro-quantized
      // integers and lowest-j tie-break as the oracle's ORDER BY d2, j
      val enc = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          pqEncode(col("embedding"), typedlit(cb.map(_.toSeq)), SubDim).as("codes"))
      val code = array_join(transform(col("codes"), c => c.cast("string")), "-")
      val adc = (0 until SubSpaces)
        .map(m => element_at(typedlit(lut(m)), element_at(col("codes"), m + 1) + 1))
        .reduce(_ + _)
      enc.select(col("vec_id"), code.as("code"), adc.as("adc_micro"))
        .orderBy(col("adc_micro"), col("vec_id"))
        .limit(50)
    },

    // IVF + PQ serving (the FAISS IVFADC shape): the coarse quantizer
    // prunes the scan to the query's nprobe=2 nearest cells, then a
    // trained RESIDUAL-PQ ADC ranks ONLY those cells' vectors —
    // compression and pruning composed, which is how a 100 TB vector
    // corpus actually serves. The codebook is trained on and encodes
    // x − centroid(cell) (Jégou et al.; FAISS IVFADC): vectors within a
    // cell share their centroid component, so raw-vector codes degenerate
    // exactly where IVF routes queries — residual codes spend all 4 bits
    // on in-cell offsets (measured: clustered recall@10 raw 0.085 →
    // residual ≥ uniform, RECALL_r07). Cell assignment + residual are
    // scan-local (broadcast centroid array); probe cells are picked
    // DRIVER-side from one bounded row (the IvfGenerator serving
    // pattern); the ADC LUT is per-(query, probe-cell) against the query
    // residual — nprobe tiny literal arrays, a CASE on the row's cid.
    // Plan: one corpus scan → filter → project → TakeOrdered; zero
    // embedding shuffles.
    Q("ann_ivfpq",
      s"""WITH $pqResidualCtes,
         |$residualAdcCtes
         |SELECT vec_id, cid::BIGINT AS cid, adc_micro
         |FROM adc
         |ORDER BY adc_micro, vec_id LIMIT 20""".stripMargin) { (spark, dir) =>
      val e = embeddings(spark, dir)
      val rcb = residualCodebook(spark, dir)
      val centsArr = centArray(ivfCentRows(e))
      // scan-local coarse assignment + residual (max struct = max cos,
      // then min cid; residual vs the chosen centroid)
      val assigned = assignResiduals(e, centsArr)
      // nprobe=2 probe cells for the query, selected driver-side from ONE
      // bounded row — the per-query planning step of IVF serving
      val rankedCents = array_sort(transform(col("cents"),
        c => struct((-cosineSim(col("embedding"), c.getField("ce"))).as("ncos"),
                    c.getField("cid").as("cid"))))
      val qProbe = e.filter(col("vec_id") === 0).crossJoin(broadcast(centsArr))
        .select(rankedCents.as("rc"))
        .select(element_at(col("rc"), 1).getField("cid").as("c1"),
          element_at(col("rc"), 2).getField("cid").as("c2"))
        .head()
      val probes = Seq(qProbe.getLong(0), qProbe.getLong(1))
      val qv = e.filter(col("vec_id") === 0).select(col("embedding")).head().getSeq[Float](0)
      val adc = residualAdcColumn(e, qv, probes, rcb)
      assigned
        .filter(col("cid").isin(probes: _*) && col("vec_id") =!= 0)
        .select(col("vec_id"), col("cid"),
          pqEncode(col("rv"), typedlit(rcb.map(_.toSeq)), SubDim).as("codes"))
        .select(col("vec_id"), col("cid"), adc.as("adc_micro"))
        .orderBy(col("adc_micro"), col("vec_id"))
        .limit(20)
    },

    // IVFPQ + refine (the FAISS IndexRefine stage): the 4-bit ADC order
    // still carries quantization error even over residual codes, so serve
    // the ADC top k·overfetch and RE-RANK those with the exact distance —
    // the SQ8 two-phase pattern applied to IVFPQ. Phase 1 ranks RESIDUAL
    // codes (same LUT CASE as ann_ivfpq); phase 2 is the exact raw-vector
    // micro-L2 (‖x − q‖² is centroid-independent) over only the bounded
    // slate. Distances are per-subspace micro-floored sums, so the
    // re-rank order is bit-identical cross-engine.
    Q("ann_ivfpq_refined",
      s"""WITH $pqResidualCtes,
         |$residualAdcCtes,
         |cand AS (SELECT vec_id, cid,
         |                row_number() OVER (ORDER BY adc_micro, vec_id) AS arn
         |         FROM adc),
         |fsl AS (SELECT vec_id, ms.m,
         |               list_transform(range($SubDim), k -> embedding[ms.m * $SubDim + k + 1]) AS v
         |        FROM embeddings CROSS JOIN ms),
         |fq AS (SELECT ms.m,
         |              list_transform(range($SubDim), k -> embedding[ms.m * $SubDim + k + 1]) AS qv
         |       FROM embeddings CROSS JOIN ms WHERE vec_id = 0),
         |ex AS (SELECT c.vec_id, c.cid, sum(${pqD2l("fsl.v", "fq.qv")})::BIGINT AS l2_micro
         |       FROM cand c JOIN fsl ON fsl.vec_id = c.vec_id JOIN fq ON fq.m = fsl.m
         |       WHERE c.arn <= $RefineSlate
         |       GROUP BY c.vec_id, c.cid)
         |SELECT vec_id, cid::BIGINT AS cid, l2_micro
         |FROM ex ORDER BY l2_micro, vec_id LIMIT 20""".stripMargin) { (spark, dir) =>
      val e = embeddings(spark, dir)
      val rcb = residualCodebook(spark, dir)
      val centsArr = centArray(ivfCentRows(e))
      val assigned = assignResiduals(e, centsArr)
      val rankedCents = array_sort(transform(col("cents"),
        c => struct((-cosineSim(col("embedding"), c.getField("ce"))).as("ncos"),
                    c.getField("cid").as("cid"))))
      val qProbe = e.filter(col("vec_id") === 0).crossJoin(broadcast(centsArr))
        .select(rankedCents.as("rc"))
        .select(element_at(col("rc"), 1).getField("cid").as("c1"),
          element_at(col("rc"), 2).getField("cid").as("c2"))
        .head()
      val probes = Seq(qProbe.getLong(0), qProbe.getLong(1))
      val qv = e.filter(col("vec_id") === 0).select(col("embedding")).head().getSeq[Float](0)
      val adc = residualAdcColumn(e, qv, probes, rcb)
      // phase 1: residual-ADC slate of RefineSlate candidates (TakeOrdered
      // — the raw embedding rides along for the bounded exact pass)
      val slate = assigned
        .filter(col("cid").isin(probes: _*) && col("vec_id") =!= 0)
        .select(col("vec_id"), col("cid"), col("embedding"),
          pqEncode(col("rv"), typedlit(rcb.map(_.toSeq)), SubDim).as("codes"))
        .select(col("vec_id"), col("cid"), col("embedding"), adc.as("adc_micro"))
        .orderBy(col("adc_micro"), col("vec_id"))
        .limit(RefineSlate)
      // phase 2: exact micro-L2, summed per subspace exactly like the
      // oracle's sum(pqD2l(slice, qslice)) — floor each subspace sum, add
      val l2Micro = (0 until SubSpaces).map { m =>
        val qSlice = (0 until SubDim).map(k => qv(m * SubDim + k).toDouble)
        floor(aggregate(
          zip_with(slice(col("embedding"), m * SubDim + 1, SubDim), typedlit(qSlice),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (s, v) => s + v) * 1000000).cast("long")
      }.reduce(_ + _)
      slate.select(col("vec_id"), col("cid"), l2Micro.as("l2_micro"))
        .orderBy(col("l2_micro"), col("vec_id"))
        .limit(20)
    },

    // IVFPQ + refine with AUTO-nprobe — the full serving path the engine
    // runs (CandidateGenerator.chooseNprobe + IvfGenerator.pqSlateScale),
    // oracle-pinned end to end: nprobe is DERIVED from the measured
    // coverage ceiling (the ann_ivf_auto_nprobe curve, here over the
    // IVFPQ coarse quantizer), the query probes its nprobe nearest cells,
    // and the refine slate SCALES with ceil(nprobe/2) so the tuned
    // slate-to-probed-population ratio holds as auto-nprobe widens the
    // probe set (RECALL_r08: the fixed slate at nprobe=12 starved the
    // exact pass; scaling restored 0.92 recall). Driver hops stay
    // bounded: one ≤ 16·10-row coverage collect + one probe-cell row —
    // the per-query planning step of IVF serving at any corpus size.
    Q("ann_ivfpq_refined_auto", {
      val coverageCtes =
        s"""qs AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 16),
           |gt AS (SELECT qs.q_id, e.vec_id AS n_id,
           |              row_number() OVER (PARTITION BY qs.q_id
           |                ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], qs.qv::DOUBLE[]) DESC, e.vec_id) AS rk
           |       FROM embeddings e CROSS JOIN qs WHERE e.vec_id <> qs.q_id),
           |topk AS (SELECT q_id, n_id FROM gt WHERE rk <= 10),
           |nbr AS (SELECT t.q_id, a.rn AS crank
           |        FROM topk t JOIN cells cl ON cl.vec_id = t.n_id
           |        JOIN asn a ON a.vec_id = t.q_id AND a.cid = cl.cid),
           |tot AS (SELECT count(*) AS total FROM topk),
           |cov AS (SELECT p.np, sum(CASE WHEN nbr.crank <= p.np THEN 1 ELSE 0 END)::BIGINT AS covered
           |        FROM nbr CROSS JOIN (SELECT unnest(range(1, 17)) AS np) p GROUP BY p.np),
           |bps AS (SELECT cov.np, cov.covered * 10000 // tot.total AS cov_bp FROM cov CROSS JOIN tot),
           |pick AS (SELECT coalesce(min(np), 16)::BIGINT AS np FROM bps WHERE cov_bp >= 9000)""".stripMargin
      s"""WITH ${pqResidualCtesWith(coverageCtes,
             "probes AS (SELECT a.cid FROM asn a CROSS JOIN pick WHERE a.vec_id = 0 AND a.rn <= pick.np)")},
         |$residualAdcCtes,
         |cand AS (SELECT vec_id, cid,
         |                row_number() OVER (ORDER BY adc_micro, vec_id) AS arn
         |         FROM adc),
         |fsl AS (SELECT vec_id, ms.m,
         |               list_transform(range($SubDim), k -> embedding[ms.m * $SubDim + k + 1]) AS v
         |        FROM embeddings CROSS JOIN ms),
         |fq AS (SELECT ms.m,
         |              list_transform(range($SubDim), k -> embedding[ms.m * $SubDim + k + 1]) AS qv
         |       FROM embeddings CROSS JOIN ms WHERE vec_id = 0),
         |ex AS (SELECT c.vec_id, c.cid, sum(${pqD2l("fsl.v", "fq.qv")})::BIGINT AS l2_micro
         |       FROM cand c CROSS JOIN pick
         |       JOIN fsl ON fsl.vec_id = c.vec_id JOIN fq ON fq.m = fsl.m
         |       WHERE c.arn <= $RefineSlate * ((pick.np + 1) // 2)
         |       GROUP BY c.vec_id, c.cid)
         |SELECT ex.vec_id, ex.cid::BIGINT AS cid, ex.l2_micro, pick.np AS nprobe
         |FROM ex CROSS JOIN pick ORDER BY l2_micro, vec_id LIMIT 20""".stripMargin
    }) { (spark, dir) =>
      val e = embeddings(spark, dir)
      val rcb = residualCodebook(spark, dir)
      val centRows = ivfCentRows(e)
      val centsArr = centArray(centRows)
      val assigned = assignResiduals(e, centsArr)
      // ---- derive nprobe from the measured coverage ceiling (the
      //      ann_ivf_auto_nprobe recipe over THIS index's geometry) ----
      val qs = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val topk = e.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          cosineSim(col("embedding"), col("qv")).as("s"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("s").desc, col("n_id"))))
        .filter(col("rk") <= 10)
        .select("q_id", "n_id")
      val cr = centRows.crossJoin(broadcast(qs))
        .select(col("q_id"), col("cid"), cosineSim(col("ce"), col("qv")).as("s"))
        .withColumn("crank", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("s").desc, col("cid"))))
        .select("q_id", "cid", "crank")
      // bounded driver hop (≤ 16·10 rank ints): the build-time planning
      // step — chooseNprobe runs the same collect inside the engine
      val ranks = topk
        .join(assigned.select(col("vec_id").as("n_id"), col("cid")), Seq("n_id"))
        .join(cr, Seq("q_id", "cid"))
        .select("crank")
        .collect().map(_.getInt(0))
      val total = math.max(1L, ranks.length.toLong)
      val np = (1 to 16)
        .find(p => ranks.count(_ <= p).toLong * 10000L / total >= 9000L)
        .getOrElse(16)
      // the query's np nearest cells, from ONE bounded row
      val rankedCents = array_sort(transform(col("cents"),
        c => struct((-cosineSim(col("embedding"), c.getField("ce"))).as("ncos"),
                    c.getField("cid").as("cid"))))
      val probes = e.filter(col("vec_id") === 0).crossJoin(broadcast(centsArr))
        .select(transform(slice(rankedCents, 1, np), s => s.getField("cid")).as("ps"))
        .head().getSeq[Long](0)
      val qv = e.filter(col("vec_id") === 0).select(col("embedding")).head().getSeq[Float](0)
      val adc = residualAdcColumn(e, qv, probes, rcb)
      // phase 1: residual-ADC slate SCALED by ceil(nprobe/2) — the
      // IvfGenerator.pqSlateScale contract, keeping the tuned
      // slate-to-probed-population ratio as the probe set widens
      val slate = assigned
        .filter(col("cid").isin(probes: _*) && col("vec_id") =!= 0)
        .select(col("vec_id"), col("cid"), col("embedding"),
          pqEncode(col("rv"), typedlit(rcb.map(_.toSeq)), SubDim).as("codes"))
        .select(col("vec_id"), col("cid"), col("embedding"), adc.as("adc_micro"))
        .orderBy(col("adc_micro"), col("vec_id"))
        .limit(RefineSlate * ((np + 1) / 2))
      // phase 2: exact micro-L2 over the bounded slate (same op sequence
      // as ann_ivfpq_refined)
      val l2Micro = (0 until SubSpaces).map { m =>
        val qSlice = (0 until SubDim).map(k => qv(m * SubDim + k).toDouble)
        floor(aggregate(
          zip_with(slice(col("embedding"), m * SubDim + 1, SubDim), typedlit(qSlice),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (s, v) => s + v) * 1000000).cast("long")
      }.reduce(_ + _)
      slate.select(col("vec_id"), col("cid"), l2Micro.as("l2_micro"),
          lit(np.toLong).as("nprobe"))
        .orderBy(col("l2_micro"), col("vec_id"))
        .limit(20)
    },

    // One distributed Lloyd k-means step — the codebook trainer behind
    // the IVF cells / PQ codebook (graft.ml.KMeans runs the full BSP
    // loop; this pins one step against the oracle). Assignment is
    // scan-local argmin vs a broadcast centroid array; the update is a
    // (cluster, dim) partial aggregate — map-side combine reduces every
    // partition to ≤ k·d rows, so the only shuffle is k·d compact rows
    // however large the corpus. Sums are per-row micro-quantized BEFORE
    // aggregation: integer sums are order-free, so the cross-engine hash
    // is exact (the mean is sum_micro/n, left to the consumer).
    Q("ml_kmeans_step", {
      def sq(i: String) =
        s"(e.embedding[$i]::DOUBLE - c.ce[$i]::DOUBLE) * (e.embedding[$i]::DOUBLE - c.ce[$i]::DOUBLE)"
      s"""WITH c AS (SELECT vec_id - $CbLo AS cid, embedding AS ce FROM embeddings
         |           WHERE vec_id BETWEEN $CbLo AND $CbHi),
         |d AS (SELECT e.vec_id, c.cid,
         |             CAST(floor(list_aggregate(list_transform(range(64), i -> ${sq("i + 1")}), 'sum') * 1000000) AS BIGINT) AS d2
         |      FROM embeddings e CROSS JOIN c),
         |a AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d),
         |x AS (SELECT a.cid, ks.k, CAST(floor(e.embedding[ks.k + 1]::DOUBLE * 1000000) AS BIGINT) AS xm
         |      FROM a JOIN embeddings e USING (vec_id)
         |      CROSS JOIN (SELECT unnest(range(64)) AS k) ks
         |      WHERE a.rn = 1)
         |SELECT cid::BIGINT AS cluster, k::BIGINT AS k,
         |       sum(xm)::BIGINT AS sum_micro, count(*) AS n
         |FROM x GROUP BY cid, k ORDER BY cluster, k""".stripMargin
    }) { (spark, dir) =>
      val e = embeddings(spark, dir)
      val cents = e.filter(col("vec_id").between(CbLo, CbHi))
        .agg(sort_array(collect_list(struct(
          (col("vec_id") - CbLo).cast("int").as("cid"), col("embedding").as("ce")))).as("cs"))
      def fullD2(a: Column, b: Column): Column =
        floor(aggregate(
          zip_with(a, b, (x, y) =>
            (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
          lit(0.0), (s, v) => s + v) * 1000000).cast("long")
      // argmin = first index achieving the min (cs is sorted by cid, so
      // first match = lowest cid on ties, matching the oracle's ORDER BY)
      val dists = transform(col("cs"), cs => fullD2(col("embedding"), cs.getField("ce")))
      val best = array_position(dists, array_min(dists)) - 1
      // assign BEFORE the explode (localCheckpoint pins the boundary): a
      // projection above a Generate is evaluated per exploded row, which
      // would re-run the 16-way argmin once per dimension (64×)
      val assigned = e.crossJoin(broadcast(cents))
        .select(col("vec_id"), best.cast("long").as("cluster"), col("embedding"))
        .localCheckpoint()
      assigned
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("k", "x")))
        .groupBy(col("cluster"), col("k").cast("long").as("k"))
        .agg(sum(floor(col("x").cast("double") * 1000000).cast("long")).as("sum_micro"),
          count(lit(1)).as("n"))
        .orderBy("cluster", "k")
    },

    // Late-interaction multi-vector retrieval (the ColBERT MaxSim shape):
    // documents are BAGS of token vectors (here: 4 consecutive corpus
    // vectors per doc), the query is its own bag, and score(D) =
    // Σ_{q∈Q} max_{t∈D} cos(q, t) — the retrieval operator modern RAG /
    // training-data stacks run between single-vector ANN and full
    // cross-encoders. Plan shape at 100 TB: the |Q| cosines are
    // scan-local literal-broadcast columns (one corpus scan, no
    // exchange carrying embeddings); the per-doc max is a partial
    // aggregate (map-side combine → ≤ |docs| compact rows per
    // partition), so the only shuffle is |docs| rows of |Q| longs.
    // Micro-floored cosines make the max/sum integers — exact
    // cross-engine.
    Q("ann_maxsim_multivector",
      s"""WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < $MaxSimQ),
         |c AS (SELECT e.vec_id // $MaxSimBag AS doc_id, q.qid,
         |             CAST(floor(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cm
         |      FROM embeddings e CROSS JOIN q WHERE e.vec_id >= $MaxSimBag),
         |m AS (SELECT doc_id, qid, max(cm) AS mx FROM c GROUP BY doc_id, qid)
         |SELECT doc_id, sum(mx)::BIGINT AS maxsim_micro
         |FROM m GROUP BY doc_id
         |ORDER BY maxsim_micro DESC, doc_id LIMIT 10""".stripMargin) { (spark, dir) =>
      val e = embeddings(spark, dir)
      // the query bag: |Q| vectors, driver-sized by construction (the
      // per-query planning step, same contract as every ANN query)
      val qvs = e.filter(col("vec_id") < MaxSimQ)
        .orderBy(col("vec_id")).collect().map(_.getSeq[Float](1).toSeq).toSeq
      val maxCols = qvs.zipWithIndex.map { case (qv, i) =>
        max(floor(cosineSim(col("embedding"), typedlit(qv)) * 1e6).cast("long")).as(s"m$i")
      }
      e.filter(col("vec_id") >= MaxSimBag)
        .select(expr(s"vec_id div $MaxSimBag").as("doc_id"), col("embedding"))
        .groupBy(col("doc_id"))
        .agg(maxCols.head, maxCols.tail: _*)
        .select(col("doc_id"),
          qvs.indices.map(i => col(s"m$i")).reduce(_ + _).as("maxsim_micro"))
        .orderBy(col("maxsim_micro").desc, col("doc_id"))
        .limit(10)
    },

    // IVF index health report — the observability query an operator runs
    // against a deployed index: per-cell population (balance/skew is THE
    // thing that breaks probe-cost guarantees at scale — a hot cell makes
    // every probe that hits it a near-full scan) and the cell's total
    // squared-residual mass in integer micros (the quantization-error
    // budget residual-PQ spends; a cell whose mass outgrows its peers is
    // the retrain trigger's per-cell refinement). Same scan-local
    // assignment as ann_ivfpq; one |cells|-row aggregate.
    Q("ann_index_stats",
      s"""WITH ivf AS (SELECT vec_id - $IvfLo AS cid, embedding AS ce FROM embeddings
         |             WHERE vec_id BETWEEN $IvfLo AND $IvfHi),
         |asn AS (SELECT e.vec_id, ivf.cid,
         |               row_number() OVER (PARTITION BY e.vec_id
         |                                  ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], ivf.ce::DOUBLE[]) DESC, ivf.cid) AS rn
         |        FROM embeddings e CROSS JOIN ivf),
         |cells AS (SELECT vec_id, cid FROM asn WHERE rn = 1),
         |r AS (SELECT cells.cid,
         |             CAST(floor(list_aggregate(list_transform(range(${SubSpaces * SubDim}),
         |               i -> (e.embedding[i+1]::DOUBLE - ivf.ce[i+1]::DOUBLE) * (e.embedding[i+1]::DOUBLE - ivf.ce[i+1]::DOUBLE)),
         |               'sum') * 1000000) AS BIGINT) AS r2
         |      FROM embeddings e JOIN cells ON cells.vec_id = e.vec_id
         |      JOIN ivf ON ivf.cid = cells.cid)
         |SELECT cid::BIGINT AS cid, count(*) AS n, sum(r2)::BIGINT AS sum_r2_micro
         |FROM r GROUP BY cid ORDER BY cid""".stripMargin) { (spark, dir) =>
      import graft.functions.VectorFunctions.cosineSim
      val e = embeddings(spark, dir)
      val centsArr = centArray(ivfCentRows(e))
      e.crossJoin(broadcast(centsArr))
        .withColumn("best", array_max(transform(col("cents"),
          c => struct(cosineSim(col("embedding"), c.getField("ce")).as("cos"),
                      (-c.getField("cid")).as("ncid")))))
        .withColumn("cid", -col("best").getField("ncid"))
        .withColumn("cent", element_at(
          filter(col("cents"), c => c.getField("cid") === col("cid")), 1).getField("ce"))
        .select(col("cid"),
          floor(aggregate(zip_with(col("embedding"), col("cent"),
              (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
            lit(0.0), (s, v) => s + v) * 1e6).cast("long").as("r2"))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n"), sum(col("r2")).as("sum_r2_micro"))
        .orderBy("cid")
    },

    // Binary (1-bit) quantization + Hamming ranking — the extreme end of
    // the quantization family (float32 → int8 SQ → 4-bit PQ → 1 bit):
    // each 64-dim vector collapses to its sign signature — 8 BYTES (two
    // 32-bit words), so a 100 TB float corpus becomes ~0.4 TB of codes and
    // the phase-1 "distance" is xor + popcount — the cheapest possible
    // candidate scan (used at this scale as the pre-filter ahead of an
    // int8/PQ or exact re-rank; the sign-LSH bucketing above is this
    // same signature used as a KEY instead of a metric). Everything is
    // integer arithmetic — exact cross-engine.
    Q("ann_hamming_binary",
      """WITH b AS (SELECT vec_id,
        |             list_aggregate(list_transform(range(32),
        |               i -> CASE WHEN embedding[i+1] > 0 THEN 1::BIGINT << i ELSE 0::BIGINT END),
        |               'sum') AS sig_lo,
        |             list_aggregate(list_transform(range(32),
        |               i -> CASE WHEN embedding[i+33] > 0 THEN 1::BIGINT << i ELSE 0::BIGINT END),
        |               'sum') AS sig_hi
        |           FROM embeddings),
        |q AS (SELECT sig_lo AS qlo, sig_hi AS qhi FROM b WHERE vec_id = 0)
        |SELECT b.vec_id,
        |       (bit_count(xor(b.sig_lo, q.qlo)) + bit_count(xor(b.sig_hi, q.qhi)))::BIGINT AS hamming
        |FROM b CROSS JOIN q WHERE b.vec_id <> 0
        |ORDER BY hamming, vec_id LIMIT 10""".stripMargin) { (spark, dir) =>
      val e = embeddings(spark, dir)
      // sign signature: one codegen'd fold per 32-dim word (a signed-long
      // engine can't hold bit 63, so the packing is word-wise — the same
      // layout a >64-dim corpus needs anyway); order-free sums of
      // distinct powers of two — exact cross-engine
      def word(off: Int) = expr(
        s"aggregate(transform(sequence(0, 31), " +
          s"i -> IF(embedding[i + $off] > CAST(0 AS FLOAT), shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))), " +
          "CAST(0 AS BIGINT), (s, v) -> s + v)")
      val q = e.filter(col("vec_id") === 0)
        .select(word(0).as("lo"), word(32).as("hi")).head()
      val (qlo, qhi) = (q.getLong(0), q.getLong(1))
      e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          (bit_count(word(0).bitwiseXOR(lit(qlo))) +
            bit_count(word(32).bitwiseXOR(lit(qhi)))).cast("long").as("hamming"))
        .orderBy(col("hamming"), col("vec_id"))
        .limit(10)
    },

    // Scalar-quantized (SQ8) serving — the missing member of the
    // quantized-ANN family next to PQ/ADC: each corpus vector stores int8
    // codes + one per-vector scale (4× smaller than float32, like FAISS
    // SQ8); queries score against the integer codes and rescale. The
    // codes are exact integers (floor(x·127/max|x|)) so the dot product
    // is deterministic. This REGISTERED query demonstrates the math
    // in-plan (it quantizes the float column per run — its scan still
    // reads floats); the byte-scan saving ships in the Workspace ANN
    // layout, which PERSISTS sq_code/sq_scale/sq_norm next to each
    // vector so IvfGenerator's probe pass reads only the code column
    // (plan-asserted in IncrementalIndexSpec). Top-k per query = the
    // usual per-partition heap.
    Q("ann_sq8_topk",
      s"""WITH sq AS (SELECT vec_id, embedding,
         |              127.0 / greatest(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))), 1e-12) AS s
         |            FROM embeddings),
         |c AS (SELECT vec_id, s,
         |             list_transform(embedding::DOUBLE[], x -> floor(x * s)) AS codes
         |      FROM sq),
         |q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
         |sc AS (SELECT c.vec_id,
         |              CAST(floor(list_dot_product(c.codes, q.qe) / c.s * 1000000) AS BIGINT) AS dot_micro
         |       FROM c CROSS JOIN q WHERE c.vec_id <> 0)
         |SELECT vec_id, dot_micro FROM sc
         |ORDER BY dot_micro DESC, vec_id LIMIT $K""".stripMargin) { (spark, dir) =>
      val e = embeddings(spark, dir)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>").as("qe"))
      val emb = col("embedding").cast("array<double>")
      val scale = lit(127.0) / greatest(
        array_max(transform(emb, x => abs(x))), lit(1e-12))
      e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"),
          scale.as("s"),
          transform(emb, x => floor(x * scale)).as("codes"),
          col("qe"))
        .select(col("vec_id"),
          floor(aggregate(zip_with(col("codes"), col("qe"), (x, y) => x * y),
              lit(0.0), (s, v) => s + v) / col("s") * 1000000)
            .cast("long").as("dot_micro"))
        .orderBy(col("dot_micro").desc, col("vec_id"))
        .limit(K)
    },

    // Auto-derived LSH banding geometry ([[graft.search.LshGeometry]],
    // round-8): the mean k-NN angle from a bounded exact-scored sample
    // picks the DEEPEST (most-pruning) band whose modeled union recall
    // 1 − (1 − p₁ᵇ)^L clears the 0.7 target at L=8 tables — the knob a
    // user must set BEFORE building an LSH index, where the blind 8×8
    // default silently delivered recall@10 = 0.21 on this flat corpus
    // (auto 8×4: 0.70, RECALL_r08). Scale shape: the sample side is a
    // fixed 16-query broadcast; the corpus pays ONE scan (at 100 TB the
    // library caps the corpus side by stride too — the estimate only
    // biases θ̂ UP, i.e. toward MORE recall). Exactness: per-pair angles
    // micro-floored to integer micro-radians and integer-averaged, so θ̂
    // replays bit-for-bit; the band formula's doubles sit ≫ ULP from the
    // 0.7 boundary at every b.
    Q("ann_lsh_auto_geometry",
      s"""WITH qs AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
         |            WHERE vec_id < $GeoQueries),
         |ranked AS (
         |  SELECT qs.q_id,
         |         CAST(floor(acos(least(greatest(
         |           list_cosine_similarity(e.embedding::DOUBLE[], qs.qv::DOUBLE[]), -1.0), 1.0)) * 1000000) AS BIGINT) AS urad,
         |         row_number() OVER (PARTITION BY qs.q_id
         |           ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], qs.qv::DOUBLE[]) DESC, e.vec_id) AS rk
         |  FROM embeddings e CROSS JOIN qs WHERE e.vec_id <> qs.q_id),
         |theta AS (SELECT sum(urad) // count(*) AS theta_urad FROM ranked WHERE rk <= $K),
         |bands AS (SELECT theta_urad, b,
         |                 1.0 - pow(1.0 - pow(1.0 - (theta_urad / 1000000.0) / pi(), b), $GeoTables) AS er
         |          FROM theta, unnest(range(1, 17)) AS u(b)),
         |pick AS (SELECT coalesce(max(b), 1) AS hp FROM bands WHERE er >= 0.7)
         |SELECT $GeoTables::BIGINT AS tables, b::BIGINT AS hyperplanes,
         |       (1 << b)::BIGINT AS buckets, theta_urad::BIGINT AS theta_urad,
         |       CAST(floor(er * 10000) AS BIGINT) AS expected_bp
         |FROM bands JOIN pick ON bands.b = pick.hp""".stripMargin) { (spark, dir) =>
      val e = embeddings(spark, dir)
      val qs = e.filter(col("vec_id") < GeoQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      // θ̂ lands on the driver as ONE long (the centroid-array idiom:
      // a scalar that every downstream band row derives from) — keeping
      // it a DataFrame would plan the corpus-scoring subtree under BOTH
      // the band probe and the broadcast pick side, executing the scan
      // twice per run (round-8 review finding)
      val thetaUrad: Long = e.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), cosineSim(col("embedding"), col("qv")).as("c"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("c").desc, col("vec_id"))))
        .filter(col("rk") <= K)
        .select(floor(acos(least(greatest(col("c"), lit(-1.0)), lit(1.0))) * 1000000)
          .cast("long").as("urad"))
        .agg(expr("sum(urad) div count(*)").as("theta_urad"))
        .head().getLong(0)
      val bands = spark.range(1, 17).select(lit(thetaUrad).as("theta_urad"),
          col("id").cast("int").as("b"))
        .withColumn("er", lit(1.0) - pow(
          lit(1.0) - pow(lit(1.0) - (col("theta_urad") / 1e6) / math.Pi, col("b")),
          lit(GeoTables)))
      val pick = bands.filter(col("er") >= 0.7)
        .agg(coalesce(max(col("b")), lit(1)).as("hp"))
      bands.join(broadcast(pick), col("b") === col("hp"))
        .select(lit(GeoTables.toLong).as("tables"), col("b").cast("long").as("hyperplanes"),
          expr("shiftleft(cast(1 as bigint), cast(b as int))").as("buckets"),
          col("theta_urad").cast("long").as("theta_urad"),
          floor(col("er") * 10000).cast("long").as("expected_bp"))
    }
  )
}
