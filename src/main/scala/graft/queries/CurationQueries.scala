package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.F
import graft.store.TokenIndex

/** Corpus-curation operators a training-data pipeline layers on top of the
  * dedup suite: BM25 relevance over the posting index (the ranked-keyword
  * function a 100 TB corpus search actually ships) and C4/Gopher-style
  * repetition filters (the "remove boilerplate and degenerate documents"
  * pass). All plans are explode→groupBy shapes with map-side partial
  * aggregation; the only broadcast sides are per-term df and global stats.
  */
object CurationQueries {

  private val terms = Seq("merge", "window", "hash")
  private val inList = terms.map(t => s"'$t'").mkString(", ")

  // ml_auc_rank bucket width: score domain (document n_chars) / 64 →
  // driver-side bucket-total count stays small however the corpus grows
  private val AucBucket = 64L

  // BM25 constants (Robertson/Lucene defaults)
  private val K1 = 1.2
  private val B = 0.75

  // Bloom decontamination geometry: m = 2¹⁶ bits, k probe positions cut
  // from one md5 digest (4 hex chars each — partitioned hashing). m is
  // the FIXED serving budget (64 KB of booleans as an array literal) —
  // sized for the fixture eval split here; a production eval suite picks
  // m ≈ −k·n/ln(1−fpr^(1/k)) and the plan shape is unchanged.
  private[graft] final val BloomBits = 65536
  private[graft] final val BloomHashes = 3

  /** The bloom decontamination PROBE chain — everything the corpus pays,
    * up to (and excluding) the materialization barrier: fan-out → shingle
    * → md5 per gram → 3-probe bitmap test, emitted as one compact
    * (doc_id, n_grams, n_flagged) row per corpus doc. Exposed
    * private[graft] so PlanQualitySpec asserts the heavy chain's shape
    * directly (in the registered query the localCheckpoint reduces it to
    * `Scan ExistingRDD`). The eval-side bitmap collect is bounded by the
    * filter geometry m = [[BloomBits]], never the corpus. */
  private[graft] def bloomDecontamProbe(spark: SparkSession, dir: String): DataFrame = {
    // F.fanout: shingle + md5 + 4-probe work per gram is the heaviest
    // per-row chain in the curation family, all scan-local (round-14)
    val t = F.fanout(table(spark, dir, "documents"))
      .select(col("doc_id"), array_distinct(F.shingles(F.tokens(col("text")), 5)).as("grams"))
    // BloomBits = 2¹⁶, so each 4-hex-char slice of ONE md5 digest IS a
    // probe position (partitioned hashing, Kirsch–Mitzenmacher style) —
    // one digest per gram instead of BloomHashes of them
    def probes(h: Column): Seq[Column] = (0 until BloomHashes).map(i =>
      conv(substring(h, i * 4 + 1, 4), 16, 10).cast("long"))
    // eval → bit positions → driver bitmap (≤ m entries by construction)
    val ps = t.filter(col("doc_id") % 97 === 0)
      .select(explode(col("grams")).as("g")).distinct()
      .select(explode(array(probes(md5(col("g"))): _*)).as("p")).distinct()
      .collect().map(_.getLong(0).toInt)
    val bloom = new Array[Boolean](BloomBits)
    ps.foreach(bloom(_) = true)
    val bloomLit = typedlit(bloom.toSeq)
    def hit(h: Column): Column = probes(h)
      .map(p => element_at(bloomLit, p.cast("int") + 1))
      .reduce(_ && _)
    t.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        // grams → digests FIRST so md5 runs once per gram (lambda
        // bodies get no common-subexpression elimination in codegen)
        size(filter(transform(col("grams"), g => md5(g)), hit _))
          .cast("long").as("n_flagged"))
  }

  /** Gram-keyed decontamination join with an HONEST broadcast decision:
    * the eval side broadcasts only while its estimated in-memory size fits
    * `spark.sql.autoBroadcastJoinThreshold`; beyond that it falls back to
    * a gram-keyed shuffle join (the corpus side still moves only
    * (doc_id, gram) pairs, never whole docs). An eval set that grows with
    * the corpus would otherwise be forced onto the driver at 100 TB.
    * The estimate costs one aggregate over the SMALL side only. */
  private[graft] def decontaminateJoin(
      corpusGrams: org.apache.spark.sql.DataFrame,
      evalGrams: org.apache.spark.sql.DataFrame,
      key: String): org.apache.spark.sql.DataFrame = {
    val spark = corpusGrams.sparkSession
    val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
    // stage the eval side ONCE per distinct eval plan (at cluster scale:
    // the eval suite is a static staged table); the size probe then reads
    // materialized blocks and the join reuses them — without this the
    // probe would evaluate the whole eval pipeline a second time, and
    // without the keyed cache every repeated run (bench warm + timed)
    // would orphan one more copy of the staged blocks
    // EXPLICIT key, not semanticHash: eval-gram builders go through
    // shingle lambdas whose fresh NamedLambdaVariable ids make the
    // semantic hash unstable across invocations — the cache never hit
    // and every repeated run orphaned one more staged copy (the exact
    // failure the dedup pairStats key fix measured)
    val ev = staged(spark, s"decontam_eval#$key")(evalGrams)
    val est = ev
      .agg(count(lit(1)).as("n"), coalesce(sum(length(col("g"))), lit(0L)).as("chars"))
      .head()
    // UTF-16 chars + per-row object overhead, the usual plan-stats flavor
    val estBytes = est.getLong(1) * 2L + est.getLong(0) * 40L
    val evSide = if (threshold >= 0 && estBytes <= threshold) broadcast(ev) else ev
    corpusGrams.join(evSide, Seq("g"))
  }

  /** The two halves of `curation_token_budget`, split so the window's
    * input is PROVABLY one bin (spec-asserted in PlanQualitySpec):
    *
    *  - `interior`: rows of bins that fit the budget WHOLLY
    *    (prev + btok ≤ b) — selected scan-locally with no window at all,
    *    since for every such row prev + cum_in_bin + n_tokens ≤
    *    prev + btok ≤ b holds by construction.
    *  - `boundary`: rows of THE single bin straddling the budget
    *    (prev < b < prev + btok; at most one exists because prev is a
    *    strictly increasing prefix sum over bins) — the only rows that
    *    pay the within-bin ordered cumsum. At 100 TB the window input is
    *    one bin's rows, not every candidate bin (window parallelism no
    *    longer caps at the bin count for the interior mass; the boundary
    *    bin's ordered scan is the irreducible cost of exact truncation).
    *
    * Bins with prev ≥ b are dropped entirely. Union(interior, boundary)
    * reproduces the single-pass selection row-for-row. */
  private[graft] def tokenBudgetParts(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    // staged: t feeds the per-doc join, the bin totals, AND the budget
    // aggregate — unstaged, the plan evaluates the corpus tokenize three
    // times (the dominant cost), the same trap the mixers stage around
    val t = staged(spark, s"$dir#budget_tok") {
      table(spark, dir, "documents")
        .select(col("doc_id"),
          size(F.tokens(col("text"))).cast("long").as("n_tokens"),
          size(array_distinct(F.tokens(col("text")))).cast("long").as("n_uniq"))
    }
    val d = t.select(col("doc_id"), col("n_tokens"),
      expr("(n_uniq * 20) div greatest(n_tokens, 1)").as("bin"))
    val bt = d.groupBy("bin").agg(sum(col("n_tokens")).as("btok"))
    val bud = t.agg(expr("(sum(n_tokens) * 3) div 10").as("b"))
    // prev (tokens in strictly-better bins) via a 21-row triangular
    // self-join — no unpartitioned window anywhere in this plan
    val higher = bt.select(col("bin").as("hbin"), col("btok").as("htok"))
    val w = bt.join(broadcast(higher), col("hbin") > col("bin"), "left")
      .groupBy("bin", "btok")
      .agg(coalesce(sum(col("htok")), lit(0L)).as("prev"))
      .crossJoin(broadcast(bud))
    val interiorBins = w.filter(col("prev") + col("btok") <= col("b")).select("bin")
    val boundaryBin = w.filter(col("prev") < col("b") && col("prev") + col("btok") > col("b"))
      .select(col("bin"), col("prev"), col("b"))
    val interior = d.join(broadcast(interiorBins), Seq("bin"))
      .select(col("doc_id"), col("bin"), col("n_tokens"))
    val wDoc = Window.partitionBy(col("bin")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundary = d.join(broadcast(boundaryBin), Seq("bin"))
      .withColumn("cum_in_bin", coalesce(sum(col("n_tokens")).over(wDoc), lit(0L)))
      .filter(col("prev") + col("cum_in_bin") + col("n_tokens") <= col("b"))
      .select(col("doc_id"), col("bin"), col("n_tokens"))
    (interior, boundary)
  }

  /** The quality-classifier training rows — label (lang='en') + 4-feature
    * vector [bias, distinct-token ratio, stopword ratio, tokens/1e3] —
    * shared by ml_logreg_grad and ml_linear_probe_train, in BOTH engines'
    * dialects. ONE definition on purpose (the assignCosineCells rule): a
    * feature tweak applied to one trainer or one engine's copy but not
    * the other would silently diverge the models and break oracle parity. */
  private val FeatSql =
    """SELECT doc_id,
      |             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
      |             [1.0,
      |              len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))::DOUBLE
      |                / greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 1),
      |              len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
      |                    t -> t IN ('the', 'and', 'of', 'to', 'a')))::DOUBLE
      |                / greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 1),
      |              len(regexp_extract_all(lower(text), '[a-z0-9]+'))::DOUBLE / 1000.0] AS x
      |           FROM documents""".stripMargin

  // ---- shared micro-exact GD machinery (ml_linear_probe_train +
  // ml_quality_filter_apply): gradients are micro-floored integer sums,
  // steps divide by 10·n with a floor — bit-identical in DuckDB's CTE
  // replay because every float enters through one correctly-rounded
  // division of a shared integer ----

  private[queries] val probeDotSql = (1 to 4).map(k =>
    s"w.wm[$k]::DOUBLE / 1000000.0 * x[$k]").mkString(" + ")

  private def probeGradCte(g: String, wPrev: String) =
    s"""$g AS (SELECT count(*) AS n, ${(1 to 4).map(k =>
         s"sum(CAST(floor(($probeDotSql - y) * x[$k] * 1000000) AS BIGINT)) AS gr$k").mkString(", ")}
       |      FROM f CROSS JOIN $wPrev w)""".stripMargin

  private def probeStepCte(wNew: String, g: String, wPrev: String) =
    s"""$wNew AS (SELECT [${(1 to 4).map(k =>
         s"w.wm[$k] - CAST(floor(gr$k::DOUBLE / (10.0 * n)) AS BIGINT)").mkString(", ")}] AS wm
       |      FROM $g CROSS JOIN $wPrev w)""".stripMargin

  /** CTEs training w0 → w2 (two replayed GD steps). Prepend after `f`. */
  private[queries] val probeTrainCtes =
    s"""w0 AS (SELECT [CAST(0 AS BIGINT), 0, 0, 0] AS wm),
       |${probeGradCte("g1", "w0")},
       |${probeStepCte("w1", "g1", "w0")},
       |${probeGradCte("g2", "w1")},
       |${probeStepCte("w2", "g2", "w1")}""".stripMargin

  /** Dot product with DRIVER-literal micro weights: the same double each
    * engine derives (w/1e6 is one correctly-rounded division), summed in
    * the same fixed k order. */
  private def probeDot(w: Seq[Long]): org.apache.spark.sql.Column =
    (0 until 4).map(k => lit(w(k).toDouble / 1e6) * col("x")(k)).reduce(_ + _)

  private def probeGradAgg(f: DataFrame, w: Seq[Long]): DataFrame =
    f.agg(count(lit(1)).as("n"),
      (0 until 4).map(k =>
        sum(floor((probeDot(w) - col("y")) * col("x")(k) * 1000000).cast("long")).as(s"gr$k")): _*)

  /** One GD step: a bounded driver hop (5 longs — the centroid-array
    * contract), exactly like ann_ivf_trained's Lloyd rounds. */
  private def probeStep(f: DataFrame, w: Seq[Long]): Seq[Long] = {
    val r = probeGradAgg(f, w).head()
    val n = r.getLong(0)
    (0 until 4).map(k => w(k) - math.floor(r.getLong(k + 1).toDouble / (10.0 * n)).toLong)
  }

  /** The same rows in Spark, staged once per (session, dir) — the
    * tokenize runs once however many trainer queries (or GD steps)
    * consume it. */
  private def stagedFeatures(spark: SparkSession, dir: String): DataFrame =
    staged(spark, s"$dir#probe_feat") {
      val toks = F.tokens(col("text"))
      val nTok = greatest(size(toks), lit(1)).cast("double")
      table(spark, dir, "documents").select(
        col("doc_id"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
        array(
          lit(1.0),
          size(array_distinct(toks)).cast("double") / nTok,
          size(filter(toks, t => t.isin("the", "and", "of", "to", "a"))).cast("double") / nTok,
          size(toks).cast("double") / 1000.0).as("x"))
    }

  val all: Seq[Q] = Seq(

    // BM25 ranked keyword search: idf·tf·(k1+1)/(tf + k1·(1−b+b·len/avgdl))
    // summed over query terms, Lucene-style idf = ln((N−df+0.5)/(df+0.5)+1).
    // Candidate cost ∝ posting lists of the query terms; df and corpus
    // stats are tiny broadcast sides. Scores quantized to 1e-4 for the
    // cross-engine hash (both engines evaluate the same double formula).
    Q("text_bm25_rank",
      s"""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents),
         |post AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
         |dl AS (SELECT doc_id, sum(tf) AS dlen FROM post GROUP BY doc_id),
         |stats AS (SELECT count(*) AS n, avg(dlen) AS avgdl FROM dl),
         |dfreq AS (SELECT token, count(*) AS df FROM post WHERE token IN ($inList) GROUP BY token)
         |SELECT p.doc_id,
         |       CAST(floor(sum(ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
         |                      * p.tf * ${K1 + 1}
         |                      / (p.tf + $K1 * (${1 - B} + $B * dl.dlen / stats.avgdl))) * 10000) AS BIGINT) AS bm25_q
         |FROM post p
         |JOIN dfreq ON dfreq.token = p.token
         |JOIN dl ON dl.doc_id = p.doc_id
         |CROSS JOIN stats
         |GROUP BY p.doc_id
         |ORDER BY bm25_q DESC, p.doc_id LIMIT 20""".stripMargin) { (spark, dir) =>
      val post = TokenIndex.build(table(spark, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("chunk_id", "doc_id")
      val dl = post.groupBy("doc_id").agg(sum("tf").as("dlen"))
      val stats = dl.agg(count(lit(1)).as("n"), avg("dlen").as("avgdl"))
      val dfreq = post.filter(col("token").isin(terms: _*))
        .groupBy("token").agg(count(lit(1)).as("df"))
      val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
      val termScore = idf * col("tf") * lit(K1 + 1) /
        (col("tf") + lit(K1) * (lit(1 - B) + col("dlen") * lit(B) / col("avgdl")))
      post.filter(col("token").isin(terms: _*))
        .join(broadcast(dfreq), Seq("token"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .groupBy("doc_id")
        .agg(floor(sum(termScore) * 10000).cast("long").as("bm25_q"))
        .orderBy(col("bm25_q").desc, col("doc_id"))
        .limit(20)
    },

    // The curation DECISION: combine the cheap per-document signals
    // (token count, mean token length, top-bigram mass) into keep/drop —
    // the final output of a filtering pipeline. One scan, exact integer
    // thresholds on quantized metrics, no shuffle beyond the bigram agg.
    Q("curation_filter_decision",
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        |m AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
        |             CAST(floor(list_aggregate(list_transform(toks, s -> len(s)), 'sum') * 1000000.0 / len(toks)) AS BIGINT) AS mean_len_micro
        |      FROM t WHERE len(toks) > 0),
        |g2 AS (SELECT doc_id, g, count(*) AS c
        |       FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |               i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS g FROM t)
        |       GROUP BY doc_id, g),
        |top2 AS (SELECT doc_id, CAST(floor(max(c) * 2.0 * 1000000 / (sum(c)::BIGINT + 1)) AS BIGINT) AS rep2_micro
        |         FROM g2 GROUP BY doc_id)
        |SELECT m.doc_id, m.n_tokens, m.mean_len_micro, top2.rep2_micro,
        |       (m.n_tokens >= 20 AND m.mean_len_micro BETWEEN 2000000 AND 10000000
        |        AND top2.rep2_micro < 200000) AS keep
        |FROM m JOIN top2 ON top2.doc_id = m.doc_id
        |ORDER BY m.doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      val t = table(spark, dir, "documents")
        .select(col("doc_id"), F.tokens(col("text")).as("toks"))
      val m = t.filter(size(col("toks")) > 0)
        .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
          floor(aggregate(transform(col("toks"), s => length(s)), lit(0),
            (acc, x) => acc + x) * 1000000.0 / size(col("toks"))).cast("long").as("mean_len_micro"))
      val top2 = t.select(col("doc_id"), explode(F.shingles(col("toks"), 2)).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(floor(max("c") * lit(2.0) * 1000000 / (sum("c") + 1)).cast("long").as("rep2_micro"))
      m.join(top2, Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("mean_len_micro"), col("rep2_micro"),
          (col("n_tokens") >= 20 && col("mean_len_micro").between(2000000, 10000000) &&
            col("rep2_micro") < 200000).as("keep"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // Benchmark decontamination: flag training docs sharing any 5-token
    // n-gram with a held-out eval split (here: doc_id % 97 — a stand-in
    // for the benchmark suite). The join is gram-keyed and the eval side
    // broadcasts ONLY while it fits the broadcast threshold (eval suites
    // are MBs in production); past the threshold decontaminateJoin falls
    // back to a gram-keyed shuffle join automatically — both regimes are
    // plan-asserted in PlanQualitySpec. The 100 TB side never shuffles
    // whole docs either way.
    Q("curation_decontaminate",
      """WITH t AS (SELECT doc_id,
        |             list_distinct(list_transform(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 3),
        |               i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i + 4), ' '))) AS grams
        |           FROM documents),
        |ev AS (SELECT DISTINCT unnest(grams) AS g FROM t WHERE doc_id % 97 = 0),
        |c AS (SELECT doc_id, unnest(grams) AS g FROM t WHERE doc_id % 97 <> 0)
        |SELECT c.doc_id, count(*)::BIGINT AS n_shared
        |FROM c JOIN ev ON ev.g = c.g
        |GROUP BY c.doc_id
        |ORDER BY n_shared DESC, doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      val t = F.fanout(table(spark, dir, "documents"))
        .select(col("doc_id"), array_distinct(F.shingles(F.tokens(col("text")), 5)).as("grams"))
      val ev = t.filter(col("doc_id") % 97 === 0)
        .select(explode(col("grams")).as("g")).distinct()
      val c = t.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), explode(col("grams")).as("g"))
      decontaminateJoin(c, ev, s"$dir#decontam_ev")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared"))
        .orderBy(col("n_shared").desc, col("doc_id"))
        .limit(1000)
    },

    // Bloom-filter decontamination — the ZERO-SHUFFLE contamination scan.
    // curation_decontaminate joins corpus grams against the eval grams
    // (broadcast-or-shuffle); this variant compresses the eval suite into
    // a fixed m-bit Bloom bitmap instead, and the corpus pays ONE
    // completely scan-local pass: per document, count grams whose
    // BloomHashes probe positions are all set (higher-order filter over
    // the gram array against a 64 KB array literal — no explode, no join,
    // no shuffle; the only aggregation anywhere is the eval side's
    // position-set build). The bitmap collect is bounded by the filter
    // geometry m, NEVER the corpus — the same contract as Spark's own
    // InjectRuntimeFilter bloom. False positives are possible by design
    // (AnalyticsOpsSpec pins flags ⊇ the exact join's flags); at 100 TB
    // this is how decontamination actually ships when the eval suite
    // outgrows the broadcast threshold but the corpus can't afford a
    // gram-keyed shuffle.
    Q("curation_bloom_decontam",
      s"""WITH t AS (SELECT doc_id,
         |             list_distinct(list_transform(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 3),
         |               i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i + 4), ' '))) AS grams
         |           FROM documents),
         |ev AS (SELECT DISTINCT unnest(grams) AS g FROM t WHERE doc_id % 97 = 0),
         |pos AS (SELECT DISTINCT ('0x' || substr(md5(g), r.i * 4 + 1, 4))::BIGINT AS p
         |        FROM ev CROSS JOIN (SELECT unnest(range($BloomHashes)) AS i) r),
         |cg AS (SELECT doc_id, unnest(grams) AS g FROM t WHERE doc_id % 97 <> 0),
         |pr AS (SELECT doc_id, g,
         |              ('0x' || substr(md5(g), r.i * 4 + 1, 4))::BIGINT AS p
         |       FROM cg CROSS JOIN (SELECT unnest(range($BloomHashes)) AS i) r),
         |hits AS (SELECT pr.doc_id, pr.g, count(*) AS nh
         |         FROM pr JOIN pos ON pos.p = pr.p
         |         GROUP BY pr.doc_id, pr.g),
         |fl AS (SELECT doc_id, count(*)::BIGINT AS n_flagged FROM hits
         |       WHERE nh = $BloomHashes GROUP BY doc_id)
         |SELECT t.doc_id, len(t.grams)::BIGINT AS n_grams, fl.n_flagged
         |FROM t JOIN fl ON fl.doc_id = t.doc_id
         |ORDER BY n_flagged DESC, t.doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      // materialization barrier (round-14): without it the optimizer
      // pushes the `n_flagged > 0` filter BELOW the fan-out exchange —
      // the whole shingle+md5+probe chain then runs on the 1-task scan
      // (and is evaluated a second time in the projection above). The
      // localCheckpoint pins the heavy chain exactly once per row, above
      // the exchange, in parallel; the materialized frame is 3 longs per
      // doc (scale-safe) and is rebuilt per call (no cross-run reuse).
      // The pre-checkpoint chain lives in [[bloomDecontamProbe]] so
      // PlanQualitySpec can assert its shape (the checkpoint hides it
      // behind a Scan ExistingRDD in the registered query's plan).
      bloomDecontamProbe(spark, dir)
        .localCheckpoint()
        .filter(col("n_flagged") > 0)
        .orderBy(col("n_flagged").desc, col("doc_id"))
        .limit(1000)
    },

    // Stratified per-language sampling with exact quotas: rank docs inside
    // each language by md5(doc_id) (reproducible across engines — no RNG)
    // and keep the first 50. Two-phase ranking: a salted per-partition
    // top-50 first, then the exact rank over ≤ salts×50 survivors per
    // language — a handful of language keys would otherwise funnel the
    // whole corpus through one window partition each at 100 TB.
    Q("curation_stratified_sample",
      """WITH r AS (SELECT lang, doc_id,
        |             row_number() OVER (PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
        |           FROM documents)
        |SELECT lang, doc_id, rk::BIGINT AS rk
        |FROM r WHERE rk <= 50 ORDER BY lang, rk""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val quota = 50
      val h = table(spark, dir, "documents")
        .select(col("lang"), col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
        .withColumn("salt", pmod(F.hash60(col("doc_id").cast("string")), lit(8)))
      // phase 1: every global top-quota row of a language is also in the
      // top-quota of its salt slice, so the pre-filter is lossless
      val pre = h.withColumn("r1", row_number().over(
          Window.partitionBy(col("lang"), col("salt")).orderBy(col("h"), col("doc_id"))))
        .filter(col("r1") <= quota)
      pre.withColumn("rk", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))).cast("long"))
        .filter(col("rk") <= quota)
        .select(col("lang"), col("doc_id"), col("rk"))
        .orderBy("lang", "rk")
    },

    // Weighted sampling WITHOUT replacement, one pass (Efraimidis &
    // Spirakis 2006, algorithm A-ES): each doc draws key = ln(u)/w with
    // u uniform in (0,1] and w its weight (here n_chars — sample
    // probability ∝ document length, the "sample by token mass" pick a
    // mixture builder wants); the global top-n by key IS an exact
    // w-weighted sample. u comes from the portable 60-bit md5 hash, not
    // an RNG, so the sample is identical on every engine and every run.
    // Scale shape: the key is scan-local arithmetic; the top-n is
    // TakeOrdered (per-partition heaps, n rows to the driver) — the
    // canonical single-pass distributed weighted sampler, no shuffle of
    // the corpus at any size. Keys floored to integer picos (the
    // ln(u)/w range is ~1e-4 for long docs, so micros would tie).
    Q("curation_weighted_sample",
      """WITH k AS (SELECT doc_id, greatest(n_chars, 1) AS w,
        |             CAST(floor(ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT + 1)::DOUBLE
        |                           / 1152921504606846977.0)
        |                        / greatest(n_chars, 1) * 1000000000000.0) AS BIGINT) AS key_pico
        |           FROM documents)
        |SELECT doc_id, w::BIGINT AS w, key_pico,
        |       row_number() OVER (ORDER BY key_pico DESC, doc_id) AS rk
        |FROM k
        |QUALIFY rk <= 256
        |ORDER BY rk""".stripMargin) { (spark, dir) =>
      val w = greatest(col("n_chars"), lit(1))
      val u = (F.hash60(col("doc_id").cast("string")) + 1).cast("double") /
        lit(1152921504606846977.0)
      table(spark, dir, "documents")
        .select(col("doc_id"), w.cast("long").as("w"),
          floor(log(u) / w * 1e12).cast("long").as("key_pico"))
        .orderBy(col("key_pico").desc, col("doc_id"))
        .limit(256)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("key_pico").desc, col("doc_id")))
          .cast("long"))
    },

    // Per-domain quantile gate: keep a doc only if it clears its OWN
    // source's 25th length percentile — absolute thresholds misfire when
    // domains have different length profiles, so the gate is relative.
    // percent_rank inside a source-keyed window (tie-broken by doc_id, so
    // rank == row_number and the rational (rank-1)/(n-1) is engine-exact).
    // One source-keyed shuffle; a skewed mega-source takes the salted
    // two-phase treatment of curation_stratified_sample.
    Q("curation_quality_quantile",
      """WITH r AS (SELECT doc_id, source, n_chars,
        |             percent_rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS pr
        |           FROM documents)
        |SELECT doc_id, source, n_chars,
        |       CAST(floor(pr * 1000000) AS BIGINT) AS pr_micro,
        |       (CASE WHEN pr >= 0.25 THEN 1 ELSE 0 END)::BIGINT AS keep
        |FROM r ORDER BY doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
      table(spark, dir, "documents")
        .withColumn("pr", percent_rank().over(w))
        .select(col("doc_id"), col("source"), col("n_chars"),
          floor(col("pr") * 1000000).cast("long").as("pr_micro"),
          when(col("pr") >= 0.25, 1L).otherwise(0L).as("keep"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // Curriculum ordering (Bengio et al. 2009 shape): bucket each doc
    // into a within-source difficulty decile (percent_rank over n_chars —
    // the same relative-gate discipline as curation_quality_quantile),
    // then interleave buckets round-robin so every training "round" of 10
    // docs sweeps easy→hard once — the schedule that avoids both
    // easy-only warmup starvation and hard-first divergence. Hash-ordered
    // within a bucket (portable md5, no RNG). Scale shape: two
    // source-keyed window passes (the percent_rank and the round-robin
    // rank) — the shuffle key is the source, never a global sort; a
    // skewed mega-source takes the salted two-phase treatment of
    // curation_stratified_sample.
    Q("curation_curriculum_order",
      """WITH b AS (SELECT doc_id, source, n_chars,
        |             least(CAST(floor(percent_rank() OVER
        |               (PARTITION BY source ORDER BY n_chars, doc_id) * 10) AS BIGINT), 9) AS bucket
        |           FROM documents),
        |r AS (SELECT doc_id, source, bucket,
        |        row_number() OVER (PARTITION BY source, bucket
        |                           ORDER BY md5(doc_id::VARCHAR), doc_id) AS rr
        |      FROM b)
        |SELECT doc_id, source, bucket, ((rr - 1) * 10 + bucket)::BIGINT AS pos
        |FROM r ORDER BY source, pos, doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val wPr = Window.partitionBy("source").orderBy("n_chars", "doc_id")
      val b = table(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          least(floor(percent_rank().over(wPr) * 10).cast("long"), lit(9L)).as("bucket"))
      val wRr = Window.partitionBy("source", "bucket")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      b.withColumn("rr", row_number().over(wRr))
        .select(col("doc_id"), col("source"), col("bucket"),
          ((col("rr") - 1) * 10 + col("bucket")).cast("long").as("pos"))
        .orderBy("source", "pos", "doc_id")
        .limit(1000)
    },

    // DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling"): hashed-unigram LMs
    // for a target domain (the alphabetically-first source) and the raw
    // corpus; each doc scores the summed log-ratio of its tokens' bucket
    // probabilities — positive means target-like. Per-bucket log-ratios
    // are floored to integer micros BEFORE the per-doc sum (order-free).
    // Scale: both LMs are 1024-row tables (broadcast); scoring is one
    // bucket-keyed broadcast join over the token stream — the corpus
    // shuffles only for the per-doc regroup.
    Q("curation_dsir_weights",
      """WITH tgt AS (SELECT min(source) AS ms FROM documents),
        |tok AS (SELECT doc_id, source,
        |          ('0x' || substr(md5(tk0), 1, 15))::BIGINT % 1024 AS b
        |        FROM (SELECT doc_id, source,
        |                unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tk0
        |              FROM documents)),
        |ct AS (SELECT b, count(*)::BIGINT AS c FROM tok WHERE source = (SELECT ms FROM tgt) GROUP BY b),
        |cc AS (SELECT b, count(*)::BIGINT AS c FROM tok GROUP BY b),
        |nt AS (SELECT count(*)::BIGINT AS n FROM tok WHERE source = (SELECT ms FROM tgt)),
        |nc AS (SELECT count(*)::BIGINT AS n FROM tok),
        |w AS (SELECT cc.b,
        |        CAST(floor((ln((coalesce(ct.c, 0) + 1)::DOUBLE / ((SELECT n FROM nt) + 1024))
        |                  - ln((cc.c + 1)::DOUBLE / ((SELECT n FROM nc) + 1024))) * 1000000) AS BIGINT) AS w
        |      FROM cc LEFT JOIN ct ON ct.b = cc.b),
        |s AS (SELECT tok.doc_id, sum(w.w)::BIGINT AS score_micro
        |      FROM tok JOIN w ON w.b = tok.b GROUP BY tok.doc_id)
        |SELECT doc_id, score_micro,
        |       (CASE WHEN score_micro > 0 THEN 1 ELSE 0 END)::BIGINT AS keep
        |FROM s ORDER BY doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      val tok = staged(spark, s"$dir#dsir_tok") {
        table(spark, dir, "documents")
          .select(col("doc_id"), col("source"),
            explode(F.tokens(col("text"))).as("tk0"))
          .select(col("doc_id"), col("source"),
            pmod(F.hash60(col("tk0")), lit(1024L)).as("b"))
      }
      val ms = table(spark, dir, "documents").agg(min(col("source"))).head().getString(0)
      val ct = tok.filter(col("source") === ms).groupBy("b").agg(count(lit(1)).as("ct"))
      val cc = tok.groupBy("b").agg(count(lit(1)).as("cc"))
      val nt = tok.filter(col("source") === ms).count()
      val nc = tok.count()
      val w = cc.join(ct, Seq("b"), "left")
        .select(col("b"),
          floor((log((coalesce(col("ct"), lit(0L)) + 1).cast("double") / lit(nt + 1024.0)) -
                 log((col("cc") + 1).cast("double") / lit(nc + 1024.0))) * 1000000)
            .cast("long").as("w"))
      tok.join(broadcast(w), Seq("b"))
        .groupBy("doc_id")
        .agg(sum(col("w")).as("score_micro"))
        .select(col("doc_id"), col("score_micro"),
          when(col("score_micro") > 0, 1L).otherwise(0L).as("keep"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // Domain-mixture sampling: equalize every source's token contribution
    // to the training mix. Per-source token totals (one tiny agg) set a
    // deterministic per-source sampling rate in basis points —
    // rate = min_source_tokens / source_tokens — and a portable hash of
    // doc_id decides membership (no RNG, same sample on every engine and
    // every run). At 100 TB the rate table is a handful of rows broadcast
    // against a scan-local filter; the corpus itself never shuffles.
    Q("curation_mixture_sample",
      """WITH t AS (SELECT doc_id, source,
        |             len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_tokens
        |           FROM documents),
        |tot AS (SELECT source, sum(n_tokens)::BIGINT AS tot FROM t GROUP BY source),
        |m AS (SELECT min(tot)::BIGINT AS mn FROM tot),
        |r AS (SELECT source, ((SELECT mn FROM m) * 10000) // tot AS rate_bp FROM tot),
        |s AS (SELECT t.doc_id, t.source, t.n_tokens, r.rate_bp
        |      FROM t JOIN r ON r.source = t.source
        |      WHERE ('0x' || substr(md5(t.doc_id::VARCHAR || ':mix'), 1, 15))::BIGINT % 10000 < r.rate_bp)
        |SELECT source, rate_bp::BIGINT AS rate_bp, count(*) AS n_docs, sum(n_tokens)::BIGINT AS tok_sampled
        |FROM s GROUP BY source, rate_bp ORDER BY source LIMIT 1000""".stripMargin) { (spark, dir) =>
      val t = staged(spark, s"$dir#mixture_tokens") {
        table(spark, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(F.tokens(col("text"))).cast("long").as("n_tokens"))
      }
      val tot = t.groupBy("source").agg(sum(col("n_tokens")).as("tot"))
      val mn = tot.agg(min(col("tot")).as("mn"))
      val rates = tot.crossJoin(broadcast(mn))
        .select(col("source"), expr("(mn * 10000) div tot").as("rate_bp"))
      t.join(broadcast(rates), Seq("source"))
        .filter(pmod(F.hash60(concat(col("doc_id").cast("string"), lit(":mix"))), lit(10000L)) < col("rate_bp"))
        .groupBy("source", "rate_bp")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_sampled"))
        .orderBy("source")
        .limit(1000)
    },

    // Temperature-scaled domain mixing (the GPT-3 §2.2 / Pile recipe):
    // instead of fully equalizing sources (curation_mixture_sample = the
    // α=0 case), sample source i at rate (min_tokens/tokens_i)^(1−α) so
    // large sources are only PARTIALLY downweighted. Same 100 TB shape
    // as the linear mixer: one tiny per-source agg → broadcast rate
    // table → scan-local hash filter; the corpus never shuffles.
    //
    // The exponent is 1/2 (temperature T=2, the standard multilingual
    // setting) deliberately: sqrt is the ONE power IEEE 754 requires to
    // be correctly rounded, so the JVM and DuckDB produce bit-identical
    // rates — an arbitrary pow(x, 0.3) is libm-dependent in its last
    // ulp, and a one-ulp flip of floor(rate·10⁴) would cascade into a
    // different sampled document set on one engine only.
    Q("curation_mixture_temperature",
      """WITH t AS (SELECT doc_id, source,
        |             len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_tokens
        |           FROM documents),
        |tot AS (SELECT source, sum(n_tokens)::BIGINT AS tot FROM t GROUP BY source),
        |m AS (SELECT min(tot)::BIGINT AS mn FROM tot),
        |r AS (SELECT source,
        |             CAST(floor(sqrt((SELECT mn FROM m)::DOUBLE / tot) * 10000) AS BIGINT) AS rate_bp
        |      FROM tot),
        |s AS (SELECT t.doc_id, t.source, t.n_tokens, r.rate_bp
        |      FROM t JOIN r ON r.source = t.source
        |      WHERE ('0x' || substr(md5(t.doc_id::VARCHAR || ':tmp'), 1, 15))::BIGINT % 10000 < r.rate_bp)
        |SELECT source, rate_bp, count(*) AS n_docs, sum(n_tokens)::BIGINT AS tok_sampled
        |FROM s GROUP BY source, rate_bp ORDER BY source LIMIT 1000""".stripMargin) { (spark, dir) =>
      val t = staged(spark, s"$dir#mixture_tokens") {
        table(spark, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(F.tokens(col("text"))).cast("long").as("n_tokens"))
      }
      val tot = t.groupBy("source").agg(sum(col("n_tokens")).as("tot"))
      val mn = tot.agg(min(col("tot")).as("mn"))
      val rates = tot.crossJoin(broadcast(mn))
        .select(col("source"),
          floor(sqrt(col("mn").cast("double") / col("tot")) * 10000)
            .cast("long").as("rate_bp"))
      t.join(broadcast(rates), Seq("source"))
        .filter(pmod(F.hash60(concat(col("doc_id").cast("string"), lit(":tmp"))), lit(10000L)) < col("rate_bp"))
        .groupBy("source", "rate_bp")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_sampled"))
        .orderBy("source")
        .limit(1000)
    },

    // UPSAMPLING mixer (LLaMA §2.1 / Pile epochs): where the two mixers
    // above throw away documents from large sources, this one REPEATS
    // small sources — rate_i = min(4, sqrt(max_tokens/tokens_i)) epochs,
    // materialized as floor(rate) whole copies per doc plus one more for
    // the hash-selected fractional share (deterministic — no RNG, the
    // stratified-sample discipline). The 4-epoch cap is the standard
    // guard against overfitting tiny sources. Same 100 TB shape again:
    // tiny per-source agg → broadcast rate table → scan-local
    // explode(sequence) materializes copies with NO corpus shuffle; the
    // only exchange is the ≤|sources| summary keys. sqrt for the same
    // bit-identical-rates reason as curation_mixture_temperature.
    Q("curation_mixture_epochs",
      """WITH t AS (SELECT doc_id, source,
        |             len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_tokens
        |           FROM documents),
        |tot AS (SELECT source, sum(n_tokens)::BIGINT AS tot FROM t GROUP BY source),
        |m AS (SELECT max(tot)::BIGINT AS mx FROM tot),
        |r AS (SELECT source,
        |             CAST(floor(least(4.0, sqrt((SELECT mx FROM m)::DOUBLE / tot)) * 10000) AS BIGINT) AS rate_bp
        |      FROM tot),
        |c AS (SELECT t.doc_id, t.source, t.n_tokens,
        |             (r.rate_bp // 10000
        |              + CASE WHEN ('0x' || substr(md5(t.doc_id::VARCHAR || ':ep'), 1, 15))::BIGINT % 10000
        |                          < r.rate_bp % 10000 THEN 1 ELSE 0 END) AS n_copies
        |      FROM t JOIN r ON r.source = t.source),
        |x AS (SELECT doc_id, source, n_tokens, unnest(range(n_copies)) AS i FROM c)
        |SELECT source, count(DISTINCT doc_id) AS n_docs, count(*) AS n_rows,
        |       sum(n_tokens)::BIGINT AS tokens_out
        |FROM x GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
      val t = staged(spark, s"$dir#mixture_tokens") {
        table(spark, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(F.tokens(col("text"))).cast("long").as("n_tokens"))
      }
      val tot = t.groupBy("source").agg(sum(col("n_tokens")).as("tot"))
      val mx = tot.agg(max(col("tot")).as("mx"))
      val rates = tot.crossJoin(broadcast(mx))
        .select(col("source"),
          floor(least(lit(4.0), sqrt(col("mx").cast("double") / col("tot"))) * 10000)
            .cast("long").as("rate_bp"))
      t.join(broadcast(rates), Seq("source"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          (floor(col("rate_bp") / 10000).cast("long")
            + when(pmod(F.hash60(concat(col("doc_id").cast("string"), lit(":ep"))), lit(10000L))
                 < col("rate_bp") % 10000, 1L).otherwise(0L)).as("n_copies"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          explode(sequence(lit(1L), col("n_copies"))).as("i"))
        .groupBy("source")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_rows"),
          sum(col("n_tokens")).as("tokens_out"))
        .orderBy("source")
    },

    // Token-budget corpus selection: keep the best documents that fit a
    // training-token budget (30% of the corpus here) — the "data diet"
    // selection every budgeted pretraining run does. Quality = integer
    // distinct-token-ratio bin (EXACT integer arithmetic — no float
    // boundary can flip a bin cross-engine). Two-phase at 100 TB: the
    // per-bin token totals are a 21-row agg; bins wholly inside the
    // budget select scan-locally (no window — every row of an interior
    // bin fits by construction); only the SINGLE boundary bin — the one
    // with prev < budget < prev + btok, at most one exists since prev is
    // a strictly increasing prefix sum — pays the within-bin ordered
    // cumsum (the honest cost of exact budget truncation, confined to
    // that bin's rows). See [[tokenBudgetParts]].
    Q("curation_token_budget",
      """WITH t AS (SELECT doc_id,
        |             len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_tokens,
        |             len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))::BIGINT AS n_uniq
        |           FROM documents),
        |d AS (SELECT doc_id, n_tokens, (n_uniq * 20) // greatest(n_tokens, 1) AS bin FROM t),
        |bt AS (SELECT bin, sum(n_tokens)::BIGINT AS btok FROM d GROUP BY bin),
        |bud AS (SELECT (sum(n_tokens) * 3) // 10 AS b FROM t),
        |w AS (SELECT a.bin, a.btok, coalesce(sum(hb.btok), 0)::BIGINT AS prev
        |      FROM bt a LEFT JOIN bt hb ON hb.bin > a.bin
        |      GROUP BY a.bin, a.btok),
        |sel AS (SELECT d.doc_id, d.bin, d.n_tokens, w.prev,
        |               coalesce(sum(d.n_tokens) OVER (PARTITION BY d.bin ORDER BY d.doc_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_in_bin
        |        FROM d JOIN w ON w.bin = d.bin CROSS JOIN bud
        |        WHERE w.prev < bud.b)
        |SELECT doc_id, bin, n_tokens
        |FROM sel CROSS JOIN bud
        |WHERE prev + cum_in_bin + n_tokens <= bud.b
        |ORDER BY doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      val (interior, boundary) = tokenBudgetParts(spark, dir)
      interior.unionByName(boundary)
        .orderBy("doc_id")
        .limit(1000)
    },

    // Distributed AUC (Mann–Whitney rank-sum with midrank tie handling) —
    // the eval metric every quality-classifier gate reports, computed the
    // way 100 TB allows: rows collapse to per-SCORE groups first (one
    // map-side-combined shuffle of |distinct scores| compact rows), the
    // cross-bucket negative prefix comes from DRIVER-side bucket totals
    // (bounded by the score domain / bucket width — the centroid-array
    // contract), and the within-bucket cumsum window is PARTITIONED by
    // bucket — no unpartitioned window, no row-level global sort
    // anywhere. AUC·2·np·nn = Σ_g np_g·(2·negBelow_g + nn_g) is pure
    // integer arithmetic — exact cross-engine. Score = n_chars,
    // label = lang='en' (the ml_logreg_grad label).
    Q("ml_auc_rank",
      """WITH d AS (SELECT n_chars AS s,
        |             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |           FROM documents),
        |g AS (SELECT s, count(*) AS cnt, sum(pos) AS np_g FROM d GROUP BY s),
        |c AS (SELECT s, np_g, cnt - np_g AS nn_g,
        |             coalesce(sum(cnt - np_g) OVER
        |               (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
        |      FROM g),
        |t AS (SELECT sum(np_g) AS np, sum(nn_g) AS nn,
        |             sum(np_g * (2 * neg_below + nn_g)) AS c2
        |      FROM c)
        |SELECT np::BIGINT AS n_pos, nn::BIGINT AS n_neg,
        |       CASE WHEN np * nn = 0 THEN 500000
        |            ELSE c2 * 1000000 // (2 * np * nn) END::BIGINT AS auc_micro
        |FROM t""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val g = table(spark, dir, "documents")
        .select(col("n_chars").as("s"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
        .groupBy(col("s"))
        .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("np_g"))
        .withColumn("nn_g", col("cnt") - col("np_g"))
      val bucket = (col("s") / lit(AucBucket)).cast("long")
      // bucket totals: driver-sized by construction (score domain /
      // AucBucket), prefix-summed in Scala, broadcast back as a literal
      val bTotals = g.groupBy(bucket.as("b")).agg(sum(col("nn_g")).as("bn"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      val prefix: Map[Long, Long] = {
        var acc = 0L
        bTotals.map { case (b, n) => val p = acc; acc += n; b -> p }.toMap
      }
      val wInBucket = Window.partitionBy(bucket).orderBy(col("s"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val negBelow = coalesce(element_at(typedlit(prefix), bucket), lit(0L)) +
        coalesce(sum(col("nn_g")).over(wInBucket), lit(0L))
      g.select(col("np_g"), col("nn_g"),
          (col("np_g") * (lit(2L) * negBelow + col("nn_g"))).as("c2"))
        .agg(sum("np_g").as("np"), sum("nn_g").as("nn"), sum("c2").as("c2"))
        .select(col("np").as("n_pos"), col("nn").as("n_neg"),
          when(col("np") * col("nn") === 0, lit(500000L))
            .otherwise(expr("c2 * 1000000 div (2 * np * nn)"))
            .cast("long").as("auc_micro"))
    },

    // Reliability-diagram bins (the calibration-curve data behind an ECE
    // report — AUC's companion eval metric): a deterministic pseudo-
    // probability p = min(n_chars/2048, 1⁻) in integer micros, 16
    // confidence bins, each reporting support, Σp and positives — the
    // exact per-bin (confidence, accuracy) pairs a training pipeline
    // persists per eval round. One map-side-combined groupBy of 16 rows;
    // all integers, exact cross-engine.
    Q("ml_reliability_bins",
      """WITH d AS (SELECT least(999999, n_chars * 1000000 // 2048) AS p_micro,
        |             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |           FROM documents)
        |SELECT (p_micro // 62500)::BIGINT AS bin, count(*) AS n,
        |       sum(p_micro)::BIGINT AS sum_p_micro, sum(pos)::BIGINT AS n_pos
        |FROM d GROUP BY bin ORDER BY bin""".stripMargin) { (spark, dir) =>
      table(spark, dir, "documents")
        .select(least(lit(999999L), expr("n_chars * 1000000 div 2048")).as("p_micro"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
        .groupBy(expr("p_micro div 62500").as("bin"))
        .agg(count(lit(1)).as("n"), sum(col("p_micro")).as("sum_p_micro"),
          sum(col("pos")).as("n_pos"))
        .orderBy("bin")
    },

    // nDCG@10 — the graded-relevance ranking metric (Järvelin &
    // Kekäläinen 2002), completing the eval family: AUC ranks binary
    // labels, nDCG scores a RANKING against graded ones. Ranking =
    // distinct-term coverage (ties by doc_id); grade = capped term
    // occurrences — deliberately different orderings, so the metric is
    // informative. Both top-10 cuts are TakeOrdered heaps (never a
    // global window — the rank windows see ≤10 rows), per-position
    // gains micro-floor BEFORE the sum (order-free integer addition),
    // and the final ratio is integer ppm division. Scan → two bounded
    // heaps → two 1-row aggregates at any corpus size.
    Q("ml_ndcg_eval",
      s"""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
         |g AS (SELECT doc_id,
         |        least(len(list_filter(toks, x -> x IN ($inList))), 4) AS rel,
         |        (CASE WHEN list_contains(toks, 'merge') THEN 1 ELSE 0 END
         |       + CASE WHEN list_contains(toks, 'window') THEN 1 ELSE 0 END
         |       + CASE WHEN list_contains(toks, 'hash') THEN 1 ELSE 0 END) AS hits
         |      FROM t),
         |c AS (SELECT * FROM g WHERE hits > 0),
         |pt AS (SELECT rel, hits, doc_id FROM c ORDER BY hits DESC, doc_id LIMIT 10),
         |pr AS (SELECT rel, row_number() OVER (ORDER BY hits DESC, doc_id) AS pos FROM pt),
         |it AS (SELECT rel, doc_id FROM c ORDER BY rel DESC, doc_id LIMIT 10),
         |ir AS (SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS pos FROM it),
         |d AS (SELECT sum(CAST(floor(((1 << rel) - 1)::DOUBLE / log2(pos + 1) * 1000000) AS BIGINT)) AS dcg FROM pr),
         |i AS (SELECT sum(CAST(floor(((1 << rel) - 1)::DOUBLE / log2(pos + 1) * 1000000) AS BIGINT)) AS idcg FROM ir)
         |SELECT (SELECT count(*) FROM c)::BIGINT AS n_candidates,
         |       d.dcg::BIGINT AS dcg_micro, i.idcg::BIGINT AS idcg_micro,
         |       (d.dcg * 1000000 // i.idcg)::BIGINT AS ndcg_ppm
         |FROM d, i""".stripMargin) { (spark, dir) =>
      val t = table(spark, dir, "documents")
        .select(col("doc_id"), F.tokens(col("text")).as("toks"))
      val g = t.select(col("doc_id"),
        least(size(filter(col("toks"), x => x.isin(terms: _*))), lit(4)).as("rel"),
        terms.map(tm => when(array_contains(col("toks"), tm), 1).otherwise(0))
          .reduce(_ + _).as("hits"))
      val c = staged(spark, s"ndcg_c#$dir")(g.filter(col("hits") > 0))
      def gainMicro(posCol: Column): Column =
        floor((expr("shiftleft(1L, cast(rel as int))") - 1L).cast("double")
          / log2(posCol + 1) * 1000000).cast("long")
      val pr = c.orderBy(col("hits").desc, col("doc_id")).limit(10)
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("hits").desc, col("doc_id"))))
      val ir = c.orderBy(col("rel").desc, col("doc_id")).limit(10)
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("rel").desc, col("doc_id"))))
      val d = pr.agg(sum(gainMicro(col("pos"))).as("dcg_micro"))
      val i = ir.agg(sum(gainMicro(col("pos"))).as("idcg_micro"))
      val n = c.agg(count(lit(1)).as("n_candidates"))
      n.crossJoin(d).crossJoin(i)
        .select(col("n_candidates"), col("dcg_micro"), col("idcg_micro"),
          expr("dcg_micro * 1000000 div idcg_micro").as("ndcg_ppm"))
    },

    // Confusion matrix + derived metrics at the 0.5 operating point —
    // the third member of the eval family next to ml_auc_rank
    // (threshold-free ranking) and ml_reliability_bins (calibration):
    // the numbers a curation pipeline actually gates releases on.
    // Same deterministic pseudo-probability as the reliability bins;
    // label = lang='en'. Precision/recall/F1 in exact integer micros
    // (integer division floors identically in both engines). One
    // map-side-combined aggregate to a single row — scan-shaped at any
    // corpus size.
    Q("ml_confusion_matrix",
      """WITH d AS (SELECT CASE WHEN least(999999, n_chars * 1000000 // 2048) >= 500000
        |                  THEN 1 ELSE 0 END AS pred,
        |             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |           FROM documents),
        |m AS (SELECT sum(pred * pos)::BIGINT AS tp,
        |             sum(pred * (1 - pos))::BIGINT AS fp,
        |             sum((1 - pred) * (1 - pos))::BIGINT AS tn,
        |             sum((1 - pred) * pos)::BIGINT AS fn
        |      FROM d)
        |SELECT tp, fp, tn, fn,
        |       CASE WHEN tp + fp = 0 THEN 0 ELSE tp * 1000000 // (tp + fp) END AS precision_micro,
        |       CASE WHEN tp + fn = 0 THEN 0 ELSE tp * 1000000 // (tp + fn) END AS recall_micro,
        |       CASE WHEN 2 * tp + fp + fn = 0 THEN 0
        |            ELSE 2 * tp * 1000000 // (2 * tp + fp + fn) END AS f1_micro
        |FROM m""".stripMargin) { (spark, dir) =>
      val pred = when(least(lit(999999L), expr("n_chars * 1000000 div 2048")) >= 500000, 1L)
        .otherwise(0L)
      val pos = when(col("lang") === "en", 1L).otherwise(0L)
      table(spark, dir, "documents")
        .select(pred.as("pred"), pos.as("pos"))
        .agg(sum(col("pred") * col("pos")).as("tp"),
          sum(col("pred") * (lit(1L) - col("pos"))).as("fp"),
          sum((lit(1L) - col("pred")) * (lit(1L) - col("pos"))).as("tn"),
          sum((lit(1L) - col("pred")) * col("pos")).as("fn"))
        .select(col("tp"), col("fp"), col("tn"), col("fn"),
          when(col("tp") + col("fp") === 0, 0L)
            .otherwise(expr("tp * 1000000 div (tp + fp)")).as("precision_micro"),
          when(col("tp") + col("fn") === 0, 0L)
            .otherwise(expr("tp * 1000000 div (tp + fn)")).as("recall_micro"),
          when(lit(2L) * col("tp") + col("fp") + col("fn") === 0, 0L)
            .otherwise(expr("2 * tp * 1000000 div (2 * tp + fp + fn)")).as("f1_micro"))
    },

    // One distributed logistic-regression gradient step for a quality
    // classifier (the fastText-style gate every curation stack trains):
    // w=0 start, so sigma(w.x) = 0.5 EXACTLY and the gradient is
    // sum_i (0.5 - y_i) x_i with no transcendentals; per-doc contributions
    // are floored to integer micros BEFORE the sum, so the aggregation is
    // an order-free integer sum (bit-identical cross-engine — the same
    // BSP discipline as ml_kmeans_step: map-side partials, a k-row
    // shuffle, driver sees only the k-dim gradient). Label = lang='en';
    // features = [bias, distinct-token ratio, stopword ratio, tokens/1e3].
    Q("ml_logreg_grad",
      s"""WITH f AS ($FeatSql),
        |g AS (SELECT k, CAST(floor((0.5 - y) * x[k + 1] * 1000000) AS BIGINT) AS c
        |      FROM f CROSS JOIN (SELECT unnest(range(4)) AS k))
        |SELECT k::BIGINT AS k, sum(c)::BIGINT AS grad_micro, count(*) AS n
        |FROM g GROUP BY k ORDER BY k""".stripMargin) { (spark, dir) =>
      stagedFeatures(spark, dir).select(col("y"), posexplode(col("x")).as(Seq("k", "xv")))
        .groupBy(col("k").cast("long").as("k"))
        .agg(sum(floor((lit(0.5) - col("y")) * col("xv") * 1000000).cast("long")).as("grad_micro"),
          count(lit(1)).as("n"))
        .orderBy("k")
    },

    // Gradient-dot data attribution (the TracIn shape, Pruthi et al.
    // 2020, single checkpoint): influence(train doc) = ∇loss(doc) ·
    // ∇loss(validation set). Same w=0 logistic setup as ml_logreg_grad
    // (σ(w·x) = 0.5 exactly — no transcendentals), validation = every
    // 7th doc_id, held out of the scored set. Per-doc per-dim gradient
    // contributions are floored to integer micros, the validation
    // gradient is their order-free integer sum, and the influence is an
    // integer dot product — bit-exact cross-engine. Scale shape: the
    // validation gradient is a 4-row broadcast agg; scoring is
    // scan-local arithmetic against that literal; top-k is TakeOrdered —
    // the corpus never shuffles, which is what makes per-example
    // attribution feasible at 100 TB (the full TracIn sum over
    // checkpoints is this same plan run per checkpoint).
    Q("ml_influence_grad_dot",
      s"""WITH f AS ($FeatSql),
        |gv AS (SELECT k, sum(CAST(floor((0.5 - y) * x[k + 1] * 1000000) AS BIGINT)) AS g
        |       FROM f CROSS JOIN (SELECT unnest(range(4)) AS k) ks
        |       WHERE doc_id % 7 = 0 GROUP BY k),
        |s AS (SELECT f.doc_id,
        |        sum(CAST(floor((0.5 - f.y) * f.x[gv.k + 1] * 1000000) AS BIGINT) * gv.g) AS infl
        |      FROM f CROSS JOIN gv
        |      WHERE f.doc_id % 7 <> 0 GROUP BY f.doc_id)
        |SELECT doc_id, infl::BIGINT AS infl_micro2,
        |       row_number() OVER (ORDER BY infl DESC, doc_id) AS rk
        |FROM s QUALIFY rk <= 20 ORDER BY rk""".stripMargin) { (spark, dir) =>
      val f = stagedFeatures(spark, dir)
      // validation gradient: 4 integers to the driver (the broadcast side)
      val gv: Seq[Long] = f.filter(col("doc_id") % 7 === 0)
        .select(posexplode(col("x")).as(Seq("k", "xv")), col("y"))
        .groupBy(col("k"))
        .agg(sum(floor((lit(0.5) - col("y")) * col("xv") * 1000000).cast("long")).as("g"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1).map(_._2).toSeq
      val infl = (0 until 4).map(k =>
        floor((lit(0.5) - col("y")) * col("x")(k) * 1000000).cast("long") * lit(gv(k)))
        .reduce(_ + _)
      f.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), infl.as("infl_micro2"))
        .orderBy(col("infl_micro2").desc, col("doc_id"))
        .limit(20)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("infl_micro2").desc, col("doc_id"))).cast("long"))
    },

    // Cross-source contamination matrix: how many distinct 5-gram
    // shingles each PAIR of sources shares, and the share as a fraction
    // of the smaller side — the "who overlaps whom" audit run before
    // mixing sources into one training corpus (inter-source leakage is
    // dedup's blind spot when runs dedup per source). Scale shape: one
    // distinct (source, gram-md5) aggregate, then a gram-keyed self-join
    // whose payload is compact md5 keys — the decontaminate discipline
    // applied source-pairwise; output is at most the a<b pairs with a
    // NONZERO overlap (≤ |sources|·(|sources|−1)/2 rows at any corpus
    // size — disjoint pairs are absent, not zero rows). Fraction in
    // exact integer micros.
    Q("curation_source_overlap",
      """WITH g AS (SELECT DISTINCT source,
        |             unnest(list_transform(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 3),
        |               i -> md5(array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i + 4), ' ')))) AS g
        |           FROM documents),
        |tot AS (SELECT source, count(*) AS tot FROM g GROUP BY source),
        |sh AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS shared
        |       FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
        |       GROUP BY a.source, b.source)
        |SELECT sh.source_a, sh.source_b, sh.shared::BIGINT AS shared,
        |       ((sh.shared * 1000000) // least(ta.tot, tb.tot))::BIGINT AS frac_micro
        |FROM sh JOIN tot ta ON ta.source = sh.source_a
        |        JOIN tot tb ON tb.source = sh.source_b
        |ORDER BY source_a, source_b""".stripMargin) { (spark, dir) =>
      val g = staged(spark, s"$dir#src_grams") {
        table(spark, dir, "documents")
          .select(col("source"),
            explode(F.shingles(F.tokens(col("text")), 5)).as("s"))
          .select(col("source"), md5(col("s")).as("g"))
          .distinct()
      }
      val tot = g.groupBy("source").agg(count(lit(1)).as("tot"))
      val sh = g.select(col("source").as("source_a"), col("g"))
        .join(g.select(col("source").as("source_b"), col("g")), Seq("g"))
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("shared"))
      sh
        .join(tot.select(col("source").as("source_a"), col("tot").as("ta")), Seq("source_a"))
        .join(tot.select(col("source").as("source_b"), col("tot").as("tb")), Seq("source_b"))
        .select(col("source_a"), col("source_b"), col("shared"),
          expr("(shared * 1000000) div least(ta, tb)").as("frac_micro"))
        .orderBy("source_a", "source_b")
    },

    // Three full gradient-descent steps of a least-squares linear probe
    // on the same features/label as ml_logreg_grad — the multi-step BSP
    // training loop (the quality-probe every curation stack fits), where
    // the single-step queries only show one round. Same iteration shape
    // as the distributed Lloyd trainer: each step is ONE corpus pass with
    // map-side partial sums and a 4-key gradient shuffle; the driver sees
    // exactly 4 numbers per round (the weights), never rows. The linear
    // model keeps every operation inside IEEE +,*,/ (no transcendental
    // sigmoid whose libm could differ cross-engine); per-doc gradient
    // contributions floor to integer micros BEFORE the order-free sum,
    // and weights re-quantize to micros after each step, so all three
    // steps replay bit-identically in the oracle's chained CTEs. lr=0.1.
    // Steps 1–2 collect their 4-long gradient; step 3 stays IN-PLAN (the
    // returned frame derives the final weights from the live aggregate).
    Q("ml_linear_probe_train",
      s"""WITH f AS ($FeatSql),
         |$probeTrainCtes,
         |${probeGradCte("g3", "w2")},
         |${probeStepCte("w3", "g3", "w2")}
         |SELECT k::BIGINT AS k, wm[k + 1]::BIGINT AS w_micro
         |FROM w3 CROSS JOIN (SELECT unnest(range(4)) AS k) ks
         |ORDER BY k""".stripMargin) { (spark, dir) =>
      val f = stagedFeatures(spark, dir)
      val w2 = probeStep(f, probeStep(f, Seq(0L, 0L, 0L, 0L)))
      // the third step stays IN the plan (no extra driver hop): the final
      // weights are assembled from w2 literals + the last gradient agg
      probeGradAgg(f, w2).select(posexplode(array((0 until 4).map(k =>
          lit(w2(k)) - floor(col(s"gr$k").cast("double") / (lit(10.0) * col("n"))).cast("long")): _*))
        .as(Seq("k", "w_micro")))
        .select(col("k").cast("long").as("k"), col("w_micro"))
        .orderBy("k")
    },

    // Classifier-based quality filtering, end-to-end — the GPT-3/CCNet
    // curation stage: train a linear quality probe (two replayed GD steps
    // on the weak lang-id label), score EVERY document with the trained
    // weights, keep the top 40% by score. The selection is scale-shaped
    // the way curation_token_budget is: scores histogram into bounded
    // 10k-micro bins, interior bins are decided wholesale from a
    // broadcast bin-prefix table, and the row_number window runs ONLY
    // inside the single boundary bin — no global rank/sort anywhere, so
    // the plan survives a corpus 1000× this size.
    Q("ml_quality_filter_apply",
      s"""WITH f AS ($FeatSql),
         |$probeTrainCtes,
         |s AS (SELECT f.doc_id, CAST(floor(($probeDotSql) * 1000000) AS BIGINT) AS score_micro
         |      FROM f CROSS JOIN w2 w),
         |b AS (SELECT doc_id, score_micro,
         |             CAST(floor(score_micro::DOUBLE / 10000) AS BIGINT) AS bin FROM s),
         |bt AS (SELECT bin, count(*)::BIGINT AS cnt FROM b GROUP BY bin),
         |wd AS (SELECT a.bin, a.cnt, coalesce(sum(hb.cnt), 0)::BIGINT AS prev
         |       FROM bt a LEFT JOIN bt hb ON hb.bin > a.bin GROUP BY a.bin, a.cnt),
         |kk AS (SELECT (count(*) * 2) // 5 AS k FROM b),
         |r AS (SELECT b.doc_id, b.score_micro, wd.cnt, wd.prev,
         |             row_number() OVER (PARTITION BY b.bin
         |                                ORDER BY b.score_micro DESC, b.doc_id) AS rn
         |      FROM b JOIN wd ON wd.bin = b.bin)
         |SELECT r.doc_id, d.source, r.score_micro,
         |       CAST(CASE WHEN r.prev + r.cnt <= kk.k OR
         |                      (r.prev < kk.k AND r.rn <= kk.k - r.prev)
         |                 THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM r CROSS JOIN kk JOIN documents d ON d.doc_id = r.doc_id
         |ORDER BY r.doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val f = stagedFeatures(spark, dir)
      val w2 = probeStep(f, probeStep(f, Seq(0L, 0L, 0L, 0L)))
      val binned = f.select(col("doc_id"),
          floor(probeDot(w2) * 1000000).cast("long").as("score_micro"))
        .withColumn("bin", floor(col("score_micro").cast("double") / 10000).cast("long"))
      val bt = binned.groupBy("bin").agg(count(lit(1)).as("cnt"))
      // docs in strictly-higher bins: a bins×bins broadcast self-join —
      // the bin table is bounded by the score domain, never by the corpus
      val wd = bt.as("a").join(bt.as("hb"), col("hb.bin") > col("a.bin"), "left")
        .groupBy(col("a.bin").as("bin"), col("a.cnt").as("cnt"))
        .agg(coalesce(sum(col("hb.cnt")), lit(0L)).as("prev"))
      val kDf = binned.agg(expr("(count(1) * 2) DIV 5").as("k"))
      val flagged = binned.join(broadcast(wd), "bin").crossJoin(broadcast(kDf))
      val interior = flagged.filter(col("prev") + col("cnt") <= col("k"))
        .withColumn("kept", lit(1L))
      val belowCut = flagged.filter(col("prev") >= col("k"))
        .withColumn("kept", lit(0L))
      val wnd = Window.partitionBy("bin")
        .orderBy(col("score_micro").desc, col("doc_id"))
      val boundary = flagged
        .filter(col("prev") < col("k") && col("prev") + col("cnt") > col("k"))
        .withColumn("rn", row_number().over(wnd))
        .withColumn("kept", when(col("rn") <= col("k") - col("prev"), 1L).otherwise(0L))
        .drop("rn")
      interior.unionByName(belowCut).unionByName(boundary)
        .join(table(spark, dir, "documents").select(col("doc_id"), col("source")), "doc_id")
        .select(col("doc_id"), col("source"), col("score_micro"), col("kept"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // The WHOLE pretraining-data pipeline composed end-to-end, ONE
    // declarative plan: exact dedup (lowest doc_id survives) → Gopher
    // quality gate (word count, alphabetic ratio, stopword floor) →
    // benchmark decontamination (any shared 5-gram with the eval set
    // drops the doc) → domain-mixture sampling (per-source basis-point
    // rates equalizing token contributions) → sequence packing (bucketed
    // 512-token concat-and-chop) → per-(source, bucket) accounting.
    // Catalyst sees all six stages at once and pipelines the scan-local
    // ones; the only shuffles are the dedup window, the gram join, and
    // the pack window — each on compact keys at any corpus size.
    Q("pipeline_pretrain_e2e",
      s"""WITH d1 AS (SELECT doc_id, source, text,
        |             row_number() OVER (PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
        |           FROM documents),
        |d2 AS (SELECT doc_id, source, text,
        |              regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |       FROM d1 WHERE rn = 1),
        |d3 AS (SELECT doc_id, source, toks FROM d2
        |       WHERE len(toks) BETWEEN 30 AND 90
        |         AND len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))::DOUBLE / greatest(len(toks), 1) > 0.8
        |         AND len(list_filter(toks, t -> t IN ('the', 'and', 'of', 'to', 'a'))) >= 2),
        |eg AS (SELECT DISTINCT unnest(list_transform(range(1, len(toks) - 3), i ->
        |              md5(array_to_string(list_slice(toks, i, i + 4), ' ')))) AS g
        |       FROM d2 WHERE doc_id % 97 = 0 AND len(toks) >= 5),
        |cg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3), i ->
        |              md5(array_to_string(list_slice(toks, i, i + 4), ' ')))) AS g
        |       FROM d3),
        |dirty AS (SELECT DISTINCT cg.doc_id FROM cg JOIN eg ON eg.g = cg.g),
        |d4 AS (SELECT d3.doc_id, d3.source, len(d3.toks)::BIGINT AS n_tokens
        |       FROM d3 LEFT JOIN dirty ON dirty.doc_id = d3.doc_id
        |       WHERE dirty.doc_id IS NULL),
        |tot AS (SELECT source, sum(n_tokens)::BIGINT AS tot FROM d4 GROUP BY source),
        |r AS (SELECT source, ((SELECT min(tot) FROM tot) * 10000) // tot AS rate_bp FROM tot),
        |d5 AS (SELECT d4.doc_id, d4.source, d4.n_tokens,
        |              ('0x' || substr(md5(d4.doc_id::VARCHAR || ':pack'), 1, 15))::BIGINT % ${graft.queries.Packing.Buckets} AS bucket
        |       FROM d4 JOIN r ON r.source = d4.source
        |       WHERE ('0x' || substr(md5(d4.doc_id::VARCHAR || ':mix'), 1, 15))::BIGINT % 10000 < r.rate_bp),
        |d6 AS (SELECT doc_id, source, bucket, n_tokens,
        |              coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum
        |       FROM d5)
        |SELECT source, bucket, count(*) AS n_docs, sum(n_tokens)::BIGINT AS n_tokens,
        |       count(DISTINCT cum // ${graft.queries.Packing.SeqLen})::BIGINT AS n_seqs
        |FROM d6 GROUP BY source, bucket
        |ORDER BY source, bucket LIMIT 1000""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val enStopCols = Seq("the", "and", "of", "to", "a")
      val d1 = table(spark, dir, "documents")
        .withColumn("rn", row_number().over(
          Window.partitionBy(md5(lower(trim(col("text"))))).orderBy("doc_id")))
      val d2 = staged(spark, s"$dir#pipe_d2") { // feeds the gate AND the eval gram side
        d1.filter(col("rn") === 1)
          .select(col("doc_id"), col("source"), F.tokens(col("text")).as("toks"))
      }
      val nToks = size(col("toks"))
      val d3 = d2.filter(
        nToks.between(30, 90) &&
        (size(filter(col("toks"), t => t.rlike("[a-z]"))).cast("double") /
          greatest(nToks, lit(1))) > 0.8 &&
        size(filter(col("toks"), t => t.isin(enStopCols: _*))) >= 2)
      // docs under 5 tokens yield no grams (Spark's sequence() would go
      // DESCENDING on a negative stop — DuckDB's range is just empty)
      def grams(df: org.apache.spark.sql.DataFrame) = df
        .filter(size(col("toks")) >= 5)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("toks")) - 4),
            i => md5(array_join(slice(col("toks"), i, lit(5)), " ")))).as("g"))
      val eg = grams(d2.filter(col("doc_id") % 97 === 0)).select("g").distinct()
      val dirty = decontaminateJoin(grams(d3), eg, s"$dir#pipe_ev").select("doc_id").distinct()
      val d4 = staged(spark, s"$dir#pipe_d4") { // feeds the rate table AND the sampled scan
        d3.join(dirty, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("source"), size(col("toks")).cast("long").as("n_tokens"))
      }
      val tot = d4.groupBy("source").agg(sum(col("n_tokens")).as("tot"))
      val rates = tot.crossJoin(broadcast(tot.agg(min(col("tot")).as("mn"))))
        .select(col("source"), expr("(mn * 10000) div tot").as("rate_bp"))
      val d5 = d4.join(broadcast(rates), Seq("source"))
        .filter(pmod(F.hash60(concat(col("doc_id").cast("string"), lit(":mix"))), lit(10000L)) < col("rate_bp"))
        .withColumn("bucket",
          pmod(F.hash60(concat(col("doc_id").cast("string"), lit(":pack"))),
            lit(graft.queries.Packing.Buckets.toLong)))
      val w = Window.partitionBy("bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      d5.withColumn("cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .groupBy("source", "bucket")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
          countDistinct(expr(s"cum div ${graft.queries.Packing.SeqLen}")).as("n_seqs"))
        .orderBy("source", "bucket")
        .limit(1000)
    },

    // The WHOLE curation flow composed end-to-end — exact dedup (keep the
    // lowest doc_id per content hash) → minimum-length quality gate →
    // reproducible hash split → per-(lang, split) corpus accounting. One
    // declarative plan: dedup is one md5-keyed window, the gate and split
    // are scan-local, the accounting is a partial-agg groupBy — three
    // narrow shuffles total at any corpus size, each on compact keys.
    Q("curation_pipeline_e2e",
      """WITH d AS (SELECT doc_id, lang, text,
        |                  row_number() OVER (PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
        |           FROM documents),
        |t AS (SELECT doc_id, lang,
        |             len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_tokens
        |      FROM d WHERE rn = 1),
        |s AS (SELECT lang, n_tokens,
        |             CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 15))::BIGINT % 100 < 90
        |                  THEN 'train' ELSE 'val' END AS split
        |      FROM t WHERE n_tokens >= 20)
        |SELECT lang, split, count(*) AS n_docs, sum(n_tokens)::BIGINT AS total_tokens
        |FROM s GROUP BY lang, split ORDER BY lang, split""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(md5(lower(trim(col("text"))))).orderBy(col("doc_id"))
      table(spark, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"),
          size(F.tokens(col("text"))).cast("long").as("n_tokens"))
        .filter(col("n_tokens") >= 20)
        .withColumn("split",
          when(pmod(F.hash60(concat(col("doc_id").cast("string"), lit(":split"))), lit(100)) < 90, "train")
            .otherwise("val"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
        .orderBy("lang", "split")
    },

    // Repetition profile (C4/Gopher-style degenerate-text filters):
    // top-bigram mass fraction (most frequent 2-gram · 2 / token count)
    // and duplicate-3-gram fraction. All-integer inputs → the micro
    // quantization is exact in both engines.
    Q("text_repetition_profile",
      """WITH g2 AS (
        |  SELECT doc_id, g, count(*) AS c
        |  FROM (SELECT doc_id,
        |               unnest(list_transform(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+'))),
        |                 i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i + 1), ' '))) AS g
        |        FROM documents)
        |  GROUP BY doc_id, g),
        |top2 AS (SELECT doc_id, max(c) AS top_c, sum(c)::BIGINT AS n2 FROM g2 GROUP BY doc_id),
        |g3 AS (
        |  SELECT doc_id, count(*) AS n3, count(DISTINCT g) AS d3
        |  FROM (SELECT doc_id,
        |               unnest(list_transform(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 1),
        |                 i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i + 2), ' '))) AS g
        |        FROM documents)
        |  GROUP BY doc_id)
        |SELECT top2.doc_id,
        |       top2.n2 + 1 AS n_tokens,
        |       top2.top_c AS top_bigram_n,
        |       CAST(floor(top2.top_c * 2.0 / (top2.n2 + 1) * 1000000) AS BIGINT) AS rep2_micro,
        |       CAST(floor((g3.n3 - g3.d3) * 1.0 / g3.n3 * 1000000) AS BIGINT) AS dup3_micro
        |FROM top2 JOIN g3 ON g3.doc_id = top2.doc_id
        |ORDER BY top2.doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      val docs = table(spark, dir, "documents")
        .select(col("doc_id"), F.tokens(col("text")).as("toks"))
      val g2 = docs.select(col("doc_id"), explode(F.shingles(col("toks"), 2)).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      val top2 = g2.groupBy("doc_id").agg(max("c").as("top_c"), sum("c").as("n2"))
      val g3 = docs.select(col("doc_id"), explode(F.shingles(col("toks"), 3)).as("g"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n3"), countDistinct(col("g")).as("d3"))
      top2.join(g3, Seq("doc_id"))
        .select(
          col("doc_id"),
          (col("n2") + 1).as("n_tokens"),
          col("top_c").as("top_bigram_n"),
          floor(col("top_c") * 2.0 / (col("n2") + 1) * 1000000).cast("long").as("rep2_micro"),
          floor((col("n3") - col("d3")) * 1.0 / col("n3") * 1000000).cast("long").as("dup3_micro"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // Margin-ratio bitext mining (Artetxe & Schwenk, the CCMatrix/LASER
    // recipe): mine translation pairs by pairing English docs with
    // same-sign-LSH-bucket docs of other languages and scoring each
    // candidate by cos(a,b) normalized by both sides' average top-k
    // candidate cosine — the margin kills hub vectors that are merely
    // "close to everything", which raw cosine cannot. Forward top-1 per
    // English doc at margin > 1. All integer after the micro-floored
    // cosine: margin_bp = cos·2k·10⁴ / (Σtop-k_a + Σtop-k_b) — exact
    // cross-engine. Scale shape: the ONLY pair generator is the
    // 256-bucket sign-LSH join (the ann_lsh_bucketed scheme — 8
    // broadcast hyperplanes, scan-local signature, bucket-keyed join;
    // pair cost Σ_b |en_b|·|xx_b|, never |en|·|xx|); windows partition
    // by doc id over candidate sets only. At 100 TB the recall lever is
    // multi-probe/multi-table on the same shape (ann_lsh_multitable),
    // not a wider product.
    Q("curation_bitext_mine",
      s"""WITH $signLsh8CtesSql,
        |ld AS (SELECT d.doc_id, d.lang, bk.bucket, e.embedding
        |       FROM documents d JOIN bk ON bk.vec_id = d.doc_id
        |       JOIN embeddings e ON e.vec_id = d.doc_id),
        |pc AS (SELECT * FROM
        |         (SELECT a.doc_id AS a_id, b.doc_id AS b_id, b.lang AS b_lang,
        |                 CAST(floor(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) * 1000000) AS BIGINT) AS cos_micro
        |          FROM ld a JOIN ld b ON a.bucket = b.bucket
        |          WHERE a.lang = 'en' AND b.lang <> 'en')
        |       WHERE cos_micro > 0),
        |ra AS (SELECT a_id, sum(cos_micro) AS sum_a FROM
        |         (SELECT a_id, cos_micro,
        |                 row_number() OVER (PARTITION BY a_id ORDER BY cos_micro DESC, b_id) AS rn
        |          FROM pc) WHERE rn <= 4 GROUP BY a_id),
        |rb AS (SELECT b_id, sum(cos_micro) AS sum_b FROM
        |         (SELECT b_id, cos_micro,
        |                 row_number() OVER (PARTITION BY b_id ORDER BY cos_micro DESC, a_id) AS rn
        |          FROM pc) WHERE rn <= 4 GROUP BY b_id),
        |m AS (SELECT p.a_id, p.b_id, p.b_lang, p.cos_micro,
        |             ((p.cos_micro * 80000) // (ra.sum_a + rb.sum_b))::BIGINT AS margin_bp
        |      FROM pc p JOIN ra ON ra.a_id = p.a_id JOIN rb ON rb.b_id = p.b_id)
        |SELECT a_id, b_id, b_lang, cos_micro, margin_bp FROM
        |  (SELECT *, row_number() OVER (PARTITION BY a_id ORDER BY margin_bp DESC, b_id) AS rn FROM m)
        |WHERE rn = 1 AND margin_bp >= 10000
        |ORDER BY margin_bp DESC, a_id LIMIT 200""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      import graft.functions.VectorFunctions.cosineSim
      val ld = table(spark, dir, "documents").select(col("doc_id"), col("lang"))
        .join(signLsh8Buckets(table(spark, dir, "embeddings"))
          .withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
      val a = ld.filter(col("lang") === "en")
        .select(col("doc_id").as("a_id"), col("bucket"), col("embedding").as("av"))
      val b = ld.filter(col("lang") =!= "en")
        .select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
          col("bucket"), col("embedding").as("bv"))
      // staged: the bucket join + cosine is the expensive half and feeds
      // THREE consumers (the pair scan and both top-k denominator sides);
      // one checkpoint computes it once (same discipline as the dedup
      // pair-stats table)
      val pc = staged(spark, s"$dir#bitext_pc")(
        a.join(b, Seq("bucket"))
          .select(col("a_id"), col("b_id"), col("b_lang"),
            floor(cosineSim(col("av"), col("bv")) * 1000000).cast("long").as("cos_micro"))
          .filter(col("cos_micro") > 0))
      val ra = pc
        .withColumn("rn", row_number().over(
          Window.partitionBy("a_id").orderBy(col("cos_micro").desc, col("b_id"))))
        .filter(col("rn") <= 4).groupBy("a_id").agg(sum("cos_micro").as("sum_a"))
      val rb = pc
        .withColumn("rn", row_number().over(
          Window.partitionBy("b_id").orderBy(col("cos_micro").desc, col("a_id"))))
        .filter(col("rn") <= 4).groupBy("b_id").agg(sum("cos_micro").as("sum_b"))
      pc.join(ra, Seq("a_id")).join(rb, Seq("b_id"))
        .withColumn("margin_bp", expr("cos_micro * 80000 DIV (sum_a + sum_b)"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("a_id").orderBy(col("margin_bp").desc, col("b_id"))))
        .filter(col("rn") === 1 && col("margin_bp") >= 10000)
        .select(col("a_id"), col("b_id"), col("b_lang"), col("cos_micro"), col("margin_bp"))
        .orderBy(col("margin_bp").desc, col("a_id"))
        .limit(200)
    }
  )
}
