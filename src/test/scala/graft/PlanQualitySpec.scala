package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, countDistinct}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the scale properties claimed in README
  * ("candidate generation never shuffles the fact table", "small sides are
  * broadcast", "filters reach the scan") asserted against the actual
  * physical plans, so a future edit that silently degrades a plan fails CI.
  */
class PlanQualitySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** Final physical plan with AQE off — deterministic shape for assertions
    * (AQE re-plans at runtime but starts from this plan). */
  private def plan(name: String): String = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("d2 KNN: no shuffle exchange — scan + broadcast + TakeOrderedAndProject") {
    val p = plan("d2_knn_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("ShuffleExchange") && !p.contains("Exchange hashpartitioning"), p)
  }

  test("d2 KNN: filter pushed to parquet scan") {
    val p = plan("d2_knn_topk")
    assert(p.contains("PushedFilters: [IsNotNull(vec_id), Not(EqualTo(vec_id,0))]") ||
      p.contains("PushedFilters: [IsNotNull(vec_id), Not(EqualTo(vec_id,0"), p)
  }

  test("d4 keyword scan: single pass, no shuffle, top-k") {
    val p = plan("d4_keyword_search")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    // the single-pass rewrite: one regexp per operator (filter/project/sort
    // key), NOT one per term — 3 terms would inline 9+ under the old shape
    val regexCount = "regexp_extract_all".r.findAllIn(p).size
    assert(regexCount <= 3, s"regex inlined $regexCount times:\n$p")
  }

  test("q5 dimension join: part side broadcast, no shuffle join") {
    val p = plan("q5_broadcast_brand_agg")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("column pruning: d2 reads only vec_id + embedding") {
    val p = plan("d2_knn_topk")
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"), p)
  }

  test("semi/anti joins plan as broadcast semi/anti") {
    assert(plan("q_semi_join").contains("LeftSemi"), plan("q_semi_join"))
    assert(plan("q_anti_join").contains("LeftAnti"), plan("q_anti_join"))
  }

  test("dedup exact: partial aggregation before the exchange (map-side combine)") {
    val p = plan("dedup_exact")
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
  }

  test("MaxSim multi-vector: one corpus scan, partial per-doc max before the only exchange") {
    val p = plan("ann_maxsim_multivector")
    // the |Q| cosines are literal-broadcast scan-local columns: nothing
    // joins, and the single hash exchange carries |docs| rows of longs
    // (partial max computed map-side), never the embedding column
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_max") || p.contains("HashAggregate"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected at most one doc-keyed exchange, got $exchanges\n$p")
    assert(!p.contains("Exchange hashpartitioning(embedding") &&
      !"Exchange [^\\n]*embedding".r.findFirstIn(p).isDefined,
      s"an exchange carries the embedding column\n$p")
  }

  test("no query ever plans a CartesianProduct (unbounded pair blowup)") {
    // BroadcastNestedLoopJoin with a tiny build side is fine (query vectors);
    // a true CartesianProduct of two large sides is never acceptable
    val oracleBacked = SparkEntry.oracleSql.keySet
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      oracleBacked.toSeq.sorted.foreach { name =>
        val p = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
        assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct:\n$p")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("dedup pair joins are LSH-bucket-local — keyed on bkey/bucket, never lang/label") {
    // the at-scale dedup contract: every pairwise verify join's equality key
    // is an LSH bucket (band/bkey for MinHash, bucket for sign-LSH); a
    // regression to lang- or label-blocked all-pairs would show those
    // columns as join keys
    // the verify queries read the STAGED pair-stats checkpoint, which
    // hides the bucket join from their own plans — assert the shared
    // builder directly (same device as the components assertion below)
    for ((kind, df) <- graft.queries.DedupQueries.pairStatsPlans(spark, sf)) {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("bkey"), s"pair-stats[$kind] lost its band-bucket join:\n$p")
      assert(!p.contains("lang"), s"pair-stats[$kind] joins on lang again:\n$p")
    }
    // the components query checkpoints away its upstream plan; assert the
    // edge-generation plan (what the BSP loop consumes) directly
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pe0 = graft.dedup.DedupPipeline.edges(docs, 0.9)
      .queryExecution.executedPlan.toString
    assert(pe0.contains("bkey"), s"DedupPipeline.edges lost its band-bucket join:\n$pe0")
    assert(!pe0.contains("lang"), s"DedupPipeline.edges joins on lang again:\n$pe0")
    val pe = plan("dedup_embedding_cosine")
    assert(pe.contains("bucket"), s"sign-LSH bucket key missing:\n$pe")
    assert(!pe.contains("label"), s"dedup_embedding_cosine joins on label again:\n$pe")
  }

  test("windowed pair generation is join-free: sliding frame, never a bucket self-join") {
    // the sf1-decade finding (round 10): a self-join keyed only on
    // (band, bkey) materializes Σ|bucket|² rows BEFORE the rn-window
    // filter — one templated-text mega-bucket made mm_blockhash_pairs
    // G=60 at 10× data (97 s vs 1.6 s). The sliding-frame collect_list
    // emits n·W pairs directly; these plans must stay join-free.
    // round 12: the parallel sorted-neighborhood (SortedNeighborhood,
    // shared by the whole pair family since the r11 judge found simhash's
    // 4-bit band keys capping the naive bucket window at 64 tasks) plans
    // a BROADCAST join of the partition-spanning rank offsets (≤ ~2 ×
    // #partitions metadata rows) — bounded by construction; the quadratic
    // hazard this pin guards against is a shuffle SELF-join of the
    // signature rows, and the parallelism hazard a bucket-keyed window
    import org.apache.spark.sql.functions.array_distinct
    val minhashPairs = graft.dedup.DedupPipeline.candidatePairs(
      graft.dedup.DedupPipeline.bandBuckets(
        spark.read.parquet(s"$sf/documents.parquet")
          .select(col("doc_id"),
            array_distinct(graft.functions.F.tokens(col("text"))).as("toks")),
        "doc_id", "toks"),
      "doc_id", stageKey = "planspec#minhash_rk")
    val named = Seq(
      "dedup_simhash_pairs" -> plan("dedup_simhash_pairs"),
      "dedup_simhash_pairs_skew" -> plan("dedup_simhash_pairs_skew"),
      "mm_blockhash_pairs" -> plan("mm_blockhash_pairs"),
      "minhash_candidatePairs" -> minhashPairs.queryExecution.executedPlan.toString)
    for ((name, p) <- named) {
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        s"$name pairs via a bucket self-join again (quadratic pre-filter blowup):\n$p")
      assert(!p.replace("BroadcastHashJoin", "").contains("Join"),
        s"$name plans a non-broadcast join:\n$p")
      assert(p.contains("Window"), s"$name lost its sliding-frame pair window:\n$p")
      // the frame window must partition by the rank CHUNK, not the bare
      // bucket — (band, bkey) alone is the 64-task ceiling
      assert(p.contains("__jc"), s"$name frame window lost its chunk key:\n$p")
    }
  }

  test("q_range_join_binned derives its plan from density: bin-join sparse, join-free prefix-count dense") {
    // the sf10-decade finding (round 11): on a FIXED 30-day span the
    // bin-join's Σ|errors|·|events| pair product grows ~100x per data
    // decade (50.2 s at sf10 vs 3.1 s rewritten); the density-derived
    // switch must plan the prefix-count (ZERO joins) once pair work
    // clears 32 linear passes, and keep the cheaper broadcast bin-join
    // on sparse corpora.
    assert(plan("q_range_join_binned").contains("Join"),
      "sparse corpus lost the broadcast bin-join")
    import spark.implicits._
    val tmp = graft.util.TempRoot.dir("dense-ev-")
    // one bin, 20k events, 4k errors: pairWork = 4k·20k >> 32·20k
    (0 until 20000).map(i => (i.toLong,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        if (i % 5 == 0) "error" else "view", (i % 97).toLong))
      .toDF("event_id", "ts", "event_type", "user_id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val p = SparkEntry.queries("q_range_join_binned")(spark, tmp.toString)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"dense corpus still plans the pair join:\n$p")
    assert(p.contains("Window"), s"dense corpus lost the prefix-count window:\n$p")
  }

  test("norm-precompute rule: d2b written as plain cosine plans normalized_dot, not cosine_sim") {
    // SURVEY §4 upgrade 3 as a Catalyst rule (round 11): the query AUTHORS
    // cosine_sim over norm-tagged columns; NormPrecomputeRewrite must
    // rewrite it to the 1-FMA/element normalized_dot form at analysis time.
    val p = plan("d2b_knn_precomputed_norm")
    assert(p.contains("normalized_dot"), s"norm-precompute rewrite did not fire:\n$p")
    assert(!p.contains("cosine_sim"), s"fused cosine survived despite tagged norms:\n$p")
  }

  test("norm-precompute rule is value-exact, including the zero-vector guard (0.0, never NaN)") {
    import spark.implicits._
    import graft.functions.VectorFunctions.{cosineSim, l2Norm, normTagged}
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f)), // zero norm: fused cosine yields 0.0
      (3L, Array(-1.5f, 0.25f, 8.0f)),
      (4L, Array(0.1f, -0.2f, 0.3f))).toDF("id", "v")
    val q = Seq(Tuple1(Array(0.5f, -1.0f, 2.0f))).toDF("qv")
    // fused: no tags in scope → rule must NOT touch it
    val fused = df.crossJoin(q)
      .select($"id", cosineSim($"v", $"qv").as("s"))
    assert(fused.queryExecution.executedPlan.toString.contains("cosine_sim"))
    val fusedRows = fused.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // tagged: both sides carry precomputed norms → rewrite fires
    val tagged = df.select($"id", $"v", normTagged(l2Norm($"v"), "nv", "v"))
      .crossJoin(q.select($"qv", normTagged(l2Norm($"qv"), "nq", "qv")))
      .select($"id", cosineSim($"v", $"qv").as("s"))
    assert(tagged.queryExecution.executedPlan.toString.contains("normalized_dot"))
    val taggedRows = tagged.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(taggedRows == fusedRows, // bit-exact double equality, not approx
      s"rewrite changed values: fused=$fusedRows tagged=$taggedRows")
    assert(taggedRows(2L) == 0.0, "zero-norm row must stay 0.0 (never NaN)")
  }

  test("BM25: df and corpus stats broadcast; the only corpus shuffle is the posting groupBy") {
    val p = plan("text_bm25_rank")
    assert("BroadcastExchange".r.findAllIn(p).size >= 2, s"df/stats not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("IVF cell assignment is scan-local — no exchange carries the corpus embedding") {
    val p = plan("ann_ivf_cells")
    // assignment = scan + broadcast centroid array + argmax projection; the
    // only acceptable exchanges are the broadcasts and the tiny final rank
    // window — a hashpartitioning exchange whose output carries the
    // embedding column means the expanded corpus is being shuffled again
    val shuffles = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
    shuffles.foreach { line =>
      assert(!line.contains("embedding") && !line.contains("qv"),
        s"IVF shuffles embeddings:\n$line\n$p")
    }
    assert(!p.contains("Window.partitionBy(vec_id)") &&
      !p.contains("windowspecdefinition(vec_id"), s"per-vector window is back:\n$p")
  }

  test("keyword candidate rank runs AFTER top-k truncation (no unbounded global window)") {
    // kwRanked must TakeOrderedAndProject before its row_number window —
    // the window then sees ≤depth rows, not every keyword match
    val p = plan("d7_rrf_fusion")
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      s"expected both sem and kw branches to truncate before ranking:\n$p")
  }

  test("live engine keyword branch is a posting join, not a corpus regex scan") {
    import org.apache.spark.sql.functions.{coalesce, col, concat_ws, lit}
    val chunks = graft.queries.EngineQueries.chunksFor(spark, sf)
    val postings = graft.queries.EngineQueries.postingsFor(spark, sf)
    val engine = new graft.search.HybridEngine(spark, chunks,
      postings = Some(postings))
    val p = engine.keywordCandidates(Seq("merge", "window"), 20)
      .queryExecution.executedPlan.toString
    // the live query section (above the cached postings' build lineage,
    // which legitimately contains the tokenizing regex) must be a postings
    // filter + tf-sum, not a text scan
    val live = p.split("InMemoryRelation").head
    assert(!live.contains("regexp_extract_all"), s"keyword branch still scans with regex:\n$p")
    assert(live.contains("token"), s"posting join missing:\n$p")
    // fallback (no postings) keeps the scan shape with rank-after-topk
    val scan = new graft.search.HybridEngine(spark, chunks)
      .keywordCandidates(Seq("merge", "window"), 20)
      .queryExecution.executedPlan.toString
    assert(scan.contains("TakeOrderedAndProject"), scan)
  }

  test("keyword branch: posting join and fallback scan return IDENTICAL candidates") {
    val chunks = graft.queries.EngineQueries.chunksFor(spark, sf)
    val postings = graft.queries.EngineQueries.postingsFor(spark, sf)
    val withIndex = new graft.search.HybridEngine(spark, chunks, postings = Some(postings))
    val scanOnly = new graft.search.HybridEngine(spark, chunks)
    for (toks <- Seq(Seq("merge", "window"), Seq("hash"), Seq("zzz_no_such_token"))) {
      val a = withIndex.keywordCandidates(toks, 20).collect().map(_.toSeq).toSeq
      val b = scanOnly.keywordCandidates(toks, 20).collect().map(_.toSeq).toSeq
      assert(a.map(_.take(1)) == b.map(_.take(1)), s"ids diverge for $toks: $a vs $b")
      assert(a.map(_.last) == b.map(_.last), s"ranks diverge for $toks")
    }
  }

  test("PQ encode+ADC is scan-local: codegen pq_encode, zero joins/exchanges") {
    val p = plan("ann_pq_adc")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("pq_encode"), p)
    assert(!p.contains("Join") && !p.contains("Exchange"), p)
  }

  test("IVFPQ: cell-pruned scan + codegen pq_encode, broadcast-only joins, no embedding shuffle") {
    val p = plan("ann_ivfpq")
    assert(p.contains("pq_encode"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // coarse assignment + probe filter must stay scan-local: the only joins
    // are the broadcast centroid-array cross joins, never a shuffle join
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    p.split("\n").filter(_.contains("Exchange hashpartitioning")).foreach { line =>
      assert(!line.contains("embedding"), s"IVFPQ shuffles embeddings:\n$line\n$p")
    }
  }

  test("correlated scalar subqueries (q17) are decorrelated into aggregate joins") {
    // Catalyst must rewrite the per-row subqueries into ONE per-part
    // aggregate + join; a surviving correlated ScalarSubquery node would
    // re-execute per row — quadratic at scale
    val p = plan("q17_small_qty_revenue")
    assert(!p.contains("ScalarSubquery"), s"correlated subquery not decorrelated:\n$p")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
  }

  test("q18 IN-subquery prunes orders left-semi BEFORE the wide joins") {
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q18_large_orders")(spark, sf).queryExecution.executedPlan
      // the LeftSemi join must be a DESCENDANT of the customer join — the
      // qualifying-order filter runs before any wide join fans rows out
      val custJoin = plan.collect {
        case j: BaseJoinExec if j.condition.toString.contains("c_custkey") ||
          j.leftKeys.mkString.contains("custkey") || j.rightKeys.mkString.contains("custkey") => j
      }
      assert(custJoin.nonEmpty, s"customer join missing:\n$plan")
      val semiBelow = custJoin.head.exists {
        case j: BaseJoinExec => j.joinType.toString == "LeftSemi"
        case _ => false
      }
      assert(semiBelow, s"semi filter not below the customer join:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("topk_by aggregate: map-side partial top-k, no window, filter pushed to scan") {
    val p = plan("q_topk_by_agg")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_topk_by"), s"partial aggregation missing — every row would shuffle:\n$p")
    assert(!p.contains("Window"), s"topk_by fell back to a window:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(value)]"), p)
  }

  test("range join: binning turns the inequality join into an equi join (no nested-loop)") {
    val p = plan("q_range_join_binned")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$p")
    assert(p.contains("bin"), s"bin key missing from the join:\n$p")
  }

  test("dedup_semantic: dominance join is cell-local (cid-keyed), assignment scan-local") {
    val p = plan("dedup_semantic")
    assert(p.contains("cid"), s"cell id no longer the join key:\n$p")
    assert(!p.contains("label"), s"semantic dedup joins on label:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("decontamination: eval gram set broadcast under the threshold, corpus side never shuffles docs") {
    val p = plan("curation_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("decontamination: above the broadcast threshold the join falls back to a gram-keyed shuffle") {
    // the honest regime: an eval side too big for the driver must NOT be
    // broadcast — decontaminateJoin switches to a shuffle join, keyed on
    // the gram, and results are identical
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("curation_decontaminate")(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"), s"eval side still broadcast past the threshold:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a shuffle join in the fallback regime:\n$p")
      // the join key stays the gram in both regimes
      assert(p.contains("[g"), s"join no longer keyed on the gram:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("stratified sample: salted two-phase rank equals the direct single window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val twoPhase = SparkEntry.queries("curation_stratified_sample")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val direct = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))).cast("long"))
      .filter(col("rk") <= 50)
      .select(col("lang"), col("doc_id"), col("rk"))
      .orderBy("lang", "rk")
      .collect().map(_.toSeq).toSeq
    assert(twoPhase == direct)
  }

  test("fused hybrid scoring: corpus-side joins broadcast; the full-outer fusion merges only limit-bounded top-k lists") {
    import org.apache.spark.sql.execution.{GlobalLimitExec, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qe = SparkEntry.queries("hybrid_search_fused")(spark, sf).queryExecution
      val p = qe.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("CartesianProduct"), p)
      // FULL OUTER can't broadcast — but both its inputs must be the
      // ≤depth ranked lists (limit-bounded), never the corpus
      qe.executedPlan.foreach {
        case j: SortMergeJoinExec =>
          Seq(j.left, j.right).foreach { side =>
            val bounded = side.exists {
              case _: TakeOrderedAndProjectExec | _: GlobalLimitExec => true
              case _ => false
            }
            assert(bounded, s"fusion SMJ side is unbounded (corpus shuffle):\n${side.treeString}")
          }
        case _ => ()
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("SQL-interface hybrid: branch top-k before window rank, fusion joins only bounded lists, one final top-k") {
    import org.apache.spark.sql.execution.{GlobalLimitExec, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.window.WindowExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qe = SparkEntry.queries("sql_interface_hybrid")(spark, sf).queryExecution
      val p = qe.executedPlan.toString
      // corpus joins (embeddings×documents, ×1-row query) broadcast — the
      // fact side never shuffles before its branch top-k
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("CartesianProduct"), p)
      // each branch: TakeOrderedAndProject(depth) BELOW the window rank,
      // so the global row_number sorts ≤60 rows, never the corpus
      qe.executedPlan.foreach {
        case w: WindowExec =>
          val bounded = w.exists {
            case _: TakeOrderedAndProjectExec | _: GlobalLimitExec => true
            case _ => false
          }
          assert(bounded, s"window rank over an unbounded input:\n${w.treeString}")
        case j: SortMergeJoinExec =>
          Seq(j.left, j.right).foreach { side =>
            val bounded = side.exists {
              case _: TakeOrderedAndProjectExec | _: GlobalLimitExec => true
              case _ => false
            }
            assert(bounded, s"fusion SMJ side is unbounded (corpus shuffle):\n${side.treeString}")
          }
        case _ => ()
      }
      // one final top-20 at the root
      assert(qe.executedPlan.isInstanceOf[TakeOrderedAndProjectExec] ||
        qe.executedPlan.exists(_.isInstanceOf[TakeOrderedAndProjectExec]), p)
      // held to the SAME oracle as the DataFrame pipeline — one query,
      // two entry points (the registry enforces the shared string)
      assert(SparkEntry.oracleSql("sql_interface_hybrid") ==
        SparkEntry.oracleSql("hybrid_search_fused"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("large-payload byte-window rows: kernel scan-local below the only exchanges, doc filter pushed to the scan") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // (query, byte-kernel expression marker, max shuffles: the final
      // 6-row sort — plus the media_id islands window for the energy
      // segmentation)
      val cases = Seq(
        ("mm_blockhash_large", "byte_window_sums", 1),
        ("dedup_cdc_boundaries_large", "byte_cdc_boundaries", 1),
        ("mm_energy_segments_large", "byte_window_sums", 2))
      cases.foreach { case (name, kernel, maxShuffles) =>
        val qe = SparkEntry.queries(name)(spark, sf).queryExecution
        val p = qe.executedPlan.toString
        // the six-doc fixture filter reaches the parquet scan
        assert(p.contains("PushedFilters: [In(doc_id"), s"$name: no pushed IN filter\n$p")
        val shuffles = qe.executedPlan.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.size <= maxShuffles,
          s"$name: ${shuffles.size} shuffles (cap $maxShuffles) — the O(len) kernel must not shuffle payloads\n$p")
        // every shuffle sits ABOVE the byte kernel: the 1 MiB payloads
        // never cross an exchange; only compact derived rows do
        shuffles.foreach { e =>
          assert(e.child.exists(_.toString.contains(kernel)),
            s"$name: byte kernel '$kernel' not below the exchange\n$p")
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("token-budget selection: interior bins windowless, the cumsum input filtered to ONE boundary bin") {
    import org.apache.spark.sql.execution.window.WindowExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qe = SparkEntry.queries("curation_token_budget")(spark, sf).queryExecution
      val p = qe.executedPlan.toString
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
      // the per-doc cumsum window must be keyed by bin (parallel across
      // bins), never a global single-partition sort of the corpus
      val docWindows = qe.executedPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      docWindows.foreach { w =>
        // unpartitioned windows allowed only over the tiny bin table
        assert(w.treeString.contains("btok") || w.treeString.contains("LocalTableScan"),
          s"unpartitioned window over the corpus:\n${w.treeString}")
      }

      // the round-5 finding: the comment promised "only the boundary bin
      // pays the cumsum" but the window ran over EVERY candidate bin.
      // Now structural: the interior half has no window at all, and the
      // boundary half's window input is a join against the ≤1-row
      // boundary-bin side — so the single-task ordered scan is confined
      // to one bin's rows, not the interior mass
      val (interior, boundary) =
        graft.queries.CurationQueries.tokenBudgetParts(spark, sf)
      assert(interior.queryExecution.executedPlan.collect {
        case w: WindowExec => w
      }.isEmpty, "interior bins must select scan-locally, with no window")
      val bWindows = boundary.queryExecution.executedPlan.collect {
        case w: WindowExec => w
      }
      assert(bWindows.nonEmpty, "boundary half lost its ordered cumsum")
      bWindows.foreach(w => assert(
        w.treeString.contains("BroadcastHashJoin") || w.treeString.contains("BroadcastNestedLoop"),
        s"boundary window input is not the boundary-bin join:\n${w.treeString}"))
      // and the boundary predicate admits at most one bin by construction
      assert(boundary.select(countDistinct(col("bin"))).head().getLong(0) <= 1,
        "more than one bin reached the ordered cumsum")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("logreg gradient: partial aggregation before the exchange (k-row shuffle)") {
    val p = plan("ml_logreg_grad")
    assert(p.contains("partial_sum") || p.contains("partial"), s"no map-side combine:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("PCA covariance: one native gram_micro pass — partial buffers ship, no per-product rows") {
    val p = plan("ml_pca_covariance")
    assert(p.contains("gram_micro"), s"native aggregate missing:\n$p")
    // partial ObjectHashAggregate below the exchange: each map task ships
    // ONE tri(64) buffer, not 2080 product rows per input vector
    assert(p.contains("partial_gram_micro"), s"no partial gram aggregation:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("every unpartitioned window sits above a limit-bounded input (the property that makes the WindowExec warnings benign)") {
    import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec, LocalTableScanExec, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.window.WindowExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      SparkEntry.oracleSql.keySet.toSeq.sorted.foreach { name =>
        val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
        plan.foreach {
          case w: WindowExec if w.partitionSpec.isEmpty =>
            val bounded = w.child.exists {
              case _: TakeOrderedAndProjectExec | _: GlobalLimitExec |
                   _: LocalLimitExec | _: LocalTableScanExec => true
              case _ => false
            }
            assert(bounded,
              s"$name runs an UNPARTITIONED window over unbounded input — " +
                s"a single-partition funnel at scale:\n${w.treeString}")
          case _ => ()
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("Bloom decontamination probe is one shuffle-free corpus pass") {
    // the operator's whole claim: the eval suite rides in as a 64 KB
    // array literal and the corpus pays scan → higher-order filter →
    // compact rows — NO keyed exchange anywhere on the probe side. The
    // registered query hides this chain behind its localCheckpoint
    // barrier (Scan ExistingRDD), so assert over the PRE-checkpoint
    // builder directly (the cdc test's unstaged-builder pattern). The
    // only exchange allowed is the single round-robin scan fan-out.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val probe =
      try graft.queries.CurationQueries.bloomDecontamProbe(spark, sf)
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(!probe.contains("Exchange hashpartitioning"), probe)
    assert(!probe.contains("ScalaUDF") && !probe.contains("BatchEvalPython"), probe)
    val nonBroadcast = probe.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("BroadcastExchange")).toSeq
    assert(nonBroadcast.forall(_.contains("RoundRobinPartitioning")) &&
      nonBroadcast.size <= 1, s"unexpected exchange in probe chain:\n$probe")
    // and the registered query still tops out in ONE TakeOrdered above
    // the materialized compact frame
    val p = plan("curation_bloom_decontam")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q5 star join: dimensions broadcast at test scale, single rollup shuffle, no forced fact broadcast") {
    val p = plan("q5_region_nation_revenue")
    // at test SF every side fits the broadcast threshold, so the planner
    // (not a forced hint) broadcasts all four join sides
    assert(p.split("BroadcastHashJoin").length - 1 >= 4, p)
    // the ONLY hash exchange is the final <=|nations| group rollup
    assert(p.split("Exchange hashpartitioning").length - 1 <= 1, p)
    assert(!p.contains("SortMergeJoin"), p)
    // the orders/customer joins must NOT carry an explicit broadcast hint —
    // they are fact-scale in TPC-H and must be free to degrade to shuffle
    // joins past the threshold (the logical plan records hints; the three
    // explicit ones are region, the collapsed nation set, and supplier)
    val analyzed = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try SparkEntry.queries("q5_region_nation_revenue")(spark, sf)
        .queryExecution.analyzed.toString
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    val hinted = "UnresolvedHint|ResolvedHint".r.findAllIn(analyzed).size
    assert(hinted <= 3, s"expected <=3 explicit broadcast hints, got $hinted: $analyzed")
  }

  test("multi-table LSH: one corpus scan, zero exchanges, single sign_lsh_buckets node") {
    val p = plan("ann_lsh_multitable")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("ShuffleExchange") && !p.contains("Exchange hashpartitioning"), p)
    // the candidate test runs over ONE expression evaluation per row — the
    // 64-dot composition this replaced inlined 64 nodes and was
    // plan-compile-bound
    assert(p.contains("sign_lsh_buckets"), p)
  }

  test("embed decontam: eval vectors broadcast, corpus-side argmax fold never shuffles an embedding") {
    // the cosine twin of the bloom probe's contract: the eval split
    // aggregates to ONE broadcast row and the corpus pays scan →
    // scan-local fold → TakeOrdered; the only exchange anywhere is the
    // eval side's single-row aggregation
    val p = plan("curation_embed_decontam")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange hashpartitioning(vec_id") &&
      !p.contains("Exchange hashpartitioning(embedding"), p)
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p)
  }

  test("KMV sketch: k-minimum merge is a TakeOrdered heap, not a global sort") {
    val p = plan("sketch_kmv_distinct")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort "), p) // no full sort of the hash set
  }

  test("salted skew join: the join condition carries the salt sub-key") {
    val p = plan("q_salted_skew_join")
    val joinLines = p.linesIterator.filter(l => l.contains("Join") && l.contains("user_id")).toSeq
    assert(joinLines.nonEmpty, p)
    assert(joinLines.exists(_.contains("salt")),
      s"join not salted — a hot key lands on one partition:\n${joinLines.mkString("\n")}")
  }

  test("HLL sketch: register branch aggregates map-side, no distinct before it") {
    val p = plan("sketch_hll_distinct")
    // the register agg must run partial (map-side MAX specifically) before
    // its 1024-key exchange — the shape that makes HLL an O(m)-state sketch
    assert(p.contains("partial_max"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the register branch never sorts or globally de-dups the hash stream
    // (the exact-reference branch pays its distinct through the SHARED
    // staged checkpoint, not in this plan)
    assert(!p.contains("Sort "), p)
  }

  test("triangle count: every join is a keyed equi-join, no cartesian wedge") {
    val p = plan("graph_triangle_count")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("label propagation: the argmax window is node-partitioned, never global") {
    val p = plan("graph_label_prop")
    val windows = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty, p)
    windows.filter(_.contains("row_number")).foreach(w =>
      assert(w.contains("partitionBy") || w.contains("hashpartitioning") ||
        w.contains("doc_id"), s"global window in label prop: $w"))
  }

  test("whole-stage codegen covers the cosine kernel (no UDF break)") {
    val p = plan("d2_knn_topk")
    // compact tree format marks codegen stages with *(n); the scoring
    // Project must be inside one
    assert(p.contains("*(2) Project") || p.contains("*(1) Project"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }

  test("runtime bloom filter: a selective dim filter injects might_contain into the fact scan side") {
    // At 100 TB the fact side of a shuffled fact⋈dim join should be
    // row-pruned BEFORE the exchange when the dim side is selective —
    // Spark's InjectRuntimeFilter does exactly that; this pins that our
    // join shapes stay eligible. Thresholds are lowered because the
    // fixture scan is tiny; a real cluster crosses them naturally.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val j = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"), s"no runtime bloom filter injected:\n$p")
      // the bloom probe must sit on the fact (lineitem) scan side
      assert(p.indexOf("might_contain") < p.indexOf("lineitem.parquet"), p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("weighted sample: scan-local keys + TakeOrdered heap, the corpus never shuffles") {
    val p = plan("curation_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    // the only post-heap step is the 256-row rank window (single
    // partition over a bounded input — covered by the global-window test)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("influence: validation gradient broadcast as literal, scoring scan-local + TakeOrdered") {
    val p = plan("ml_influence_grad_dot")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), s"influence scoring should not join:\n$p")
  }

  test("standardize: map-side partial sums, d-row broadcast stats join, no corpus-wide merge join") {
    val p = plan("embed_standardize")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("multi-table LSH: literal hyperplanes, one scan, zero exchanges") {
    val p = plan("ann_lsh_multitable")
    assert(p.contains("TakeOrderedAndProject"), p)
    // all 64 signatures AND the candidate test are scan-local literal
    // folds — nothing joins, nothing shuffles, however many tables
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("text_fingerprint: encode(lower(text)) stays hoisted — never inlined into the minhash lambda") {
    val p = plan("text_fingerprint")
    // the payload projection is the linearity guarantee: one encode per
    // ROW. If CollapseProject ever inlined the non-cheap alias into the
    // transform lambda, encode(lower(text)) would re-evaluate per
    // 8-gram — O(len²/4) per doc (the round-7 quadratic family). The
    // 1 MB-payload spec pins the wall-time shape; this pins the plan.
    val encodes = "encode\\(".r.findAllIn(p).size
    assert(encodes == 1, s"expected exactly one encode() in the plan, got $encodes:\n$p")
    assert("lower\\(".r.findAllIn(p).size == 1, p)
  }

  test("ann_lsh_auto_geometry: one corpus scan against a broadcast sample, no corpus shuffle") {
    val p = plan("ann_lsh_auto_geometry")
    // the θ̂ estimate is the only data-sized work: corpus scan ×
    // broadcast 16-query sample; everything after the k-NN window is
    // driver-sized (one θ row × 16 band candidates)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("Exchange hashpartitioning(vec_id"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ann_ivf_auto_nprobe: broadcast sample, partial top-k windows, no cartesian") {
    val p = plan("ann_ivf_auto_nprobe")
    // the corpus appears only in broadcast-sample crossJoins (assignment +
    // ground truth); the exact-top-10 windows run as per-partition partial
    // top-k (WindowGroupLimit) so the q_id shuffle carries k·|Q| rows, and
    // everything past `nb` is ≤ 160 rows × a 16-row literal range
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
    p.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
      .foreach(e => assert(
        e.contains("hashpartitioning") || e.contains("rangepartitioning(nprobe") ||
          e.contains("SinglePartition"), // the tot/pick scalar aggs: inputs ≤ k·|Q| rows
        s"unexpected shuffle: $e"))
  }

  test("quality filter: the rank window is bin-partitioned, bin tables ride broadcast joins") {
    val p = plan("ml_quality_filter_apply")
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, p)
    // the top-k cut must never rank globally: every window spec is keyed
    // by the bounded score bin
    windows.foreach(w => assert(w.contains("bin#"), s"global rank window: $w"))
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("word entropy: one tokenize pass, compact-key shuffles only, no global window, no cartesian") {
    val p = plan("text_word_entropy")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // ONE tokenize pass: the corpus is scanned and tokenized exactly once
    // (the pre-r15 shape planned two full scan→tokenize branches)
    assert("Scan parquet".r.findAllIn(p).size == 1, s"more than one corpus scan:\n$p")
    assert("regexp_extract_all".r.findAllIn(p).size <= 2,
      s"tokenize inlined more than once:\n$p")
    // the n_tokens window is doc_id-partitioned (compact rows), never global
    p.linesIterator.filter(_.contains("windowspecdefinition"))
      .foreach(w => assert(w.contains("doc_id#"), s"global window: $w"))
    // every non-broadcast exchange is keyed, except the ONE scan fan-out
    // (F.fanout round-robins a single-split input below the tokenize
    // chain — round 14; identity on real multi-split corpora)
    val nonKeyed = p.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("BroadcastExchange")
        && !l.contains("hashpartitioning")).toSeq
    nonKeyed.foreach(e => assert(e.contains("RoundRobinPartitioning"),
      s"non-keyed non-fan-out shuffle: $e"))
    assert(nonKeyed.size <= 1, s"more than one fan-out exchange:\n$p")
  }

  test("cdc dedup: one scan-local boundary pass, chunk-hash-keyed shuffles only, no join") {
    // the chunk BUILD (staged once per dir, shared by chunks/savings/
    // containment): boundary detection + chunk hashing are scan-local —
    // the codegen rolling pass + O(slice) binary substrings, ZERO
    // exchanges before the staging checkpoint
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val build =
      try graft.queries.DedupQueries.cdcChunksUnstaged(spark, sf)
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(build.contains("byte_cdc_boundaries"), build)
    assert(!build.contains("Exchange"), build)
    // the rollup over the staged table: only chunk-hash-keyed exchanges —
    // no join, window, or cartesian
    val p = plan("dedup_cdc_chunks")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("windowspecdefinition"), p)
    p.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
      .foreach(e => assert(e.contains("hashpartitioning"), s"non-keyed shuffle: $e"))
  }

  test("containment dedup: bucket-keyed joins only, no cartesian or nested-loop pair blowup") {
    val p = plan("dedup_containment")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("cdc containment: windowed bucket pairs over the staged chunk table, no cartesian") {
    val p = plan("dedup_cdc_containment")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("image decode: codec work is scan-local — encode, decode, hash per row, top-k only") {
    val p = plan("mm_image_decode")
    assert(p.contains("png_encode_rgb"), p)
    // ONE decode per payload: stats + ahash ride the same expression
    assert(p.contains("image_decode_stats"), p)
    assert(!p.contains("image_ahash"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // at 100 TB the payloads dominate storage: the codec must run inside
    // the scan and only the top-k rows may move
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("video frame decode: pack, unpack, and per-frame codec all scan-local — top-k only") {
    val p = plan("mm_video_frame_decode")
    assert(p.contains("len_prefixed_slices"), p)
    assert(p.contains("image_decode_stats"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("rollup: grouping sets expand before ONE partial agg — subtotals don't multiply jobs") {
    val p = plan("q_rollup_pricing")
    assert(p.contains("Expand"), p)
    // Expand feeds a partial+final hash agg pair: exactly one
    // hash-keyed exchange for all grouping levels together
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
  }

  test("set ops: INTERSECT/EXCEPT become semi/anti joins on the distinct key") {
    val p = plan("q_set_ops")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bitext mining: hyperplane broadcast is the only cross, candidates bucket-keyed, partial top-k windows") {
    val p = plan("curation_bitext_mine")
    assert(!p.contains("CartesianProduct"), p)
    // rank<=k filters push into partial per-partition top-k
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // the candidate-pair table is STAGED (computed once for its three
    // consumers), so the hyperplane broadcast cross lives only in the
    // staging build — the serving plan has no nested-loop join at all
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bucketed co-located join: bucketed scans feed the SMJ with zero join-side shuffle") {
    val p = plan("q_bucketed_colocated_join")
    assert(p.contains("SortMergeJoin"), p)
    // both sides read the bucketed layout (all 8 buckets, no pruning here)
    assert(p.contains("SelectedBucketsCount: 8 out of 8"), p)
    // the only hash exchange in the whole plan is the final aggregate's —
    // the join itself gets its co-partitioning from the storage layout
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("partition-pruned scan: date range lands in PartitionFilters, 3 of 30 day-directories read") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q_partition_pruned_scan")(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      // the range prunes DIRECTORIES at planning time (never opens a file)
      assert(p.contains("PartitionFilters:"), p)
      assert(p.contains("dt#"), p)
      // and column pruning reaches the scan: only the two needed columns
      assert(p.contains("ReadSchema: struct<event_type:string,value:double>"), p)
      df.collect()
      val scan = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head
      assert(scan.metrics("numPartitions").value == 3L,
        s"expected 3 day-partitions read, got ${scan.metrics("numPartitions").value}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("DPP join: dim-side filter prunes fact partitions at runtime via dynamicpruning") {
    val p = plan("q_dpp_partition_join")
    // the dim filter reaches the fact scan as a runtime IN-subquery over
    // the partition column — the defining mark of dynamic partition pruning
    assert(p.contains("dynamicpruning"), p)
    assert(p.contains("PartitionFilters:"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("AQE skew join: a skewed shuffle partition splits at runtime into multiple reader tasks") {
    // The runtime complement of the explicitly-salted joins
    // (q_salted_skew_agg/join): when a shuffle partition exceeds the skew
    // thresholds, AQE's OptimizeSkewedJoin splits it across reader tasks
    // without any query rewrite. Thresholds are lowered to fire at
    // fixture scale; the plan marker (skew=true on the SMJ), not the
    // default threshold, is the contract.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions.{md5, concat_ws, count, lit => flit, when => fwhen}
      // 99.5% of the left side lands on key 0 — one shuffle partition
      // carries ~200k rows while the median carries ~10. The md5 payload
      // keeps the skewed partition's shuffle bytes incompressible (a
      // constant-key partition of bare longs would LZ4 down to under any
      // threshold and hide the skew from the byte-based rule).
      val skewed = spark.range(200000L)
        .select((fwhen(col("id") % 200 =!= 0, 0L)
          .otherwise(col("id") % 97)).as("k"),
          md5(concat_ws(":", col("id"), col("id") * 7)).as("payload"))
      val dim = spark.range(97L).select(col("id").as("k"), (col("id") * 10).as("w"))
      // max(payload) (not count) so column pruning can't strip the
      // payload from the pre-join shuffle; a GLOBAL aggregate (no
      // groupBy on the join key) so no downstream operator requires the
      // join's output partitioning — OptimizeSkewedJoin only splits when
      // the split doesn't force an extra shuffle
      val j = skewed.join(dim, Seq("k"))
        .agg(org.apache.spark.sql.functions.max(col("payload")).as("pmax"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"AQE did not mark the join skewed:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("SCD2 history: one user-keyed exchange feeds both windows and the run aggregate") {
    val p = plan("q_scd2_history")
    // lag window, running-sum window, (user_id, run) aggregate and the
    // lead window all cluster on user_id — one hash exchange serves all
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("merge upsert: both sides collapse to one row per key before a co-partitioned full-outer SMJ") {
    val p = plan("q_merge_upsert")
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"), p)
    // one user-keyed exchange per side (window dedup), reused by the join
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("time gap fill: sequence-explode spine (no range join), one-row span broadcasts, user-keyed carry-forward window") {
    val p = plan("q_time_gap_fill")
    // the calendar spine comes from explode(sequence(...)) — a Generate —
    // never an interval/range join over the corpus
    assert(p.contains("Generate"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop joins are the two one-row (mn, mx) span
    // broadcasts (the scalar-broadcast idiom)
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 2, p)
    // every window (the carry-forward running max) keys on user_id
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("user_id#")), p)
  }

  test("shuffle order: rank windows are bucket-partitioned, offsets broadcast, final order is a TakeOrdered heap") {
    val p = plan("curation_shuffle_order")
    // the corpus-sized window must key on the hash bucket; the only
    // unpartitioned window is the 8-row offset prefix sum
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.exists(_.contains("bucket#")), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("auto salt agg: partial agg keys on (user_id, salt), final on user_id, no cartesian") {
    val p = plan("q_auto_salt_agg")
    assert(p.contains("hashpartitioning(user_id"), p)
    assert(p.contains("salt"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("curriculum order: every shuffle is source-keyed, final order is a TakeOrdered heap") {
    val p = plan("curation_curriculum_order")
    assert(p.contains("TakeOrderedAndProject"), p)
    // both window passes key their exchange on source (never a global sort)
    val exchanges = "Exchange hashpartitioning\\([^)]*".r.findAllIn(p).toSeq
    assert(exchanges.nonEmpty, p)
    assert(exchanges.forall(_.contains("source")), exchanges.mkString("\n"))
    assert(!p.contains("Exchange rangepartitioning"), p)
  }
}
