package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.RecallEval

/** Recall floors for the approximate-ANN family at bench scale (sf0.1,
  * round-4 "What's missing #3"). The synthetic driver embeddings are
  * near-uniform (no cluster structure), so absolute recall here is LOW by
  * construction — cell pruning loses roughly the unprobed fraction; the
  * clustered-distribution contract (recall ≥ 0.9) lives in AnnEngineSpec.
  * These floors are REGRESSION CANARIES pinned under the measured values
  * (RECALL_r05.json), plus the structural properties that must hold on any
  * distribution: the nprobe knob is monotone, and the SQ8 two-phase probe
  * is exact at full coverage. */
class RecallSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("LSH near-dup pair recall vs brute-force ground truth (the banding guarantee)") {
    import org.apache.spark.sql.functions.col
    val docs = graft.queries.table(spark, "/root/testdata/sf0.01", "documents")
    val found = graft.dedup.DedupPipeline.edges(docs, 0.9, sampleMod = 4)
      .collect().map(r => {
        val (a, b) = (r.getLong(0), r.getLong(1))
        (math.min(a, b), math.max(a, b))
      }).toSet

    // brute-force truth over the SAME sampled distinct-token sets
    val sets = docs.filter(col("doc_id") % 4 === 0).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet)
    val ids = sets.map(_._1).sorted
    val byId = sets.toMap
    val truth = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      sa = byId(ids(i)); sb = byId(ids(j))
      inter = (sa & sb).size.toDouble
      if inter / (sa.size + sb.size - inter) >= 0.9
    } yield (ids(i), ids(j))).toSet
    assert(truth.nonEmpty, "fixture has no >=0.9 near-dup pairs — spec is vacuous")

    // contract 1 — no false positives ever (candidates are Jaccard-VERIFIED)
    assert(found.subsetOf(truth), s"verified pairs beyond truth: ${found -- truth}")

    // contract 2 — direct pair listing is WINDOW-BOUNDED by design (a
    // k-clique holds k²/2 pairs, the window emits ≤ k·W), so its floor
    // is partial; 0.84 measured at W=32 on this fixture
    val pairRecall = (truth & found).size.toDouble / truth.size
    info(f"LSH pair recall at J>=0.9: $pairRecall%.3f over ${truth.size} true pairs")
    assert(pairRecall >= 0.8, f"windowed pair recall regressed: $pairRecall%.3f")

    // contract 3 — the one that defines dedup GROUPING: every true pair
    // connected through the found edges (1.000 measured at W=32; the
    // seeded hashes make this deterministic)
    val parent = scala.collection.mutable.Map(
      (found.flatMap(p => Seq(p._1, p._2)) ++ truth.flatMap(p => Seq(p._1, p._2)))
        .map(i => i -> i).toSeq: _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    found.foreach { case (a, b) => parent(find(a)) = find(b) }
    val co = truth.count { case (a, b) => find(a) == find(b) }
    info(s"true pairs co-component: $co/${truth.size}")
    assert(co.toDouble / truth.size >= 0.99,
      s"dedup grouping split true near-dup pairs: $co/${truth.size}")
  }

  test("sf0.1 recall floors: IVF beats chance, nprobe is monotone, SQ8 two-phase is exact") {
    val report = RecallEval.evaluate(spark, "/root/testdata/sf0.1")
    def recall(variant: String, params: String): Double =
      report.variants.find(v => v.variant == variant && v.params.contains(params))
        .getOrElse(fail(s"missing variant $variant $params")).recallAtK

    val ivf1 = recall("ivf", "nprobe=1")
    val ivf2 = recall("ivf", "nprobe=2")
    val ivf4 = recall("ivf", "nprobe=4")

    // measured 0.24 / 0.355 / 0.535 (2026-08); floors leave jitter room
    // but catch a broken assignment (chance rate = nprobe/16)
    assert(ivf1 >= 0.12, s"IVF nprobe=1 recall $ivf1 at or below the 1/16 chance rate")
    assert(ivf2 >= 0.25, s"IVF nprobe=2 recall $ivf2 regressed")
    assert(ivf4 >= 0.40, s"IVF nprobe=4 recall $ivf4 regressed")
    // the recall knob must actually be a knob
    assert(ivf1 < ivf2 && ivf2 < ivf4,
      s"nprobe not monotone in recall: $ivf1 / $ivf2 / $ivf4")

    // the serving path: approximate selection + exact re-rank with 4×
    // overfetch loses (almost) nothing at full coverage
    assert(recall("sq8_two_phase", "overfetch") >= 0.95,
      "SQ8 two-phase probe lost recall despite exact re-rank")

    // 1-bit sign signatures + exact re-rank (8 bytes/vector phase 1):
    // measured 0.725 on the near-uniform corpus — the cheapest usable
    // prefilter; floor leaves jitter room
    assert(recall("binary_rerank", "bits=64") >= 0.6,
      s"binary Hamming prefilter recall regressed: ${recall("binary_rerank", "bits=64")}")

    // multi-table LSH (Indyk–Motwani): 8 independent 8-bit tables must
    // beat the single table at the same bit width — measured 0.21 vs
    // 0.0 single-table (2026-08); floor leaves jitter room
    val lshMulti = recall("lsh_multitable", "tables=8")
    assert(lshMulti >= 0.12,
      s"multi-table LSH recall $lshMulti regressed toward the single-table collapse")
    assert(lshMulti > recall("lsh", "hyperplanes=8,buckets=256"),
      "adding tables must not lose recall vs one table")

    // AUTO geometry (round-8, LshGeometry): the banding derives from a
    // sampled k-NN angle (θ̂ ≈ 69.6° here → 8 tables × 4 hyperplanes)
    // instead of the blind 8×8 default — measured 0.70 on this
    // near-uniform corpus vs 0.21 blind (2026-08), right at its 0.70
    // modeled expectation. The floor is the geometry's CONTRACT: the
    // chosen band must deliver most of its target on the distribution
    // it was derived from
    val lshAuto = recall("lsh_multitable_auto", "auto:")
    assert(lshAuto >= 0.5,
      s"auto-geometry LSH recall $lshAuto below the 0.5 contract floor")
    assert(lshAuto > lshMulti,
      s"auto geometry ($lshAuto) must beat the blind 8x8 default ($lshMulti) on a flat corpus")

    // IVFPQ refine (round-5 "What's missing #3"): the exact re-rank of the
    // ADC top k·overfetch must recover most of the coarse-quantizer
    // ceiling — measured with residual codes + overfetch 16 (round-7)
    // 0.135 raw / 0.35 refined / 0.355 ceiling (2026-08); residual
    // encoding trades a hair of uniform raw recall (0.16 → 0.135 — no
    // cluster structure to exploit) for the clustered fix (0.085 → 0.30
    // raw, 0.685 → 1.0 refined), and the refined figure — the serving
    // number — sits AT the nprobe ceiling on both distributions
    val raw = recall("ivfpq", "trained")
    val refined = recall("ivfpq_refined", "overfetch")
    val ceiling = recall("ivf_l2_ceiling", "exact_rerank")
    assert(refined > raw, s"refine stage bought nothing: raw $raw, refined $refined")
    assert(refined >= 0.25, s"IVFPQ refined recall $refined regressed")
    assert(refined >= ceiling - 0.1,
      s"refined $refined far from its nprobe ceiling $ceiling — overfetch too shallow")

    // AUTO serving tier (round-9): the ENGINE's chooseNprobe width
    // (persisted as ann_nprobe; derived 12 on this near-uniform corpus)
    // + the pqSlateScale contract (slate × ceil(nprobe/2)) run through
    // the same refine pipeline — this floor ties the registered
    // ann_ivfpq_refined_auto query, the engine geometry, and the recall
    // evidence together. Measured 0.92 uniform / 1.00 clustered
    // (2026-08); the tuned nprobe=2 row measured 0.35 — auto must beat
    // it decisively, not within jitter.
    val refinedAuto = recall("ivfpq_refined_auto", "auto:")
    assert(refinedAuto >= 0.75,
      s"auto-nprobe IVFPQ refined recall $refinedAuto below the 0.75 contract floor")
    assert(refinedAuto >= refined + 0.2,
      s"auto-nprobe refined ($refinedAuto) must clear the blind nprobe=2 tier ($refined) decisively")
  }

  test("clustered corpus at bench scale: IVF near-exact, residual-PQ refine >= 0.9") {
    // the distribution IVF exists for, at the sf0.1 corpus size — the
    // ≥0.9 clustered claim with bench-scale evidence, not a 300-row
    // fixture (round-5 task 6). Measured 2026-08 with RESIDUAL PQ codes
    // (round-7: codebook trained on x − centroid(cell), FAISS IVFADC)
    // and overfetch 16: ivf 1.0 at every nprobe, ceiling 1.0, ivfpq
    // 0.30 raw / 1.0 refined — vs 0.085 / 0.685 with raw-vector codes
    // at overfetch 8, whose 4-bit ADC collapsed inside tight clusters
    // because every in-cell vector shared its centroid component.
    val report = RecallEval.evaluateClustered(spark, n = 2000, dim = 64)
    def recall(variant: String): Double =
      report.variants.find(_.variant == variant)
        .getOrElse(fail(s"missing variant $variant")).recallAtK
    assert(recall("ivf") >= 0.9, s"IVF on clustered data: ${recall("ivf")}")
    assert(recall("ivf_l2_ceiling") >= 0.95)
    assert(recall("sq8_two_phase") >= 0.95)
    assert(recall("binary_rerank") >= 0.95,
      s"binary prefilter on clustered data: ${recall("binary_rerank")}")
    // multi-table LSH: measured 0.88 clustered vs 0.365 single-table
    // (2026-08) — the union of 8 tables' buckets covers the query's
    // cluster where one 256-bucket table fragments it
    def recallP(variant: String, params: String): Double =
      report.variants.find(v => v.variant == variant && v.params.contains(params))
        .getOrElse(fail(s"missing variant $variant $params")).recallAtK
    assert(recallP("lsh_multitable", "tables=8,hyperplanes=8") >= 0.75,
      s"multi-table LSH on clustered data regressed: ${recallP("lsh_multitable", "tables=8,hyperplanes=8")}")
    // auto geometry on the CLUSTERED corpus picks a deep band (θ̂ ≈ 26°
    // → 12 hyperplanes — 16× smaller buckets than the blind 8-bit
    // default) and still clears its 0.7 target: measured 0.70 expected
    // 0.74 (2026-08). By design it prunes hardest WHILE honoring the
    // target, so it may sit below a shallower geometry's recall — the
    // contract is the target, not the maximum
    assert(recallP("lsh_multitable_auto", "auto:") >= 0.55,
      s"auto-geometry LSH on clustered data regressed: ${recallP("lsh_multitable_auto", "auto:")}")
    assert(recall("ivfpq") >= 0.2,
      s"raw residual-ADC recall on clustered data regressed: ${recall("ivfpq")}")
    assert(recall("ivfpq_refined") >= 0.9,
      s"refined recall on clustered data regressed: ${recall("ivfpq_refined")}")
    assert(recall("ivfpq_refined") > recall("ivfpq") + 0.2,
      "refine stage must recover most of the residual-ADC loss")
  }

  test("engine serving path on the clustered corpus: SQ8 two-phase and float IVF probes both >= 0.9") {
    // index -> search END TO END at bench scale: Workspace ANN layout
    // (cid= partitions + persisted SQ8 codes), IvfGenerator probe —
    // what Engine.search actually runs, not the query-registry replicas
    // (round-6 "Next round" #4). Measured 2026-08: both 1.0.
    val report = RecallEval.evaluateEngineClustered(spark, n = 2000, dim = 64)
    def recall(variant: String): Double =
      report.variants.find(_.variant == variant)
        .getOrElse(fail(s"missing variant $variant")).recallAtK
    assert(recall("engine_ivf_sq8") >= 0.9,
      s"engine SQ8 two-phase recall: ${recall("engine_ivf_sq8")}")
    assert(recall("engine_ivf_float") >= 0.9,
      s"engine float IVF-probe recall: ${recall("engine_ivf_float")}")
    // the persisted residual-PQ tier (4-bit codes, 8× fewer phase-1
    // bytes than SQ8): exact re-rank of the overfetched slate must hold
    // the clustered floor too
    assert(recall("engine_ivf_pq") >= 0.9,
      s"engine residual-PQ two-phase recall: ${recall("engine_ivf_pq")}")
  }

  test("engine serving path on the UNIFORM corpus: every tier sits at its coverage ceiling") {
    // the serving tiers' WORST case (round-7 "Next round" #5): on the
    // near-uniform driver embeddings, nprobe=2 of 16 cells covers ~2/16
    // of the corpus, so recall is bounded by the coverage fraction —
    // measured 0.355 for ALL THREE tiers (2026-08), exactly the
    // query-registry ivf nprobe=2 figure and its exact-rerank ceiling.
    // The invariant worth pinning: the quantized phase-1 tiers (SQ8,
    // residual-PQ) lose NOTHING vs the float probe at the same coverage
    // — their overfetch + exact re-rank absorbs all quantization error.
    val report = RecallEval.evaluateEngineUniform(spark, "/root/testdata/sf0.1")
    def recall(variant: String): Double =
      report.variants.find(_.variant == variant)
        .getOrElse(fail(s"missing variant $variant")).recallAtK
    val fl = recall("engine_ivf_float")
    assert(fl >= 0.25, s"engine float IVF-probe uniform recall: $fl")
    assert(recall("engine_ivf_sq8") >= fl - 0.05,
      s"SQ8 two-phase lost recall vs the float probe at the same coverage: " +
        s"${recall("engine_ivf_sq8")} vs $fl")
    assert(recall("engine_ivf_pq") >= fl - 0.05,
      s"residual-PQ two-phase lost recall vs the float probe at the same coverage: " +
        s"${recall("engine_ivf_pq")} vs $fl")
  }

  test("engine auto-nprobe on the UNIFORM corpus: the derived width clears the coverage target") {
    // the annProbes=0 contract end to end (AnnIndex.chooseNprobe →
    // Workspace layout → IvfGenerator): on the corpus where the blind
    // nprobe=2 default ceilings at 0.355, the build-derived width must
    // reach the ~0.9 coverage target it was chosen for. Floor at
    // measured − jitter; the quantized-tier invariant carries over.
    val report = RecallEval.evaluateEngineUniform(
      spark, "/root/testdata/sf0.1", nprobe = 0)
    def v(variant: String) =
      report.variants.find(_.variant == variant)
        .getOrElse(fail(s"missing variant $variant"))
    assert(v("engine_ivf_float").params.contains("(auto)"), v("engine_ivf_float").params)
    val fl = v("engine_ivf_float").recallAtK
    assert(fl >= 0.8, s"auto-nprobe uniform recall: $fl (blind default: 0.355)")
    assert(v("engine_ivf_sq8").recallAtK >= fl - 0.05,
      s"SQ8 two-phase lost recall vs the float probe under auto-nprobe: " +
        s"${v("engine_ivf_sq8").recallAtK} vs $fl")
    assert(v("engine_ivf_pq").recallAtK >= fl - 0.05,
      s"residual-PQ two-phase lost recall vs the float probe under auto-nprobe: " +
        s"${v("engine_ivf_pq").recallAtK} vs $fl")
  }

  test("LSH auto-geometry: the band deepens as neighbors tighten, expectation honors the target") {
    import graft.search.LshGeometry
    // deeper band for closer neighbors (more pruning when the corpus
    // allows it), never deeper than the target tolerates
    val wide = LshGeometry.choose(math.toRadians(69.6), targetRecall = 0.7, tables = 8, maxBits = 16)
    val tight = LshGeometry.choose(math.toRadians(25.8), targetRecall = 0.7, tables = 8, maxBits = 16)
    assert(wide.bits == 4, s"uniform-like geometry: ${wide.bits}")
    assert(tight.bits > wide.bits, s"tight ${tight.bits} vs wide ${wide.bits}")
    assert(wide.expectedRecall >= 0.7 && tight.expectedRecall >= 0.7)
    // every bits choice one deeper would MISS the target (the "deepest
    // honoring" contract)
    assert(LshGeometry.expectedRecall(wide.p1, wide.bits + 1, 8) < 0.7)
    assert(LshGeometry.expectedRecall(tight.p1, tight.bits + 1, 8) < 0.7)
    // hostile corpus (orthogonal neighbors): falls back to b=1 and REPORTS
    // the miss rather than silently collapsing
    val hostile = LshGeometry.choose(math.toRadians(90.0), targetRecall = 0.99, tables = 2, maxBits = 16)
    assert(hostile.bits == 1)
    assert(hostile.expectedRecall < 0.99)
    // the angle estimator orders the two distributions correctly
    val uniform = graft.queries.table(spark, "/root/testdata/sf0.1", "embeddings")
      .selectExpr("cast(vec_id as long) as vec_id", "embedding")
    val clustered = RecallEval.clusteredCorpus(spark, n = 500, dim = 64,
      centers = 16, noiseSigma = 0.05)
    val thU = LshGeometry.estimateKnnAngle(uniform, "vec_id", "embedding")
    val thC = LshGeometry.estimateKnnAngle(clustered, "vec_id", "embedding")
    info(f"estimated kNN angle: uniform ${math.toDegrees(thU)}%.1f°, clustered ${math.toDegrees(thC)}%.1f°")
    assert(thC < thU, "clustered corpus must estimate a tighter neighbor angle")
    assert(math.toDegrees(thU) > 55 && math.toDegrees(thU) < 85)
  }

  test("clustered fixture with small cells: the refine slate covers the probed rows and recall is near-exact") {
    // when k·overfetch ≥ the probed-cell population (here 2 cells × ~20
    // rows ≤ 80), the refine IS the exact re-rank of every probed row, so
    // refined ≈ ceiling ≥ 0.9 — the AnnEngineSpec fixture contract
    // carried over to the IVFPQ serving path
    val report = RecallEval.evaluateClustered(spark, n = 320, dim = 64)
    def recall(variant: String): Double =
      report.variants.find(_.variant == variant)
        .getOrElse(fail(s"missing variant $variant")).recallAtK
    assert(recall("ivfpq_refined") >= 0.9,
      s"refined recall on the small-cell fixture: ${recall("ivfpq_refined")}")
  }
}
