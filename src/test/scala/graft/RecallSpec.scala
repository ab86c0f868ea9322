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
    .config("spark.sql.extensions", "graft.GraftExtensions")
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

  test("adversarial mega-bucket corpus: grouping recall holds and the W-vs-recall tradeoff is measured") {
    // The round-10 sf1 decade showed the dangerous corpus shape: ONE
    // templated mega-bucket (thousands of near-identical docs sharing a
    // band key) plus a Zipf tail of smaller cliques. The sliding-window
    // pair stage bounds cost at n·W there — this spec pins what that
    // bound is allowed to COST in recall, on exactly that corpus shape.
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_distinct, col}
    // disjoint token namespaces → cross-clique Jaccard is exactly 0; each
    // clique doc replaces 3 fixed template positions with doc-unique
    // tokens → within-clique Jaccard is exactly 117/123 ≈ 0.951 ≥ 0.9
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int)]
    var id = 0L
    def addClique(c: Int, size: Int): Unit = {
      val tmpl = (0 until 120).map(i => s"c${c}t$i")
      for (d <- 0 until size) {
        val t = tmpl.zipWithIndex.map { case (tk, i) =>
          if (i < 3) s"c${c}d${d}u$i" else tk }
        buf += ((id, t.mkString(" "), c)); id += 1
      }
    }
    addClique(0, 240)                                   // the mega bucket
    val tail = Seq(50, 24, 12, 8, 6, 5, 4, 3, 2, 2, 2)  // Zipf-ish tail
    tail.zipWithIndex.foreach { case (sz, i) => addClique(i + 1, sz) }
    for (i <- 0 until 100) {                            // singleton noise
      buf += ((id, (0 until 40).map(j => s"n${i}x$j").mkString(" "), -1)); id += 1
    }
    val docs = buf.toSeq.map(t => (t._1, t._2)).toDF("doc_id", "text")

    // exact ground truth, computed (not assumed): all-pairs Jaccard ≥ 0.9
    // over the same distinct-token sets the pipeline hashes
    val sets = buf.map(t => t._1 ->
      t._2.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet).toMap
    val ids = buf.map(_._1).sorted
    val truth = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      sa = sets(ids(i)); sb = sets(ids(j))
      inter = (sa & sb).size.toDouble
      if inter / (sa.size + sb.size - inter) >= 0.9
    } yield (ids(i), ids(j))).toSet
    val expected = (240 * 239) / 2 + tail.map(s => s * (s - 1) / 2).sum
    assert(truth.size == expected,
      s"corpus construction drifted: ${truth.size} true pairs, expected $expected")

    def ccRecall(found: Set[(Long, Long)]): (Double, Double) = {
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i).toSeq: _*)
      def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
      found.foreach { case (a, b) => parent(find(a)) = find(b) }
      val co = truth.count { case (a, b) => find(a) == find(b) }
      ((truth & found).size.toDouble / truth.size, co.toDouble / truth.size)
    }

    // W sweep over the SAME band buckets: direct pair recall degrades with
    // W by design (a k-clique holds k²/2 pairs, the window emits ≤ k·W);
    // component recall is the contract that must hold
    val tokenSets = docs.select(col("doc_id"),
      array_distinct(graft.functions.F.tokens(col("text"))).as("s"))
    val bands = graft.dedup.DedupPipeline.bandBuckets(tokenSets, "doc_id", "s").cache()
    val sweep = Seq(4, 8, 16, 32).map { w =>
      val cand = graft.dedup.DedupPipeline.candidatePairs(bands, "doc_id", window = w,
          stageKey = s"recallspec#sweep_w$w")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val verified = cand.filter { case (a, b) =>
        val (sa, sb) = (sets(a), sets(b))
        val inter = (sa & sb).size.toDouble
        inter / (sa.size + sb.size - inter) >= 0.9
      }
      val (pr, cr) = ccRecall(verified)
      info(f"W=$w%2d: pair recall $pr%.3f, component recall $cr%.3f (${verified.size} edges)")
      w -> (pr, cr)
    }.toMap
    bands.unpersist()
    // the committed tradeoff (docs/SCALING.md round-11 addendum):
    // component recall must be PERFECT at the default W on the adversarial
    // corpus, and already ≥ 0.99 two halvings below it
    assert(sweep(32)._2 == 1.0,
      s"W=32 grouping split a true clique on the mega-bucket corpus: ${sweep(32)}")
    assert(sweep(8)._2 >= 0.99, s"W=8 component recall collapsed: ${sweep(8)}")
    // pair recall floor at the default W — window-bounded by design (the
    // 240-clique holds 28.7k true pairs, the window emits ≤ n·W·bands), so
    // this is a canary under the measured 0.293, not a completeness claim
    assert(sweep(32)._1 >= 0.25, s"W=32 direct pair recall collapsed: ${sweep(32)}")

    // and the FULL pipeline (verify join + BSP components) at the default
    // W must agree with the driver-side closure: every true pair grouped
    val edges = graft.dedup.DedupPipeline.edges(docs, 0.9, sampleMod = 1)
      .collect().map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    assert(edges.subsetOf(truth), "verified edges contain a false positive")
    val (_, fullCc) = ccRecall(edges)
    assert(fullCc == 1.0, s"pipeline grouping split a true clique: $fullCc")
  }

  test("simhash window stage on the mega-bucket corpus: recall vs exact hamming truth") {
    // Same adversarial shape, simhash side: truth = ALL pairs at hamming
    // <= 3 over the exact 16-bit signatures (computed driver-side with the
    // same md5 token hash the query uses); found = the banded
    // sorted-neighborhood stage at the default W. Pigeonhole guarantees a
    // hamming<=3 pair shares >= 1 of the 4 bands, so the ONLY loss is the
    // window bound — this pins what that bound costs on the worst corpus.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var id = 0L
    def addClique(c: Int, size: Int): Unit = {
      val tmpl = (0 until 120).map(i => s"c${c}t$i")
      for (d <- 0 until size) {
        val t = tmpl.zipWithIndex.map { case (tk, i) =>
          if (i < 3) s"c${c}d${d}u$i" else tk }
        buf += ((id, t.mkString(" "))); id += 1
      }
    }
    addClique(0, 240)
    Seq(50, 24, 12, 8, 6, 5, 4, 3, 2, 2, 2).zipWithIndex
      .foreach { case (sz, i) => addClique(i + 1, sz) }

    // exact signatures, driver-side (mirrors F.hash60 = first 15 md5 hex
    // chars as a long, and the query's sign-of-bit-sum fold)
    def hash60(tk: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tk.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val sigs: Map[Long, Int] = buf.map { case (i, text) =>
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct
      val sums = new Array[Int](16)
      toks.foreach { tk =>
        val h = hash60(tk)
        for (j <- 0 until 16) sums(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
      }
      i -> (0 until 16).map(j => if (sums(j) > 0) 1 << j else 0).sum
    }.toMap
    val ids = buf.map(_._1)
    val truth = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      if java.lang.Integer.bitCount(sigs(ids(i)) ^ sigs(ids(j))) <= 3
    } yield (ids(i), ids(j))).toSet
    assert(truth.size > 1000, s"fixture too easy: only ${truth.size} hamming<=3 pairs")

    // the windowed banded stage (the dedup_simhash_pairs plan shape)
    val W = graft.dedup.DedupPipeline.NeighborWindow
    val sdf = sigs.toSeq.toDF("doc_id", "sh")
    val banded = sdf.select(col("doc_id"), col("sh"),
        explode(array((0 until 4).map(b => struct(lit(b).as("band"),
          shiftright(col("sh"), 4 * b).bitwiseAND(15).as("bkey"))): _*)).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val w = Window.partitionBy("band", "bkey").orderBy("sh", "doc_id")
    val found = banded
      .withColumn("__next", collect_list(struct(col("doc_id").as("nid"), col("sh").as("nh")))
        .over(w.rowsBetween(1, W)))
      .select(col("doc_id"), col("sh"), explode(col("__next")).as("nb"))
      .select(least(col("doc_id"), col("nb.nid")).as("a"),
        greatest(col("doc_id"), col("nb.nid")).as("b"),
        expr("bit_count(sh ^ nb.nh)").as("hm"))
      .filter(col("hm") <= 3)
      .select("a", "b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(found.subsetOf(truth), "window stage emitted a pair beyond hamming<=3")
    val pairRecall = (truth & found).size.toDouble / truth.size
    // component closure: grouping must not split the hamming cliques
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    found.foreach { case (a, b) => parent(find(a)) = find(b) }
    val co = truth.count { case (a, b) => find(a) == find(b) }
    val ccRecall = co.toDouble / truth.size
    info(f"simhash W=$W: pair recall $pairRecall%.3f, component recall $ccRecall%.3f over ${truth.size} pairs")
    assert(ccRecall >= 0.99, f"simhash grouping split hamming cliques: $ccRecall%.3f")
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
