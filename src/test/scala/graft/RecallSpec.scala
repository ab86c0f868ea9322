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
  }
}
