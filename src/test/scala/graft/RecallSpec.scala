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
