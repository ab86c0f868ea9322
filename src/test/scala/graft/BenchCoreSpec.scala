package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench-leg plumbing the adjudication protocol depends on
  * (docs/BENCH_NOTES.md round 13): canary sample positions, exclusion of
  * canary runs and failed queries from totals, the -1 failure sentinel,
  * the off-switch, and the artifact's JSON shape. Driven through
  * [[Bench.runLeg]]/[[Bench.renderArtifact]] with stub timers — no
  * SparkSession. */
class BenchCoreSpec extends AnyFunSuite {

  private def names(n: Int): Seq[String] = (1 to n).map(i => f"q$i%03d")

  test("canary samples land at 0, CanaryEvery, 2·CanaryEvery, … and a final sample at benchSet.size") {
    val set = names(60) // CanaryEvery = 25 → samples at 0, 25, 50, 60
    var tick = 0
    val (results, series) = Bench.runLeg(set,
      timeQuery = _ => Seq(1.0),
      timeCanary = () => { tick += 1; Some(0.25 + tick * 0.01) })
    assert(results.map(_._1) == set)
    assert(series.map(_._1) == Seq(0, 25, 50, 60))
    // samples are taken in leg order (values strictly increasing per stub)
    assert(series.map(_._2) == series.map(_._2).sorted)
  }

  test("a mid-leg sample coinciding with the end is not doubled") {
    val set = names(50) // 50 = 2·CanaryEvery: pos-50 sample comes from the FINAL hook only
    val (_, series) = Bench.runLeg(set, _ => Seq(1.0), () => Some(0.3))
    assert(series.map(_._1) == Seq(0, 25, 50))
  }

  test("off-switch: a disabled canary (timer returns None) yields an empty series, never kills the leg") {
    val set = names(30)
    val (results, series) = Bench.runLeg(set, _ => Seq(2.0), () => None)
    assert(series.isEmpty)
    assert(results.size == 30)
  }

  test("canary runs and failed queries are excluded from total; failures carry the -1 sentinel into `failed`") {
    val set = Seq("good_a", "broken", "good_b")
    val (results, series) = Bench.runLeg(set,
      timeQuery = n => if (n == "broken") Seq(-1.0) else Seq(1.5, 2.0, 3.0),
      timeCanary = () => Some(99.0)) // huge canary cost must not pollute totals
    val (full, total) = Bench.renderArtifact(results, series, "canary_q", set, "/sf")
    assert(total == 3.0, "total = sum of ok minima only (1.5 + 1.5)")
    assert(full.contains(""""failed":["broken"]"""))
    assert(!full.contains(""""broken":{"""), "a failed query must not appear in spread")
    // summing the queries map reproduces `value` exactly (the sidecar contract)
    assert(full.contains(""""good_a":1.5""") && full.contains(""""good_b":1.5"""))
  }

  test("spread rows carry pos joinable against the canary series; artifact JSON is well-formed") {
    val set = names(26) // one mid-leg canary at 25
    val (results, series) = Bench.runLeg(set,
      timeQuery = _ => Seq(1.0, 1.0, 1.0),
      timeCanary = () => Some(0.26))
    val (full, _) = Bench.renderArtifact(results, series, "ann_bruteforce_topk", set, "/root/testdata/sf0.1")
    assert(full.contains(""""q001":{"min":1.0,"median":1.0,"max":1.0,"n":3,"pos":0}"""))
    assert(full.contains(""""q026":{"min":1.0,"median":1.0,"max":1.0,"n":3,"pos":25}"""))
    assert(full.contains(""""canary":{"name":"ann_bruteforce_topk","fair_sf01":0.26,"series":[{"pos":0,"sec":0.26},{"pos":25,"sec":0.26},{"pos":26,"sec":0.26}]}"""))
    // shape check with a real JSON parser (the driver and merge_bench.py
    // both parse this line)
    val parsed = org.json4s.jackson.JsonMethods.parse(full)
    val org.json4s.JDouble(v) = (parsed \ "value"): @unchecked
    assert(math.abs(v - 26.0) < 1e-9)
  }
}
