package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver. */
object Bench {
  // Per-SEGMENT contention canary cadence: one front-loaded canary cannot
  // certify a whole window — the r12 driver leg's canary ran fair at
  // position 14 while positions 25+ sat 1.5-7x contended (a mid-leg ramp).
  private[graft] val CanaryEvery = 25

  /** One leg's control flow, with INJECTABLE timers so the canary plumbing
    * is spec-testable without a SparkSession (round-14: the adjudication
    * protocol depends on this artifact shape). Canary samples land at
    * positions 0, CanaryEvery, 2·CanaryEvery, … (skipping the one that
    * would coincide with the end) plus a final sample at benchSet.size;
    * they are joinable against each query's `pos` and are NEVER part of
    * the timed results. `timeQuery` returns the sorted timed runs or
    * Seq(-1.0) for a broken query; `timeCanary` returns None when the
    * canary is disabled or itself broke (a broken canary must not kill
    * the leg). */
  private[graft] def runLeg(benchSet: Seq[String],
      timeQuery: String => Seq[Double],
      timeCanary: () => Option[Double])
    : (Seq[(String, Seq[Double])], Seq[(Int, Double)]) = {
    val canarySeries = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    def sample(pos: Int): Unit =
      timeCanary().foreach(s => canarySeries += ((pos, s)))
    sample(0)
    val results = benchSet.zipWithIndex.map { case (name, pos) =>
      val timed = name -> timeQuery(name)
      if ((pos + 1) % CanaryEvery == 0 && pos + 1 < benchSet.size) sample(pos + 1)
      timed
    }
    sample(benchSet.size)
    (results, canarySeries.toSeq)
  }

  /** The full one-line JSON artifact (and its total) from a leg's results.
    * Failures carry a -1.0 sentinel: excluded from `total`, `queries` AND
    * `spread` alike (so summing the sidecar's queries map reproduces
    * `value` exactly) and surface by name in `failed`. Each spread row
    * carries `pos` — the query's position in the leg, joinable against
    * the canary series to decide which contention regime its minimum was
    * taken under. */
  private[graft] def renderArtifact(results: Seq[(String, Seq[Double])],
      canarySeries: Seq[(Int, Double)], canaryName: String,
      benchSet: Seq[String], sfDir: String): (String, Double) = {
    val ok = results.filter(_._2.min >= 0)
    val posOf = benchSet.zipWithIndex.toMap
    val qs = ok.map { case (k, ts) => "\"" + k + "\":" + ts.min }.mkString("{", ",", "}")
    val spread = ok.map { case (k, ts) =>
      s""""$k":{"min":${ts.min},"median":${ts(ts.size / 2)},"max":${ts.max},"n":${ts.size},"pos":${posOf(k)}}"""
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, ts) if ts.min < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val canary = s"""{"name":"$canaryName","fair_sf01":0.26,"series":[""" +
      canarySeries.map { case (p, s) => s"""{"pos":$p,"sec":$s}""" }.mkString(",") + "]}"
    val total = ok.map(_._2.min).sum
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"failed":$failed,"canary":$canary,"sf":"$sfDir"}"""
    (full, total)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup on the smallest SF so headline timings measure the
    // query, not first-call JIT + classload.
    SparkEntry.queries.get("d2_knn_topk")
      .foreach(fn => fn(spark, "/root/testdata/sf0.001").count())

    // steady-state throughput: first run pays plan compile + codegen; the
    // headline time is the MIN of three timed runs — the container's CPU
    // allocation fluctuates 30-100% (docs/BENCH_NOTES.md), and min-of-n is
    // the standard estimator for the time the query takes when it actually
    // gets the cores. The per-query min/median/max/n spread ships in the
    // JSON so round-over-round deltas are adjudicable against the jitter.
    // Optional dev-only subset (comma-separated names): scaling-ladder
    // windows time just the growing set instead of all 100 queries. The
    // driver never sets this → full headline run.
    val subset = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val benchSet = subset.map(f => SparkEntry.benchQueries.filter(f)).getOrElse(SparkEntry.benchQueries)
    // Dev-only timed-run count (default 3; the driver never sets it). The
    // sf10 scaling-ladder windows use 1: at a 100x-sf0.1 corpus the data
    // cost dwarfs run-to-run jitter, and a 200 s query cannot afford
    // 4 executions per window.
    // toIntOption + max(1): a zero/negative/garbled env value must not
    // abort a bench window (times.min on an empty seq throws)
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(_.toIntOption).map(_.max(1)).getOrElse(3)

    // Re-time a fixed cheap parallel kernel every CanaryEvery positions and
    // ship the (position, sec) series in the artifact, so a min-merge can
    // accept fair SEGMENTS of an otherwise-contended window instead of
    // discarding it whole. Fair value ~0.26 at sf0.1 (docs/BENCH_NOTES.md).
    // The canary runs are excluded from every total; each costs one warm
    // run. Control flow + artifact shape live in [[runLeg]]/
    // [[renderArtifact]] (spec-covered); only the Spark timers are bound
    // here.
    val canaryName = "ann_bruteforce_topk"
    // dev-only off-switch (the driver never sets it): at sf10 the canary
    // itself is a ~linear-cost query, and the decade legs bracket their
    // windows with an EXTERNAL sf0.1 canary instead (run_decade.sh)
    val canaryFn = if (sys.env.get("SPARK_GRAFT_BENCH_CANARY").contains("0")) None
      else SparkEntry.queries.get(canaryName)
    canaryFn.foreach(fn => try fn(spark, sfDir).count()
      catch { case _: Throwable => () }) // warm: compile + codegen, untimed
    val timeCanary: () => Option[Double] = () => canaryFn.flatMap { fn =>
      try {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case _: Throwable => None } // a broken canary must not kill the leg
    }
    val timeQuery: String => Seq[Double] = name => {
      val fn = SparkEntry.queries(name)
      try {
        fn(spark, sfDir).count() // warm: plan compile + codegen
        (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
      } catch { case _: Throwable => Seq(-1.0) } // broken query: flagged, not timed
    }
    val (results, canarySeries) = runLeg(benchSet, timeQuery, timeCanary)
    val (full, total) = renderArtifact(results, canarySeries, canaryName, benchSet, sfDir)
    val ok = results.filter(_._2.min >= 0)
    val failed = results.collect { case (k, ts) if ts.min < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")

    // The full artifact is ~10 KB for ~100 queries, but the driver keeps
    // only the LAST 2000 chars of stdout — a single long line starts
    // before that window and parses as nothing (BENCH_r06..r08 all came
    // back `parsed: null`). So: persist the full JSON to a sidecar file,
    // print it early for log redundancy, and make the FINAL line a
    // compact summary (total + failures + the slowest queries + the
    // sidecar path) guaranteed to fit the tail window whole.
    // CWD-relative default so the artifact lands next to whatever checkout
    // is running; a failed write is surfaced (sidecarOk → queries_file:null
    // in the final line) instead of silently advertising a file that isn't
    // there. The stdout copy below still carries the full JSON either way.
    val sidecar = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_last_full.json")
    val sidecarOk =
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(sidecar),
          (full + "\n").getBytes("UTF-8"))
        true
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"""{"warn":"bench sidecar write failed","path":"$sidecar","err":"${e.getClass.getSimpleName}"}""")
          false
      }
    println(full)

    def r3(d: Double): String = "%.3f".format(d)
    val slowest = ok.sortBy(-_._2.min).take(10)
      .map { case (k, ts) => "\"" + k + "\":" + r3(ts.min) }.mkString("{", ",", "}")
    val canaryMinMax = if (canarySeries.isEmpty) "null"
      else s"[${r3(canarySeries.map(_._2).min)},${r3(canarySeries.map(_._2).max)}]"
    println(
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","sf":"$sfDir",""" +
      s""""n_queries":${results.size},"failed":$failed,"queries":$slowest,""" +
      s""""canary_minmax":$canaryMinMax,""" +
      s""""queries_truncated":true,"queries_file":${if (sidecarOk) "\"" + sidecar + "\"" else "null"}}""")
    spark.stop()
  }
}
