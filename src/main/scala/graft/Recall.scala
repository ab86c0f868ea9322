package graft

import org.apache.spark.sql.SparkSession

/** Recall-evidence entry: measures recall@10 vs the exact scan for every
  * approximate-ANN variant on SPARK_GRAFT_SF_DIR (default sf0.1) and
  * prints ONE JSON line (also written to RECALL_r05.json when
  * SPARK_GRAFT_RECALL_OUT is set) — the quality counterpart of Bench. */
object Recall {
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

    // both distributions: the driver's near-uniform embeddings (the coarse
    // quantizer's worst case — honest but structurally uninformative) AND a
    // deterministic clustered corpus at the same scale (the distribution
    // IVF exists for), so the ≥0.9 clustered-recall claim carries
    // bench-scale evidence rather than a 300-row fixture's
    val uniform = graft.queries.RecallEval.evaluate(spark, sfDir)
    val clustered = graft.queries.RecallEval.evaluateClustered(
      spark, n = uniform.corpus.toInt, dim = 64)
    // the LIVE serving path (Workspace index -> IvfGenerator probe), not
    // just the query-registry variants — round-6 "Next round" #4
    val engine = graft.queries.RecallEval.evaluateEngineClustered(
      spark, n = uniform.corpus.toInt, dim = 64)
    // the serving tiers' WORST case: same end-to-end harness over the
    // near-uniform driver embeddings (round-7 "Next round" #5)
    val engineUniform = graft.queries.RecallEval.evaluateEngineUniform(spark, sfDir)
    // the auto-nprobe contract on the SAME worst-case corpus (annProbes=0,
    // AnnIndex.chooseNprobe): the derived width must lift recall off the
    // blind default's coverage ceiling to the ~0.9 target
    val engineAuto = graft.queries.RecallEval.evaluateEngineUniform(
      spark, sfDir, nprobe = 0)
    val json = s"""{"uniform":${uniform.json},"clustered":${clustered.json},""" +
      s""""engine_clustered":${engine.json},"engine_uniform":${engineUniform.json},""" +
      s""""engine_uniform_auto":${engineAuto.json}}"""
    println(json)
    sys.env.get("SPARK_GRAFT_RECALL_OUT").foreach { out =>
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
