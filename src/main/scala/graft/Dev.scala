package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: `Dev <sfDir> entry` smoke-checks the flagship query;
  * `Dev <sfDir> explain <name>` prints a query's formatted physical plan;
  * `Dev <sfDir> run <name>` shows the result; `Dev <sfDir> time <name>`
  * times it Bench-style (warm + min-of-3). SPARK_GRAFT_CPUS overrides
  * the thread count (default 8). */
object Dev {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).toList match {
      case "entry" :: _ =>
        val df = SparkEntry.entry(spark)
        println(s"entry rows=${df.count()}")
        df.show(10, truncate = false)
      case "explain" :: name :: _ =>
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      case "run" :: name :: _ =>
        SparkEntry.queries(name)(spark, sfDir).show(20, truncate = false)
      case "time" :: name :: _ =>
        val fn = SparkEntry.queries(name)
        fn(spark, sfDir).count() // warm: plan compile + codegen
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name min=${ts.min}%.3f runs=[${ts.map(t => f"$t%.3f").mkString(", ")}]")
      case "dump" :: name :: _ =>
        SparkEntry.queries(name)(spark, sfDir).toJSON.collect().foreach(println)
      case "oracle" :: name :: _ =>
        println(SparkEntry.oracleSql.getOrElse(name, s"(no oracle for $name)"))
      case "snb-probe" :: _ =>
        // structural fan-out evidence for the parallel sorted-neighborhood
        // on the degenerate skew corpus (round-12 verdict task 1)
        println(graft.queries.DedupQueries.snbProbe(spark, sfDir))
      case "recall-clustered" :: rest =>
        val n = rest.headOption.map(_.toInt).getOrElse(2000)
        println(graft.queries.RecallEval.evaluateClustered(spark, n = n, dim = 64).json)
      case _ =>
        println(s"queries: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    }
    spark.stop()
  }
}
