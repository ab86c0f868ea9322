package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: `Dev <sfDir> entry` smoke-checks the flagship query;
  * `Dev <sfDir> explain <name>` prints a query's formatted physical plan;
  * `Dev <sfDir> run <name>` shows the result. */
object Dev {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
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
      case "recall-clustered" :: rest =>
        val n = rest.headOption.map(_.toInt).getOrElse(2000)
        println(graft.queries.RecallEval.evaluateClustered(spark, n = n, dim = 64).json)
      case _ =>
        println(s"queries: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    }
    spark.stop()
  }
}
