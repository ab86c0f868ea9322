package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {

  /** One registered operator-query: Spark plan builder + optional DuckDB
    * oracle SQL over the same parquet tables. Column names and row order
    * must agree between both (the driver's compare sorts columns by name
    * then hashes values). */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  object Q {
    def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
      Q(name, fn, Some(oracle))
    def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
      Q(name, fn, None)
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events table with `ts` as a proper TimestampType. The driver's parquet
    * carries TIMESTAMP(NANOS), which Spark only reads as long nanos (under
    * spark.sql.legacy.parquet.nanosAsLong=true — set in Verify/Bench);
    * truncate nanos→micros exactly like DuckDB's read path does. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }
}
