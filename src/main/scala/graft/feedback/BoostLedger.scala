package graft.feedback

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Click-through boosting with exploration quarantine (SURVEY §2 F1/F2).
  *
  * The reference mutates `boost_factor += 0.1` in place
  * (vector_store.cpp:789-811); on immutable columnar storage we keep an
  * append-only click ledger and derive the effective boost at query time
  * (SURVEY §7.4 risk 4): boost = 1.0 + 0.1 × non-exploration clicks.
  * The ledger join is a broadcast (clicks ≪ corpus) and at scale becomes a
  * pre-aggregated dimension table maintained incrementally.
  */
object BoostLedger {

  final case class Click(chunkId: Long, query: String, isExploration: Boolean)

  def emptyLedger(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[Click].toDF("chunkId", "query", "isExploration")
      .select(col("chunkId").as("chunk_id"), col("query"), col("isExploration").as("is_exploration"))
  }

  def append(ledger: DataFrame, clicks: Seq[Click]): DataFrame = {
    val spark = ledger.sparkSession
    import spark.implicits._
    val add = clicks.toDF("chunkId", "query", "isExploration")
      .select(col("chunkId").as("chunk_id"), col("query"), col("isExploration").as("is_exploration"))
    ledger.unionByName(add)
  }

  /** Effective boost per chunk: 1.0 + 0.1 per quarantine-passing click
    * (exploration probes logged but never boosted, vector_store.cpp:806-810). */
  def effectiveBoosts(ledger: DataFrame): DataFrame =
    ledger.filter(!col("is_exploration"))
      .groupBy(col("chunk_id"))
      .agg((lit(1.0) + lit(0.1) * count(lit(1))).as("boost_factor"))

  /** Attach boosts to a chunk table (id column `idCol`); unclicked chunks
    * keep boost 1.0. */
  def withBoost(chunks: DataFrame, ledger: DataFrame, idCol: String): DataFrame = {
    val boosts = effectiveBoosts(ledger)
    chunks.join(broadcast(boosts), chunks(idCol) === boosts("chunk_id"), "left")
      .drop("chunk_id")
      .withColumn("boost_factor", coalesce(col("boost_factor"), lit(1.0)))
  }
}
