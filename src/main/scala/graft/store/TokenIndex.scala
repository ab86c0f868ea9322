package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.F

/** Inverted-index (posting-list) table — the scale path for keyword search
  * (SURVEY §4: "the FTS analog is a precomputed posting-list table
  * maintained alongside the chunk table, so keyword search is a join, not
  * a scan").
  *
  * At 100 TB the D4 regex-scan-per-query is untenable; the same job that
  * writes chunks writes `(token, chunk_id, tf)` postings, partitioned by
  * token. A query then touches only the partitions of its own tokens —
  * candidate generation cost is proportional to the posting lists, not the
  * corpus.
  */
object TokenIndex {

  /** Build postings from any table: one row per (token, id) with term
    * frequency. Single explode + groupBy (map-side partial agg). */
  def build(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("chunk_id"), explode(F.tokens(col(textCol))).as("token"))
      .groupBy("token", "chunk_id")
      .agg(count(lit(1)).as("tf"))

  /** Persist partitioned by token-prefix bucket so a query's token lookups
    * prune to a handful of files. */
  def write(postings: DataFrame, path: String, buckets: Int = 64): Unit =
    postings
      .withColumn("token_bucket", pmod(xxhash64(col("token")), lit(buckets)))
      .repartition(col("token_bucket"))
      .write.mode("overwrite")
      .partitionBy("token_bucket")
      .parquet(path)

  /** Keyword search as a posting join: filter the index to the query's
    * tokens (partition-pruned at scale), sum tf per chunk, top-k. */
  def search(postings: DataFrame, queryTokens: Seq[String], k: Int): DataFrame =
    postings
      .filter(col("token").isin(queryTokens: _*))
      .groupBy("chunk_id")
      .agg(sum(col("tf")).as("score"))
      .orderBy(col("score").desc, col("chunk_id"))
      .limit(k)
}
