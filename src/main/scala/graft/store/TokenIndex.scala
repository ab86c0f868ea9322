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

  val DefaultBuckets = 64

  /** Build postings from any table: one row per (token, id) with term
    * frequency. Single explode + groupBy (map-side partial agg). */
  def build(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("chunk_id"), explode(F.tokens(col(textCol))).as("token"))
      .groupBy("token", "chunk_id")
      .agg(count(lit(1)).as("tf"))

  /** Partition bucket of a token — JVM twin of the write-side column
    * (first 15 md5 hex chars → long, mod buckets), so a query can prune
    * partitions without touching Spark internals. */
  def tokenBucket(token: String, buckets: Int = DefaultBuckets): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(token.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (new java.math.BigInteger(hex.substring(0, 15), 16)
      .mod(java.math.BigInteger.valueOf(buckets))).intValue
  }

  /** Persist partitioned by token-hash bucket so a query's token lookups
    * prune to a handful of files (the bucket column uses the same md5-60
    * hash as [[tokenBucket]]). */
  def write(postings: DataFrame, path: String, buckets: Int = DefaultBuckets): Unit =
    postings
      .withColumn("token_bucket", pmod(F.hash60(col("token")), lit(buckets)))
      .repartition(col("token_bucket"))
      .write.mode("overwrite")
      .partitionBy("token_bucket")
      .parquet(path)

  /** Keyword search as a posting join: filter the index to the query's
    * tokens, sum tf per chunk, top-k. When the postings table carries the
    * `token_bucket` partition column, the filter includes the query
    * tokens' buckets so the parquet scan prunes to their partitions. */
  def search(postings: DataFrame, queryTokens: Seq[String], k: Int,
             buckets: Int = DefaultBuckets): DataFrame = {
    val pruned =
      if (postings.columns.contains("token_bucket"))
        postings.filter(col("token_bucket")
          .isin(queryTokens.map(tokenBucket(_, buckets)).distinct: _*))
      else postings
    pruned
      .filter(col("token").isin(queryTokens: _*))
      .groupBy("chunk_id")
      .agg(sum(col("tf")).as("score"))
      .orderBy(col("score").desc, col("chunk_id"))
      .limit(k)
  }
}
