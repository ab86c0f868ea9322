package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of `localCheckpoint()` blocks.
  *
  * `Dataset.unpersist()` only drops CacheManager entries; a local
  * checkpoint is an RDD-level persist behind a `LogicalRDD`, which
  * unpersist does NOT touch — the blocks linger until the ContextCleaner
  * happens to GC the RDD. Iterative jobs (Lloyd rounds, repeated staging)
  * that checkpoint per round must release the previous round's blocks
  * explicitly or they accumulate for the whole job.
  */
object Checkpoints {

  /** Unpersist the RDD behind a localCheckpointed DataFrame (non-blocking).
    * Safe on any plan: only `LogicalRDD` leaves are touched. Call ONLY
    * after every consumer of the checkpointed data has run. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _              => ()
    }
}

/** Deterministic staging: ONE eager `localCheckpoint` per (session, key),
  * reused by every later build with the same key. Raw per-call
  * checkpoints orphan blocks each invocation (unpersist can't release
  * them — see [[Checkpoints]]) and can't be released while a prior
  * result is live (no lineage to recompute from). The key must pin
  * everything the plan depends on (source dir / plan semantic hash). */
object Staging {
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), DataFrame]

  def staged(spark: org.apache.spark.sql.SparkSession, key: String)(
      build: => DataFrame): DataFrame =
    cache.getOrElseUpdate((spark, key), build.localCheckpoint())
}
