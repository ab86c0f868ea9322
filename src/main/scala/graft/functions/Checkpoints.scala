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
  * result is live (no lineage to recompute from).
  *
  * Contract: the key must pin everything the plan depends on (source dir /
  * plan semantic hash) AND the data under it must be immutable while
  * staged — the cache keys paths, not contents. Code that rewrites a
  * staged path in-session must call [[invalidate]] with that path (the
  * Workspace mutation paths do); the cache is also LRU-bounded, and
  * concurrent first-builds of one key are serialized through a memoizing
  * holder so exactly one checkpoint is ever created per key (a racing
  * loser would otherwise orphan its blocks — the leak this class exists
  * to prevent). */
object Staging {
  import org.apache.spark.sql.SparkSession

  /** Far above any single job's working set of staged inputs; an evicted
    * (least-recently-used) entry keeps its blocks for one deferred-release
    * sweep, so even a consumer that fetched it just before eviction
    * finishes its in-flight job. */
  private final val MaxEntries = 64

  private final class Holder(build: () => DataFrame) {
    @volatile private var built: Option[DataFrame] = None
    // removed from the map while still building: the finished checkpoint
    // must not be cached (stale) NOR leaked (no map entry can reach it)
    @volatile var doomed: Boolean = false
    // lazy val: concurrent getters block on one evaluation — exactly one
    // checkpoint per key, the loser reuses it instead of orphaning blocks
    lazy val value: DataFrame = {
      val df = build().localCheckpoint()
      built = Some(df)
      if (doomed) deferRelease(df)
      df
    }
    def evaluated: Option[DataFrame] = built
  }

  // access-order LinkedHashMap = LRU; all structural access synchronized
  private val cache =
    new java.util.LinkedHashMap[(SparkSession, String), Holder](16, 0.75f, true)

  // Checkpoints whose Holder was dropped (invalidated or evicted): they
  // can't be released immediately — a caller that just built or fetched
  // the entry may still be running its Spark job on it, and a
  // localCheckpoint has no lineage to recompute from, so an immediate
  // release fails that job with a lost-block error. ALL drops drain with
  // ONE sweep cycle of grace, the same in-flight-reader bound the
  // versioned index swap gives (Workspace.RetainPriorVersions).
  //
  // The grace is counted in drain EVENTS, not wall-clock or job
  // completion: two invalidate()/staged() calls in quick succession (e.g.
  // back-to-back micro-batches mutating one workspace) age a doomed
  // checkpoint through both sweeps and free it while a slow concurrent
  // consumer could still be scanning it, failing that job with a
  // lost-block error. Currently latent — no hot path stages keys under
  // workspace roots, so workspace mutation never invalidates a checkpoint
  // a concurrent reader holds — but a future caller pairing staged() data
  // with rapid invalidate() cycles should rate-limit drains per
  // wall-clock instead.
  private var pendingRelease: List[DataFrame] = Nil
  private var prevPending: List[DataFrame] = Nil

  private def deferRelease(df: DataFrame): Unit = cache.synchronized {
    pendingRelease = df :: pendingRelease
  }

  /** Call under the cache lock: releases the SWEEP-BEFORE-LAST's doomed
    * checkpoints and ages the last sweep's. */
  private def drainDeferred(): Unit = {
    prevPending.foreach(Checkpoints.release)
    prevPending = pendingRelease
    pendingRelease = Nil
  }

  private def dropEntry(h: Holder): Unit = h.evaluated match {
    case Some(df) => deferRelease(df) // grace for a consumer mid-job
    case None     => h.doomed = true  // release when its build completes
  }

  def staged(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val holder = cache.synchronized {
      val k = (spark, key)
      Option(cache.get(k)).getOrElse {
        val h = new Holder(() => build)
        cache.put(k, h)
        // evict eldest entries down to the bound, preferring EVALUATED
        // ones: a mid-build holder has a caller attached, and dooming it
        // discards the checkpoint its next staged() wants — only the
        // 2×bound backstop dooms builders (pathological: 64+ keys staged
        // while one build runs)
        var overBy = cache.size - MaxEntries
        if (overBy > 0) {
          drainDeferred() // keep the deferred list bounded by sweep events
          val force = cache.size > 2 * MaxEntries
          val it = cache.entrySet().iterator()
          while (it.hasNext && overBy > 0) {
            val eldest = it.next()
            if ((eldest.getValue ne h) &&
                (eldest.getValue.evaluated.isDefined || force)) {
              it.remove()
              dropEntry(eldest.getValue)
              overBy -= 1
            }
          }
        }
        h
      }
    }
    holder.value // evaluated OUTSIDE the map lock (runs a Spark job)
  }

  /** Drop (and release) every staged entry whose key mentions `pathSubstr`
    * — the hook for table-mutation paths: rewriting data under a staged
    * path makes its checkpoint silently stale. An entry still mid-build is
    * doomed instead: its checkpoint joins the deferred-release drain once
    * the build finishes (its in-flight caller reads pre-mutation data —
    * unavoidable, the mutation raced the read — but nothing leaks). */
  def invalidate(pathSubstr: String): Unit = cache.synchronized {
    drainDeferred()
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._2.contains(pathSubstr)) {
        dropEntry(e.getValue)
        it.remove()
      }
    }
  }

  /** Release everything (session teardown / tests). Teardown means no
    * in-flight callers are left, so evaluated entries release IMMEDIATELY
    * (deferring here would leak them — no later sweep drains the list). */
  def clear(): Unit = cache.synchronized {
    drainDeferred()
    drainDeferred() // drain BOTH ages
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val h = it.next().getValue
      h.evaluated match {
        case Some(df) => Checkpoints.release(df)
        case None     => h.doomed = true
      }
      it.remove()
    }
  }
}
