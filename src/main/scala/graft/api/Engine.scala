package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{abs, broadcast, coalesce, col, concat_ws, count, lit, sum}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.embed.{Embedder, HashNgramEmbedder}
import graft.feedback.BoostLedger
import graft.model.{RetrievalLogRow, ScoredChunk, SearchOptions}
import graft.post.{Calibration, DeepDive, ExtractiveSummaryModel, LexicalOverlapModel, RerankModel, SummaryModel, Summarizer, SynthesisModel, LeadSentenceSynthesis}
import graft.search.{AnnIndex, CandidateGenerator, HybridEngine, IvfGenerator, LatencyPolicy}
import graft.store.{ChunkStore, TokenIndex, Workspace}

/** The engine facade — the user-visible surface mirroring the reference's
  * `VectorStore` + `GeminiApi` + driver flow (SURVEY §7.1 `api/`): a user
  * of the reference maps each call 1:1.
  *
  * | reference                              | here                     |
  * |----------------------------------------|--------------------------|
  * | select PDFs → extract → embed → insert | [[index]]                |
  * | hybridSearch(query, opts)              | [[search]]               |
  * | per-section summaries indexed back     | [[summarizeSections]]    |
  * | Deep Dive claim synthesis              | [[deepDive]]             |
  * | result click → boost                   | [[recordClick]]          |
  * | getContext / context peek              | [[context]]              |
  * | workspace switch                       | [[Engine.open]]          |
  * | exportToCsv / training export          | workspace.exportCsv/Matrix |
  */
final class Engine(
    val spark: SparkSession,
    val workspace: Workspace,
    val embedder: Embedder = HashNgramEmbedder(dim = 64),
    opts: SearchOptions = SearchOptions(),
    rerankModel: RerankModel = LexicalOverlapModel(),
    summaryModel: SummaryModel = ExtractiveSummaryModel(),
    synthesisModel: SynthesisModel = LeadSentenceSynthesis()) {

  private val latency = new LatencyPolicy()
  // Serializes every index-MUTATING path: ingestBatch (stream thread) vs
  // compactIndexes / index / summarizeSections (user threads). A compaction
  // snapshot-reads the chunk table and then swaps the version pointer — a
  // micro-batch appending into the version being superseded would have its
  // posting/ANN rows silently dropped from the live index (they'd land in
  // a dir the pointer swap just retired). Searches never take this lock:
  // readers stay lock-free against the versioned files.
  private val maintenance = new Object
  // highest foreachBatch epoch seen since open; MinValue = none yet, so
  // the first streamed batch runs the idempotency probe (the previous
  // process may have crashed between its append and checkpoint commit)
  @volatile private var lastSeenBatchId: Long = Long.MinValue
  // Background maintenance: the drift-triggered ANN retrain and the
  // chunk-table compaction are O(corpus) jobs — run inline inside a
  // micro-batch they'd stall ingest for the duration (hours at scale).
  // One daemon thread runs them against a SNAPSHOT while batches keep
  // appending to the live versions; only the final catch-up + pointer
  // swap takes the maintenance lock (O(delta)). Single-threaded, so the
  // two job kinds also serialize against each other.
  private val maintExec = java.util.concurrent.Executors.newSingleThreadExecutor(r => {
    val t = new Thread(r, "graft-maintenance"); t.setDaemon(true); t
  })
  private val annRetrainQueued = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val annRetrainRerun = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val chunkCompactQueued = new java.util.concurrent.atomic.AtomicBoolean(false)
  // starvation guard: consecutive background attempts that lost the commit
  // race to inline rebuilds. A supersession STORM (rapid index()/
  // compactIndexes() calls) would otherwise discard every background
  // attempt indefinitely — after MaxConsecutiveDiscards, the job falls
  // through to an INLINE run under the maintenance lock (no basis can
  // move while held), trading one blocked batch for guaranteed
  // convergence. Reset on any successful commit.
  private val annRetrainDiscards = new java.util.concurrent.atomic.AtomicInteger(0)
  private val chunkCompactDiscards = new java.util.concurrent.atomic.AtomicInteger(0)
  // first background-maintenance failure since open (surfaced to specs and
  // callers; the job flag resets so a later trigger can retry)
  @volatile private[graft] var lastMaintenanceError: Option[Throwable] = None
  // test seam: runs after a background job's snapshot work, before it takes
  // the maintenance lock to commit — lets a spec hold the job mid-flight
  private[graft] var maintenanceHook: () => Unit = () => ()

  /** Block until every queued background maintenance job has finished. */
  private[graft] def awaitMaintenance(): Unit =
    maintExec.submit(new Runnable { def run(): Unit = () }).get()

  // Lifecycle flag (round-14): the reference's store-switch lifecycle
  // never allows use of a closed store (mainwindow.cpp:120-137); without
  // this check a post-close index()/search() would surface as a
  // RejectedExecutionException from deep inside maintenance scheduling —
  // or worse, silently operate on an unpersisted cache.
  @volatile private var closed = false
  private val closeLock = new Object
  private def ensureOpen(): Unit =
    if (closed) throw new IllegalStateException(
      s"engine closed: workspace '${workspace.root}'")
  private var ledger: DataFrame = BoostLedger.emptyLedger(spark)
  private var hybrid: Option[HybridEngine] = None
  private var rawChunks: Option[DataFrame] = None // pinned cache, boost-free
  private var carriedLog: Vector[RetrievalLogRow] = Vector.empty
  private var carriedCalib: Calibration.Stats = Calibration.initial
  private var calibLoaded = false

  private def engine(): HybridEngine = synchronized { hybrid.getOrElse {
    if (!calibLoaded) { carriedCalib = loadCalibration("rerank"); calibLoaded = true }
    // the RAW chunk table is cached once per table version; the (tiny)
    // click-ledger boost is a broadcast join ON TOP of the cache, so
    // ledger changes never drop or re-read the cached corpus
    val raw = rawChunks.getOrElse {
      // fan the (32-small-file) chunk-table scan out BEFORE pinning: the
      // cached blocks otherwise inherit the packed 1–2-split layout and
      // every search's exact-scan/metadata-join stage runs near-serial.
      // Identity on a multi-split corpus (round-14; F.fanout).
      val r = graft.functions.F.fanout(
        workspace.readChunks().drop("boost_factor")).cache()
      rawChunks = Some(r)
      r
    }
    // tombstone filter ABOVE the pinned cache (like the boost join): a
    // delete refreshes visibility without re-reading the corpus. ONE
    // filter definition (Workspace.minusTombstones) serves every path.
    val visible = workspace.minusTombstones(raw)
    val chunks = BoostLedger.withBoost(visible, ledger, "id")
    val e = new HybridEngine(spark, chunks, opts, rerankModel,
      postings = if (workspace.hasPostings) Some(workspace.readPostings()) else None,
      initialLog = carriedLog,
      initialCalib = carriedCalib,
      stabilityLookup = stabilityHistory,
      semanticGen = semanticGenerator())
    carriedLog = Vector.empty
    hybrid = Some(e)
    e
  } }

  /** The semantic branch's candidate source under the configured annMode:
    * the IVF probe generator over the PERSISTED cell index (its `cid IN`
    * filter prunes parquet partitions at the scan — candidate cost ∝
    * nprobe/cells of the corpus), or None = the exact full scan (reference
    * semantics, vector_store.cpp:206-237). Falls back to exact when no
    * index has been built yet — annMode never makes search() fail. */
  private def semanticGenerator(): Option[CandidateGenerator] =
    if (opts.annMode != "ivf") None
    else workspace.readAnnSnapshot().map { case (vectors, cents, codebook) =>
      // ONE version snapshot: a retrain committing between separate
      // reads could otherwise pair v(n) codes with the v(n+1) codebook
      new IvfGenerator(vectors, cents, effectiveNprobe, codebook)
    }

  /** The probe width search() serves with: the configured `annProbes`
    * when ≥ 1, else (annProbes = 0 — auto) the value the index build
    * derived from its own measured coverage ceiling
    * ([[AnnIndex.chooseNprobe]]) and persisted alongside the index. The
    * meta key is a serving KNOB, not part of the versioned snapshot
    * pairing: a retrain racing this read can at worst serve one query at
    * the prior width — never mismatched codes/codebook. Fallback 2 (the
    * explicit default) when no derived value was recorded yet. */
  private def effectiveNprobe: Int =
    if (opts.annProbes >= 1) opts.annProbes
    else math.max(1, workspace.getMeta("ann_nprobe")
      .flatMap(s => scala.util.Try(s.toInt).toOption) // corrupt/hand-edited meta degrades to the default, never fails search()
      .getOrElse(2))

  /** Per-query (Σ|rank_delta|, n) from the PERSISTED retrieval log,
    * exploration rows excluded — the D9 stability history read the way the
    * reference reads its own retrieval_logs per query
    * (vector_store.cpp:430-439). The log is partitioned by query-hash
    * bucket, so each lookup is a one-partition scan; results memoize per
    * canonical query in an LRU capped at 100 entries (the same budget as
    * QueryCache — the reference's cache size, vector_store.cpp:26), and
    * the memo clears on every flush. NO unbounded driver-side state. */
  private val stabilityMemo =
    new java.util.LinkedHashMap[String, (Double, Long)](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, (Double, Long)]): Boolean =
        size > 100
    }
  // bumped on every flush (under the memo lock): a miss that computed its
  // aggregate BEFORE a concurrent flush must not memoize the pre-flush
  // value after it — the stale entry would bias ranking until the NEXT
  // flush happened to clear it
  private val stabilityGen = new java.util.concurrent.atomic.AtomicLong(0)

  private[graft] def stabilityMemoSize: Int =
    stabilityMemo.synchronized(stabilityMemo.size)

  private[graft] def stabilityHistory(canonQuery: String): (Double, Long) = {
    val hit = stabilityMemo.synchronized(Option(stabilityMemo.get(canonQuery)))
    hit.getOrElse {
      val gen = stabilityGen.get()
      val v =
        if (!workspace.hasLog) (0.0, 0L)
        else {
          val bucket = TokenIndex.tokenBucket(canonQuery) // same md5-60 mod-64 as the writer
          val r = workspace.readLog()
            .filter(col("query_bucket") === bucket &&
              col("query") === canonQuery && !col("is_exploration"))
            .agg(coalesce(sum(abs(col("rank_delta"))), lit(0L)).cast("double").as("s"),
              count(lit(1)).as("n"))
            .head()
          (r.getDouble(0), r.getLong(1))
        }
      stabilityMemo.synchronized {
        if (stabilityGen.get() == gen) stabilityMemo.put(canonQuery, v)
      }
      v
    }
  }

  /** Full invalidation — the chunk TABLE changed (index/summarize): flush
    * retrieval-log rows to the workspace parquet log (A6), persist
    * calibration (E4), drop the engine, and unpersist the raw chunk cache
    * (a rebuild would otherwise leak one pinned copy per cycle). The next
    * build re-reads both from storage — no in-memory carry. */
  private def invalidate(): Unit = synchronized {
    hybrid.foreach { e =>
      flushRetrievalLog()
      carriedCalib = e.calibSnapshot
      saveCalibration("rerank", carriedCalib)
    }
    hybrid = None
    rawChunks.foreach(_.unpersist())
    rawChunks = None
  }

  /** Light invalidation — only the click LEDGER changed: drop the derived
    * engine (its query cache holds pre-boost results) but carry its
    * pending log rows and calibration in memory and KEEP the pinned raw
    * chunk cache. N clicks therefore cost zero chunk-table re-reads — the
    * analog of the reference's one-UPDATE click (vector_store.cpp:789-795)
    * on immutable storage; log/calibration flush waits for the next batch
    * boundary (invalidate or explicit flush). */
  private def refreshBoosts(): Unit = synchronized {
    hybrid.foreach { e =>
      carriedLog = carriedLog ++ e.drainLog()
      carriedCalib = e.calibSnapshot
    }
    hybrid = None
  }

  /** A6: flush pending retrieval-log rows (full reference schema) to the
    * workspace's append-only parquet log table. */
  def flushRetrievalLog(): Long = {
    import spark.implicits._
    val rows = synchronized {
      val r = carriedLog ++ hybrid.map(_.drainLog()).getOrElse(Vector.empty[RetrievalLogRow])
      carriedLog = Vector.empty
      r
    }
    if (rows.nonEmpty) {
      // a failed append (e.g. the stream thread interrupted at stop — the
      // parquet task aborts before job commit, so nothing partial landed)
      // re-carries the drained rows instead of dropping them: the next
      // flush in this process retries; only a process exit loses them
      // (observability rows — the reference's best-effort contract)
      try workspace.appendLog(rows.toDF(
        "query", "semantic_rank", "keyword_rank", "final_rank",
        "latency_embed_ms", "latency_search_ms", "latency_fusion_ms", "latency_rerank_ms",
        "top_score", "mmr_penalty", "is_exploration", "rank_delta", "stability",
        "created_at"))
      catch { case e: Throwable =>
        synchronized { carriedLog = rows ++ carriedLog }
        throw e
      }
      stabilityMemo.synchronized { // persisted history changed
        stabilityMemo.clear()
        stabilityGen.incrementAndGet()
      }
    }
    rows.size.toLong
  }

  /** Posting rows for a set of chunk rows — the FTS mirror indexes
    * "[heading] text" (vector_store.cpp:195-201). */
  private def postingsOf(chunks: DataFrame): DataFrame = {
    val indexed = chunks.select(col("id"),
      concat_ws(" ", coalesce(col("heading_path"), lit("")), col("text_chunk")).as("itext"))
    TokenIndex.build(indexed, "id", "itext")
  }

  /** Full rebuild of the posting-list index from the current chunk table —
    * the batch path (index()) and the compaction path. The streaming path
    * uses [[mergePostings]] instead: O(batch), not O(corpus). */
  private def rebuildPostings(): Unit =
    workspace.writePostings(postingsOf(workspace.readLiveChunks()))

  /** O(batch) posting maintenance for an appended chunk batch: appended
    * chunks have strictly-new ids, so their postings are strictly-new rows
    * — merge-append them into the live version's token buckets. The caller
    * ([[ingestBatch]]) owns the no-index fallback (a full build over the
    * table, which at that point is the batch or a crash remnant). */
  private def mergePostings(batch: DataFrame): Unit =
    workspace.appendPostings(postingsOf(batch))

  /** Rebuild the IVF cell index from the current chunk table when the
    * engine is configured for ANN candidates (opts.annMode == "ivf"):
    * train centroids with the distributed Lloyd trainer, assign every
    * vector scan-locally, persist partitioned by cid so probes prune at
    * the parquet scan. Under the default exact mode it DROPS any index a
    * previous ivf-mode engine left behind — the chunk table just changed,
    * so that index now references stale ids and a later ivf engine would
    * silently probe it (candidates dropped by the id join, degraded
    * results, no error). */
  private def rebuildAnn(): Unit =
    if (opts.annMode == "ivf") {
      val (vectors, cents) =
        AnnIndex.build(workspace.readLiveChunks(), "id", "embedding", opts.annCells)
      workspace.writeAnn(vectors, cents, pqCodebookFor(vectors, cents))
      recordAutoNprobe(vectors, cents)
    } else if (workspace.hasAnn) workspace.clearAnn()

  /** Under annProbes = 0 (auto), measure the freshly-trained index's
    * cell-coverage ceiling and persist the derived probe width for
    * [[effectiveNprobe]] — after the index commit, so a crash mid-build
    * never pairs a recorded width with an index that failed to land
    * (the stale key then at worst serves the PRIOR index at its own
    * derived width, which is the correct pairing). */
  private def recordAutoNprobe(vectors: DataFrame, cents: Seq[Seq[Double]]): Unit =
    if (opts.annProbes < 1)
      workspace.setMeta("ann_nprobe", AnnIndex.chooseNprobe(vectors, cents).toString)

  /** The residual-PQ codebook for a freshly-built index under
    * annQuant="pq" (None otherwise, or when the embedding geometry
    * doesn't divide into the PQ subspaces — the index then falls back to
    * SQ8 serving columns rather than failing the build). */
  private def pqCodebookFor(vectors: DataFrame,
                            cents: Seq[Seq[Double]]): Option[Seq[Seq[Float]]] =
    if (opts.annQuant != "pq") None
    else AnnIndex.trainPqCodebook(vectors, cents)

  /** O(batch) ANN maintenance for an appended chunk batch: assign only the
    * batch's vectors against the FROZEN trained centroids (KMeans.assign
    * is a scan-local Column expression — the centroid array rides along as
    * a literal) and append them into the live version's cid= partitions.
    * Assignment against frozen centroids stays CORRECT indefinitely — a
    * probe scores appended vectors with the same exact cosine — only cell
    * BALANCE drifts as the corpus outgrows its training set, so a full
    * retrain triggers once appended rows exceed the trained base
    * ([[Workspace.annDriftExceeded]]) or on explicit [[compactIndexes]].
    * The caller ([[ingestBatch]]) owns the no-index fallback (a full
    * build, training from whatever the table holds at that point). */
  private def appendToAnn(batch: DataFrame): Unit = {
    val cents = workspace.readAnnCentroids()
    workspace.appendAnn(
      batch.filter(col("embedding").isNotNull).select(
        col("id"), col("embedding"),
        graft.ml.KMeans.assign(col("embedding"), cents).as("cid")))
    // the retrain is O(corpus): run it on the maintenance thread against a
    // snapshot, never inline in the micro-batch (which would stall ingest
    // behind a full retrain — hours at scale). Assignment against the
    // frozen centroids stays correct meanwhile; only cell balance lags.
    if (workspace.annDriftExceeded) scheduleAnnRetrain()
  }

  /** Schedule a background retrain, with a RERUN handshake instead of a
    * lost wakeup: a request landing while a retrain is already in flight
    * (the CAS fails) marks `annRetrainRerun`, and the in-flight job's
    * finally re-schedules once it releases the queued flag. Without
    * this, an undelete during a retrain would silently drop its repair
    * request — the in-flight job's snapshot predates the undelete, its
    * commit fence sees neither chunks_v nor ann_v move, and the
    * undeleted doc's vectors stay missing until an unrelated drift
    * retrain (round-8 review finding). The rerun retrains over the
    * POST-event live table, superseding the stale commit. */
  private def scheduleAnnRetrain(): Unit =
    if (annRetrainQueued.compareAndSet(false, true))
      maintExec.execute { () =>
        try backgroundAnnRetrain()
        catch { case scala.util.control.NonFatal(e) => lastMaintenanceError = Some(e) }
        finally {
          annRetrainQueued.set(false)
          if (annRetrainRerun.getAndSet(false)) scheduleAnnRetrain()
        }
      }
    else {
      // set-flag-THEN-recheck: if the flag lands after the in-flight
      // job's finally already consumed rerun=false, the queued slot is
      // free again — retrying the CAS here re-queues the request that
      // would otherwise be a lost wakeup (the caller's CAS failed, the
      // worker saw no rerun, nobody runs)
      annRetrainRerun.set(true)
      if (!annRetrainQueued.get() && annRetrainRerun.getAndSet(false))
        scheduleAnnRetrain()
    }

  private def scheduleChunkCompact(): Unit =
    if (chunkCompactQueued.compareAndSet(false, true))
      maintExec.execute { () =>
        try backgroundChunkCompact()
        catch { case scala.util.control.NonFatal(e) => lastMaintenanceError = Some(e) }
        finally chunkCompactQueued.set(false)
      }

  /** Drift-triggered ANN retrain, off the micro-batch critical path: train
    * new centroids over a SNAPSHOT of the chunk table (the files present at
    * the start — the live dir only ever gains files) and write the new
    * index as an uncommitted version, all outside the maintenance lock so
    * batches keep appending to the LIVE version meanwhile. Then, under the
    * lock: assign the delta files (rows appended during training) against
    * the new centroids into the prepared version, and swap the pointer —
    * O(delta) held-lock work, so no rows vanish from the live index at the
    * swap. Aborts (discarding its dir) if an inline rebuild superseded its
    * basis: the chunk pointer moved, or a newer ANN version committed. */
  private def backgroundAnnRetrain(): Unit = {
    if (opts.annMode != "ivf") return
    // pointer FIRST, then the listing: a full rebuild swapping between the
    // two is then caught by the commit guard (the reverse order could pair
    // an old-version snapshot with the new pointer and slip through)
    val chunksV0 = workspace.getMeta("chunks_v")
    val baseFiles = workspace.chunkDataFiles
    if (baseFiles.isEmpty) return
    val snapshot = workspace.minusTombstones(spark.read.parquet(baseFiles: _*))
    val (vectors, cents) = AnnIndex.build(snapshot, "id", "embedding", opts.annCells)
    val v = workspace.prepareAnnVersion(vectors, cents, pqCodebookFor(vectors, cents))
    maintenanceHook()
    maintenance.synchronized {
      val superseded = workspace.getMeta("chunks_v") != chunksV0 ||
        workspace.getMeta("ann_v").exists(_.toInt >= v)
      if (superseded) {
        workspace.discardVersion("ann", v)
        // starvation guard: repeated losses → retrain INLINE while the
        // lock is held (no basis can move), then converge
        if (annRetrainDiscards.incrementAndGet() >= opts.maxMaintenanceDiscards) {
          rebuildAnn()
          invalidate()
          annRetrainDiscards.set(0)
        }
        return
      }
      val delta = workspace.chunkDataFiles.filterNot(baseFiles.toSet)
      if (delta.nonEmpty)
        workspace.appendAnnToVersion(v,
          spark.read.parquet(delta: _*)
            .filter(col("embedding").isNotNull)
            .select(col("id"), col("embedding"),
              graft.ml.KMeans.assign(col("embedding"), cents).as("cid")))
      workspace.commitAnnVersion(v)
      // derived from the training snapshot (the catch-up delta is a
      // vanishing fraction of the retrained corpus; the bias direction
      // of excluding it is the conservative one — see chooseNprobe)
      recordAutoNprobe(vectors, cents)
      invalidate()
      annRetrainDiscards.set(0)
    }
  }

  /** Streaming-path chunk-table compaction, SIZE-TIERED: appendChunks
    * writes one file set per micro-batch, and scan planning degrades as
    * they accumulate — but rewriting the WHOLE table every trigger would
    * be O(corpus) write amplification per ~threshold batches (at 100 TB,
    * a recurring full-table write; the round-6 weak finding). So the live
    * files split by size: the SMALL tier (per-batch appends) is rewritten
    * into a compact set (AQE coalesces the shuffle outputs); the LARGE
    * tier (previous compaction outputs) is carried into the new version
    * as hard links — bytes written per trigger ∝ data appended since the
    * last one, not corpus. The tier floor is 4× the median file size: on
    * the first trigger every file is a batch file (nothing clears the
    * floor → full rewrite, correct); afterwards each compaction output
    * (≳ threshold batches of rows) towers over the per-batch median.
    * The large tier grows by ~1 file per trigger; once IT passes the
    * file-count threshold, one merge rewrite re-tiers everything —
    * amortized O(corpus/threshold) bytes per trigger, bounding both file
    * count and cumulative rewrite volume. Same versioned swap + delta
    * catch-up as a full rebuild; compaction preserves rows and ids
    * exactly. Aborts if a full rebuild moved the pointer first. */
  private def backgroundChunkCompact(): Unit = {
    val chunksV0 = workspace.getMeta("chunks_v") // before the listing (see retrain)
    // delete hygiene: past maxTombstones the job becomes a FULL rewrite
    // (every file re-tiered into the purge) so the set can reset below —
    // a delete-heavy stream otherwise grows the anti-join side unboundedly
    val tombsV0 = workspace.getMeta("tombstones_v")
    val undeleteE0 = workspace.getMeta("undelete_epoch")
    val purging = workspace.hasTombstones &&
      workspace.readTombstones().count() > opts.maxTombstones
    val baseFiles = workspace.chunkDataFiles
    if (baseFiles.isEmpty) return
    val sizes = baseFiles.map(f =>
      f -> java.nio.file.Files.size(java.nio.file.Paths.get(f)))
    val floor = 4L * sizes.map(_._2).sorted.apply(sizes.size / 2)
    val (large0, small0) = sizes.partition(_._2 >= floor)
    val (large, small) =
      if (purging || large0.size > opts.compactFileThreshold) (Nil, sizes) // full/re-tier merge
      else (large0, small0)
    if (small.size < 2 && !purging) return // nothing to collapse this trigger
    // the rewrite purges tombstoned rows from the files it touches for
    // free; the tombstone set STAYS unless this is a full purge (the
    // linked large tier keeps its rows until a full rewrite) — purged
    // rows just anti-join to nothing
    val smallDf = workspace.minusTombstones(spark.read.parquet(small.map(_._1): _*))
    val v = workspace.prepareChunkVersion(smallDf)
    workspace.linkChunkFilesIntoVersion(v, large.map(_._1))
    maintenanceHook()
    maintenance.synchronized {
      // the UNDELETE epoch is part of the fence, not just the chunk
      // pointer: the rewrite filtered its snapshot with the tombstone
      // set as of tombsV0, so a mid-job undelete would otherwise report
      // success while this commit physically drops the restored rows
      // (round-7 advice, Engine.scala:439). A mid-job DELETE is the
      // opposite, SAFE direction — the new tombstone wasn't purged but
      // the surviving set still masks it (pinned by the mid-purge-delete
      // spec) — so the fence tracks undeletes alone, not every
      // tombstones_v move.
      if (workspace.getMeta("chunks_v") != chunksV0 ||
          workspace.getMeta("undelete_epoch") != undeleteE0) {
        workspace.discardVersion("chunks", v)
        // starvation guard: repeated losses → compact INLINE under the
        // held lock (the full writeChunks rewrite — rare by construction;
        // no delete/undelete can interleave while the lock is held, so
        // the unconditional pointer clear is safe and atomic with the
        // commit)
        if (chunkCompactDiscards.incrementAndGet() >= opts.maxMaintenanceDiscards) {
          workspace.writeChunks(workspace.readLiveChunks(),
            clearOnCommit = Seq("tombstones_v"))
          invalidate()
          chunkCompactDiscards.set(0)
        }
        return
      }
      val delta = workspace.chunkDataFiles.filterNot(baseFiles.toSet)
      if (delta.nonEmpty)
        workspace.appendChunksToVersion(v, spark.read.parquet(delta: _*))
      // a full purge resets the set ONLY if no delete landed since the
      // snapshot (a mid-job tombstone may mark rows in files this
      // rewrite already copied, so it must survive; the next trigger
      // purges again) — and the reset rides the SAME atomic pointer
      // flip as the commit, so a crash can't land between them
      workspace.commitChunkVersion(v,
        clearPointers =
          if (purging && workspace.getMeta("tombstones_v") == tombsV0)
            Seq("tombstones_v")
          else Nil)
      invalidate()
      chunkCompactDiscards.set(0)
    }
  }

  /** Explicit compaction: rewrite the chunk TABLE through its versioned
    * swap (streaming appends leave one small file set per micro-batch —
    * scan planning and footer reads degrade as they accumulate), then a
    * full posting + ANN rebuild (retrain) from it — the scheduled
    * counterpart of the O(batch) streaming maintenance. Safe under
    * concurrent searches (all three writers are versioned swaps) and
    * SERIALIZED against the streaming ingest path (the maintenance lock):
    * an unserialized micro-batch could append its rows into the very
    * version this rebuild's pointer swap is about to retire — present in
    * the chunk table, silently absent from the live index until the next
    * compaction. The streaming path self-compacts the table without this
    * blocking call via [[backgroundChunkCompact]] (file-count trigger). */
  def compactIndexes(): Unit = maintenance.synchronized {
    ensureOpen()
    // the full rewrite is the tombstones' physical purge: the new version
    // holds only live rows, so the set resets IN THE SAME atomic metadata
    // move as the pointer flip (a crash can't leave the purged table
    // still masked — and a surviving set would anyway just re-filter
    // rows that are already gone)
    workspace.writeChunks(workspace.readLiveChunks(),
      clearOnCommit = Seq("tombstones_v"))
    rebuildPostings()
    rebuildAnn()
    invalidate()
  }

  /** Delete documents by id — the tombstone path (no reference analog;
    * the reference can only [[Workspace.clear]] the whole store, and at
    * 100 TB a single document's removal must not rewrite anything).
    * O(1) effect on the corpus: the ids join a tiny versioned tombstone
    * set, every read path (search, context, summaries, exports, index
    * rebuilds) serves the chunk table MINUS that set, and the PHYSICAL
    * purge rides the next compaction — [[compactIndexes]] (which then
    * resets the set) or the background size-tiered compactor (which
    * purges the files it rewrites and keeps the set for the rest).
    * Index entries for deleted chunks go stale harmlessly: every result
    * materializes through an inner join against the filtered chunk
    * table, so stale candidates drop there; the next retrain/rebuild
    * drops them from the index files too.
    *
    * A delete WINS against streaming replays on purpose: chunk ids are
    * deterministic, so a replayed micro-batch containing the deleted
    * document must not resurrect it (at-least-once delivery would
    * silently undo user deletes). Re-adding the document is the explicit
    * [[undeleteDocuments]] (same content — the rows are still on disk
    * until a purge), or a full [[index]] call, which replaces the table
    * wholesale and resets the set. Returns the number of ids newly
    * tombstoned.
    *
    * There is deliberately NO in-place document UPDATE: chunk ids are
    * position-keyed (docKey·10⁶ + chunk_idx — the composite identity the
    * ingest oracles replay), so a changed chunk would reuse its id and a
    * chunk-level tombstone could not tell the superseded row from its
    * replacement; stale posting/ANN entries for a still-visible id would
    * then pollute scores instead of dying at the result join. Replacing
    * a document is therefore the explicit sequence delete →
    * [[compactIndexes]] (purge) → re-ingest, or a full [[index]] call —
    * each step idempotent and crash-safe. */
  def deleteDocuments(docIds: Seq[String]): Long = maintenance.synchronized {
    ensureOpen()
    if (docIds.isEmpty) 0L
    else {
      import spark.implicits._
      val before =
        if (workspace.hasTombstones) workspace.readTombstones().count() else 0L
      val total = workspace.addTombstones(docIds.toDF("doc_id"))
      val added = total - before
      // the deny-list survives the purge: without it, an at-least-once
      // replay of an epoch OLDER than the purge could re-ingest the
      // deleted document (no rows, no tombstone — nothing to stop it)
      workspace.addDenyDocs(docIds.toDF("doc_id"))
      // visibility refresh only — the table files didn't change, so the
      // pinned raw cache survives (the refreshBoosts discipline)
      refreshBoosts()
      // delete hygiene: past maxTombstones schedule the background FULL
      // purge (backgroundChunkCompact's purging mode) so the anti-join
      // side can't grow unboundedly under a delete-heavy workload
      if (total > opts.maxTombstones) scheduleChunkCompact()
      added
    }
  }

  /** Explicitly lift tombstones (the re-add path for a document whose
    * rows still exist physically — see [[deleteDocuments]] for why a
    * streaming replay can't do this implicitly). No-op for ids that were
    * never tombstoned or whose rows a purge already dropped. */
  def undeleteDocuments(docIds: Seq[String]): Unit = maintenance.synchronized {
    ensureOpen()
    if (docIds.nonEmpty) {
      import spark.implicits._
      val lifted =
        if (workspace.hasTombstones) {
          // before-size from metadata (recorded at every set swap) — the
          // removed count costs no extra Spark job (review finding: the
          // earlier full count() belied removeTombstones' no-extra-job
          // contract)
          val before = workspace.tombstoneCount
          before - workspace.removeTombstones(docIds.toDF("doc_id"))
        } else 0L
      // fence an in-flight background purge: its snapshot was filtered
      // with the PRE-undelete tombstone set, so letting it commit would
      // physically drop the rows this call just restored while reporting
      // success here (round-7 advice, Engine.scala:439). The epoch bump
      // makes the compactor discard that prepared version; a mid-flight
      // job and this call serialize on the maintenance lock, so either
      // the bump lands before its commit check (discard — rows survive)
      // or the purge already committed (this undelete is the documented
      // rows-already-purged no-op).
      if (lifted > 0)
        workspace.updateMeta("undelete_epoch")(v =>
          (v.getOrElse("0").toLong + 1).toString)
      if (workspace.hasDenyDocs)
        workspace.removeDenyDocs(docIds.toDF("doc_id"))
      refreshBoosts()
      // an ANN index rebuilt while the doc was tombstoned (drift retrain
      // over a minusTombstones snapshot) permanently LACKS its vectors —
      // stale entries die at the result join, but missing entries make
      // the undeleted doc invisible to semantic probes until some
      // unrelated retrain fires (round-7 advice, Engine.scala:528). A
      // lifted tombstone therefore schedules a background retrain; the
      // chunk rows are already visible again meanwhile via the keyword
      // path and result joins, and undeletes are rare enough that the
      // O(corpus) retrain off the critical path is the right trade.
      if (lifted > 0 && workspace.hasAnn) scheduleAnnRetrain()
    }
  }

  /** Ingest a documents table into the workspace chunk store (A3+B+C1),
    * maintaining the posting index — and, under annMode="ivf", the IVF
    * cell index — alongside. Safe under concurrent searches: the chunk
    * table, like both indexes, is a VERSIONED swap (a search mid-flight
    * over the previous version keeps its files for the retention
    * window), and the maintenance lock serializes it against the
    * streaming ingest path. */
  def index(docs: DataFrame): Long = maintenance.synchronized {
    ensureOpen()
    // a full index REPLACES the corpus, so the admission filter resets
    // and re-derives from this call's own first-in-wins admissions. The
    // reset is IN-MEMORY first (a zeroed bitmap): the persisted filter
    // is replaced only once THIS call's recordAdmittedBuckets lands —
    // until then, ANY failure (admitNearDup itself, the table write, or
    // a post-commit rebuild) drops the zeroed bitmap so the next probe
    // lazily reloads the intact persisted filter. The reset therefore
    // lives INSIDE the try: zeroing before it would let a throw from
    // admitNearDup leave the zeroed bitmap live, and the next successful
    // ingestBatch would persist it — silently clobbering all prior
    // admission state (round-7 advice, Engine.scala:555).
    var admission: Option[(DataFrame, DataFrame)] = None
    var filterCommitted = false
    try {
      if (opts.dedupIngest) {
        dedupBloomWords = Some(new Array[Long](math.max(1, opts.dedupBloomBits / 64)))
        admission = Some(admitNearDup(docs))
      }
      // stale tombstones or deny entries would mask documents present in
      // THIS index call — both pointers retire in the SAME atomic
      // metadata move as the chunk-pointer flip (a crash between a
      // commit and separate clears would otherwise break this flow's
      // documented idempotence)
      workspace.writeChunks(
        ChunkStore.buildChunks(admission.map(_._1).getOrElse(docs), embedder),
        clearOnCommit = Seq("tombstones_v", "deny_docs_v"))
      // the filter swap rides IMMEDIATELY behind the table commit, before
      // the index rebuilds: once the new corpus is live, the admission
      // state matching it must be too — a rebuild failure after this
      // point leaves indexes stale vs the new table (the pre-existing
      // index() failure mode, repaired by re-running index or
      // compactIndexes) but can no longer pair the NEW corpus with the
      // OLD corpus's persisted filter (round-8 review finding: the
      // in-memory drop below would otherwise lazily reload it)
      admission.foreach { case (_, positions) =>
        workspace.clearDedupBloom()
        recordAdmittedBuckets(positions)
      }
      filterCommitted = true
      // the two index rebuilds read the SAME committed chunk table and
      // write to independent versioned dirs (postings/ vs ann/, metadata
      // keys under the workspace meta lock) — overlap them so the posting
      // build's tail no longer serializes ahead of the IVF train
      // (optimization guide §2.6 "overlap independent jobs"; round 14).
      // Failures propagate exactly as before: the first throw aborts
      // index() with indexes stale vs the new table — the documented
      // pre-existing failure mode, repaired by re-running index().
      if (opts.annMode == "ivf") {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        try {
          import scala.concurrent.{Await, ExecutionContext, Future}
          import scala.concurrent.duration.Duration
          implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
          val p = Future(rebuildPostings())
          val a = Future(rebuildAnn())
          // await BOTH before rethrowing (round-15, verdict item 4): a
          // rethrow on the first failure would return control while the
          // sibling rebuild is still writing into a workspace the caller
          // now believes failed-and-stale (pool.shutdown() doesn't await)
          val pr = scala.util.Try(Await.result(p, Duration.Inf))
          val ar = scala.util.Try(Await.result(a, Duration.Inf))
          pr.get
          ar.get
        } finally pool.shutdown()
      } else {
        rebuildPostings()
        rebuildAnn()
      }
      workspace.setMeta("summaries_indexed", "false")
      invalidate()
      workspace.count()
    } finally {
      if (!filterCommitted) dedupBloomWords = None // reload the persisted filter lazily
      admission.foreach { case (a, p) =>
        graft.functions.Checkpoints.release(a)
        graft.functions.Checkpoints.release(p)
      }
    }
  }

  // ---- Near-dup ingest admission (opts.dedupIngest, opt-in) ----
  // Cross-batch state is a Bloom bitset over OCCUPIED MinHash band
  // buckets: per batch the membership test is scan-local against the
  // (m/8-byte) bitmap riding in as a broadcast one-row array — the
  // curation_bloom_decontam contract, so admission is O(batch) however
  // large the corpus grows, and the bitmap persists across restarts
  // (workspace.dedup_bloom.bin, atomic swap). The price is a documented
  // false-REJECT rate (≈ (inserted·k/m)^k per bucket); the EXACT form
  // of the same filter is the streaming nearDupStream state. Deletes
  // don't un-see content: a deleted document's buckets stay occupied.
  private val DedupBloomHashes = 3
  @volatile private var dedupBloomWords: Option[Array[Long]] = None

  /** The live bitmap. Geometry is a property of the PERSISTED filter:
    * a workspace written under a different dedupBloomBits keeps ITS
    * size (m = words·64) — opts sizes only a freshly-created filter, so
    * a reopen with mismatched options can neither probe out of range
    * nor silently halve the filter. */
  private def dedupBloom(): Array[Long] = dedupBloomWords.getOrElse {
    val w = workspace.readDedupBloom()
      .getOrElse(new Array[Long](math.max(1, opts.dedupBloomBits / 64)))
    dedupBloomWords = Some(w)
    w
  }

  /** Partition the batch into admitted rows and near-dup rejects:
    * a document is refused when EVERY probe bit of at least one of its
    * band buckets is already set (seen content), or when a same-batch
    * document with a smaller doc_id shares a bucket (first-in-wins —
    * the nearDupStream contract). Token-less documents bypass (no
    * signature, nothing to collide with). Returns (admitted batch rows,
    * the admitted docs' distinct bloom positions — record them via
    * [[recordAdmittedBuckets]] only AFTER the ingest succeeds, so a
    * failed batch doesn't poison the filter). Both frames are
    * materialized; the caller owns their release. */
  private def admitNearDup(batch: DataFrame): (DataFrame, DataFrame) = {
    import graft.functions.F
    import org.apache.spark.sql.functions.{array, array_distinct, conv, explode, expr, md5, min, pmod, size, substring, typedlit}
    val words = dedupBloom()
    val m = words.length.toLong * 64L
    val sets = batch
      .select(col("doc_id"), array_distinct(F.tokens(col("text"))).as("toks"))
      .filter(size(col("toks")) > 0)
    val bands = graft.dedup.DedupPipeline.bandBuckets(sets, "doc_id", "toks")
      .select(col("doc_id"), col("band"), col("bkey"),
        md5(concat_ws(":", col("band"), col("bkey"))).as("h"))
      .localCheckpoint()
    try {
      import spark.implicits._
      // probe positions: 10-hex (40-bit) md5 slices — the full bitmap
      // range stays reachable up to m = 2^40 bits, far past any
      // configurable geometry (a 24-bit slice would silently cap the
      // effective m at 16M bits whatever the user configured)
      def pos(i: Int) =
        pmod(conv(substring(col("h"), 1 + 10 * i, 10), 16, 10).cast("long"), lit(m))
      val probes = 0 until DedupBloomHashes
      val wordsDf = broadcast(Seq(Tuple1(words.toSeq)).toDF("bw"))
      val withPos = probes.foldLeft(bands.crossJoin(wordsDf)) {
        (df, i) => df.withColumn(s"p$i", pos(i))
      }
      def hit(pc: String) = expr(
        s"(shiftright(element_at(bw, cast($pc div 64 as int) + 1), cast($pc % 64 as int)) & 1) = 1")
      val seenDup = withPos
        .filter(probes.map(i => hit(s"p$i")).reduce(_ && _))
        .select(col("doc_id")).distinct()
      val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bkey")
      val intraDup = bands.join(seenDup, Seq("doc_id"), "left_anti")
        .withColumn("mn", min(col("doc_id")).over(w))
        .filter(col("doc_id") > col("mn"))
        .select(col("doc_id")).distinct()
      val rejected = seenDup.unionByName(intraDup)
      val admitted = batch.join(broadcast(rejected), Seq("doc_id"), "left_anti")
        .localCheckpoint()
      // distinct positions are bounded by min(batch·bands·k, m) — the
      // bloom-decontam collect contract (filter geometry, never corpus)
      val newPositions =
        try withPos.join(broadcast(rejected), Seq("doc_id"), "left_anti")
          .select(explode(array(probes.map(i => col(s"p$i")): _*)).as("p"))
          .distinct()
          .localCheckpoint()
        catch { case e: Throwable =>
          graft.functions.Checkpoints.release(admitted); throw e
        }
      (admitted, newPositions)
    } finally graft.functions.Checkpoints.release(bands)
  }

  /** Fold an ingested batch's bucket positions into the bitmap and
    * persist it (atomic swap). Runs AFTER the chunk/index writes: a
    * crash in between merely re-admits the batch on replay, where the
    * chunk-table probe skips the already-written rows. */
  private def recordAdmittedBuckets(positions: DataFrame): Unit = {
    val ps = positions.collect().map(_.getLong(0))
    if (ps.nonEmpty) {
      val w = dedupBloom().clone()
      ps.foreach(p => w((p / 64).toInt) |= 1L << (p % 64).toInt)
      dedupBloomWords = Some(w)
      workspace.writeDedupBloom(w)
    }
  }

  /** One streamed micro-batch of documents through the incremental ingest
    * path: chunk + embed ONCE (localCheckpoint — the append, the posting
    * merge, and the ANN assignment all read the materialized batch), then
    * O(batch) index maintenance — [[mergePostings]] appends the batch's
    * posting rows into the live token buckets and [[appendToAnn]] assigns
    * the batch against the frozen centroids into the live cid= partitions.
    * Per-batch work is proportional to the BATCH, never the corpus (the
    * drift-triggered retrain being the documented exception).
    *
    * IDEMPOTENT under at-least-once delivery: foreachBatch can replay an
    * epoch after a crash between the chunk append and the stream
    * checkpoint commit, and chunk ids are deterministic — a naive
    * re-append would double every replayed chunk's postings and ANN rows
    * (violating the merge paths' strictly-new-ids precondition). A prior
    * process can die between ANY pair of the three writes (chunk append,
    * posting merge, ANN append), so a replayed epoch may find SOME targets
    * already written: with `probeExisting` EACH target is probed
    * independently — the batch anti-joined against the ids that target
    * already holds — and only the missing remainder is written. (A single
    * chunk-table probe would make the whole replay a no-op when the crash
    * fell after the chunk append, permanently skipping the batch's index
    * merges.) Each probe is one scan of its target, map-side restricted by
    * the broadcast batch ids; the streaming path pays them ONLY where a
    * replay is possible — the first batch after open (the previous process
    * may have died mid-epoch) and any non-advancing batchId — keeping
    * steady-state batches at O(batch) records read.
    *
    * The probes are chunk-granular and assume WITHIN-write atomicity: a
    * target either holds a chunk's rows completely or not at all. Parquet
    * job commit provides that here — every write lands via a Spark job
    * whose task output stays under _temporary until job commit — except
    * for the commit's own rename window, which is a few driver-side
    * renames, not the write itself. A sink without job-commit atomicity
    * (or one where that window matters) would need the probe strengthened
    * to compare per-chunk row counts against the batch; compactIndexes()
    * rebuilds from the chunk table and heals any such partial target. */
  private[graft] def ingestBatch(batch: DataFrame, probeExisting: Boolean = true): Unit =
    maintenance.synchronized {
      // the delete deny-list outranks everything: a replayed epoch must
      // not resurrect an explicitly-deleted document even after the
      // purge reset its tombstone (ids cast to string — chunk identity)
      val denied =
        if (!workspace.hasDenyDocs) batch
        else {
          val deny = workspace.readDenyDocs().select(col("doc_id").as("__deny_id"))
          batch.join(broadcast(deny),
            batch("doc_id").cast("string") === col("__deny_id"), "left_anti")
        }
      // near-dup admission BEFORE chunk+embed (opt-in): the refused
      // documents never pay the model boundary. Positions are recorded
      // only after the ingest below succeeds.
      val admission = if (opts.dedupIngest) Some(admitNearDup(denied)) else None
      val toIngest = admission.map(_._1).getOrElse(denied)
      var probed: List[DataFrame] = Nil
      var built0: DataFrame = null
      try {
        // materialized BEFORE the append (localCheckpoint): the downstream
        // consumers re-evaluate the batch, and a lazy anti-join would
        // re-probe its target AFTER the write added these very rows —
        // seeing every id as a duplicate and silently skipping the rest
        built0 = ChunkStore.buildChunks(toIngest, embedder).localCheckpoint()
        if (built0.isEmpty) return
        val probe = probeExisting && workspace.registeredDim.nonEmpty
        val batchIds =
          if (probe) broadcast(built0.select(col("id").as("probe_id")).distinct())
          else null
        // the batch rows whose ids are NOT yet in `target`'s idCol
        def missingFrom(target: DataFrame, idCol: String): DataFrame = {
          val existing = target.join(batchIds, col(idCol) === col("probe_id"), "leftsemi")
            .select(col(idCol).as("id")).distinct()
          val m = built0.join(existing, Seq("id"), "leftanti").localCheckpoint()
          probed ::= m
          m
        }
        val newChunks =
          if (!probe) built0 else missingFrom(workspace.readChunks(), "id")
        val wroteChunks = !newChunks.isEmpty
        if (wroteChunks) workspace.appendChunks(newChunks)

        var wroteIndex = false
        if (!workspace.hasPostings) {
          // fresh workspace (streaming-first ingest) or a crash remnant
          // that never got its first posting build: index the whole table
          rebuildPostings(); wroteIndex = true
        } else {
          val newPostings =
            if (!probe) newChunks
            else missingFrom(workspace.readPostings(), "chunk_id")
          if (!newPostings.isEmpty) { mergePostings(newPostings); wroteIndex = true }
        }

        if (opts.annMode == "ivf") {
          if (!workspace.hasAnn) { rebuildAnn(); wroteIndex = true }
          else {
            val newAnn =
              if (!probe) newChunks else missingFrom(workspace.readAnn(), "id")
            if (!newAnn.isEmpty) { appendToAnn(newAnn); wroteIndex = true }
          }
        } else if (workspace.hasAnn) workspace.clearAnn()

        if (wroteChunks || wroteIndex) {
          workspace.setMeta("summaries_indexed", "false")
          invalidate() // table changed: next search() re-reads + re-pins
        }
        // self-compaction trigger: a long-running stream accumulates one
        // file set per micro-batch forever otherwise (the listing is one
        // directory LIST — the scan planner pays the same each batch)
        if (wroteChunks && workspace.chunkFileCount > opts.compactFileThreshold)
          scheduleChunkCompact()
        // the batch is fully ingested: NOW its buckets may refuse future
        // near-dups (recording earlier would let a failed batch poison
        // the filter against content that never landed)
        admission.foreach { case (_, positions) => recordAdmittedBuckets(positions) }
      } finally {
        if (built0 != null) graft.functions.Checkpoints.release(built0)
        probed.foreach(graft.functions.Checkpoints.release)
        admission.foreach { case (a, p) =>
          graft.functions.Checkpoints.release(a)
          graft.functions.Checkpoints.release(p)
        }
      }
    }

  /** Continuous ingest — the reference's incremental index queue
    * (mainwindow.cpp:713-761, one INSERT per chunk plus its FTS mirror
    * row) as a Structured Streaming foreachBatch sink: documents landing
    * in `inputDir` are chunked + embedded by the SAME batch pipeline as
    * [[index]] and appended to the workspace chunk table, with the
    * posting (and, under annMode="ivf", ANN) index INCREMENTALLY
    * maintained per micro-batch ([[ingestBatch]] — O(batch) appends, not
    * full rebuilds) — so [[search]] finds streamed docs without any
    * manual index() call. The checkpoint lives inside the workspace, so a
    * restarted stream resumes over the source files; delivery into
    * foreachBatch is AT-LEAST-ONCE, and [[ingestBatch]]'s id anti-join
    * makes the sink idempotent — together, effectively-once on the
    * workspace and its indexes.
    *
    * Safe to run CONCURRENTLY with [[search]] (a continuous trigger, not
    * just AvailableNow): per-batch index maintenance APPENDS files (never
    * deletes or mutates), the drift-triggered retrain is a versioned swap
    * whose prior versions survive [[Workspace.RetainPriorVersions]] full
    * rebuild cycles for in-flight readers, and every engine-state swap is
    * synchronized — so a search holds a consistent engine whose files
    * outlive its query up to that retention bound (a query spanning MORE
    * than that many complete retrain cycles would lose its files). */
  def startStreamingIngest(inputDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    ensureOpen()
    val docs = spark.readStream
      .schema(graft.streaming.StreamingIngest.documentsSchema)
      .parquet(inputDir)
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // replay is possible only on the first epoch after open (a prior
        // process may have died between append and checkpoint commit) or
        // when the batchId fails to advance — everywhere else the
        // anti-join probe would be a wasted corpus read
        val probe = lastSeenBatchId == Long.MinValue || batchId <= lastSeenBatchId
        if (!batch.isEmpty) ingestBatch(batch, probeExisting = probe)
        lastSeenBatchId = math.max(lastSeenBatchId, batchId)
        ()
      }
      .option("checkpointLocation", s"${workspace.root}/_ingest_checkpoint")
      .trigger(trigger)
      .start()
  }

  /** E1–E4: calibration stats persisted per-model in workspace metadata
    * (mainwindow.cpp:499-503). */
  def loadCalibration(modelSig: String): Calibration.Stats =
    workspace.getMeta(s"calib_$modelSig") match {
      case Some(s) =>
        val parts = s.split(",")
        Calibration.Stats(parts(0).toDouble, parts(1).toDouble, parts(2).toLong)
      case None => Calibration.initial
    }

  def saveCalibration(modelSig: String, stats: Calibration.Stats): Unit =
    workspace.setMeta(s"calib_$modelSig", s"${stats.mean},${stats.std},${stats.n}")

  /** The hybrid SELECT with latency-adaptive depth (D17): measured search
    * time feeds the EMA; high latency shrinks the candidate depth on the
    * next query.
    *
    * Always serves the LIVE corpus through the LIVE indexes. Snapshot
    * reads ([[Workspace.readChunksAt]]) pin TABLE state only — there is
    * deliberately no search-as-of (see readChunksAt's contract note);
    * a pinned snapshot affects what a training run READS, never what
    * this method retrieves. */
  def search(query: String, k: Int = opts.limit): Seq[ScoredChunk] = {
    ensureOpen()
    val t0 = System.nanoTime()
    // D17 policy: >1500ms EMA caps overfetch at 3x; >4000ms bypasses the
    // vector branch entirely (FTS-only, flat 0.5) — Summary intent exempt
    // from the bypass (vector_store.cpp:321-337)
    val isSummary = graft.model.Intent.detect(query) == graft.model.Intent.Summary
    val decision = latency.decide(isSummary)
    val depthCap = if (decision == latency.Normal) Int.MaxValue else 3
    val kwOnly = decision == latency.KeywordOnly
    val out = engine().search(query, embedder, k,
      maxDepthFactor = depthCap, keywordOnly = kwOnly)
    // D19 benchmark mode (setBenchmarkingMode, vector_store.cpp:576-579):
    // the EMA stays frozen at its seed, so measured wall-clock can never
    // change a later query's depth — the facade's output becomes
    // machine-speed-independent (what the oracle gate requires)
    if (!opts.benchmarkMode) latency.record((System.nanoTime() - t0) / 1e6)
    out
  }

  def latencyEmaMs: Double = latency.emaMs

  /** Search AS-OF a retained chunk snapshot — the reproducibility
    * counterpart of [[graft.store.Workspace.readChunksAt]]. Exact-scan
    * semantics over the pinned table (reference semantics,
    * vector_store.cpp:206-237): no posting or ANN index is consulted,
    * because index HISTORY is unreconstructible once a post-delete
    * retrain dropped vectors (readChunksAt's contract note) — an exact
    * scan over the frozen table is correct by construction, at scan
    * cost. Stateless on purpose: no query cache, no exploration
    * injection, no stability bias, no latency coupling, and the
    * snapshot's own PERSISTED boost_factor scores trust instead of the
    * live click ledger — two calls with the same (version, query, k)
    * return identical results for as long as the version is retained
    * AND the tombstone set is unchanged between them: readChunksAt
    * deliberately overlays the CURRENT tombstones (a takedown hides the
    * document from history too), so an interleaved delete/undelete is
    * the one live state a snapshot search still observes.
    * The tiny engine wrapper is rebuilt per call and discarded, so its
    * un-flushed retrieval-log rows never accrue driver state. */
  def searchAt(version: Int, query: String, k: Int = opts.limit): Seq[ScoredChunk] = {
    ensureOpen()
    val snap = new HybridEngine(spark, workspace.readChunksAt(version),
      opts.copy(deterministic = true, enableExploration = false, annMode = "exact"))
    snap.search(query, embedder, k)
  }

  /** Timestamp-as-of variant of [[searchAt]] (Delta-style TIMESTAMP AS
    * OF): resolves the retained version committed at or before the
    * instant ([[graft.store.Workspace.chunkVersionAt]]) and serves it by
    * exact scan under the same statelessness contract. */
  def searchAtTime(tsMillis: Long, query: String, k: Int = opts.limit): Seq[ScoredChunk] =
    searchAt(workspace.chunkVersionAt(tsMillis).getOrElse(
      throw new IllegalArgumentException(
        s"no retained chunk version committed at or before $tsMillis")), query, k)

  /** F1/F2: click boosting with exploration quarantine; boosts take effect
    * on the next search via the ledger's broadcast join over the pinned
    * chunk cache — no cache drop, no table re-read (immutable-store
    * ledger design, incremental like the reference's in-place UPDATE). */
  def recordClick(chunkId: Long, query: String, isExploration: Boolean = false): Unit = {
    ensureOpen()
    synchronized {
      ledger = BoostLedger.append(ledger, Seq(BoostLedger.Click(chunkId, query, isExploration)))
    }
    refreshBoosts()
  }

  /** D13/F3: neighboring chunks of a hit. */
  def context(chunkId: Long, offset: Int = 1): DataFrame = {
    ensureOpen()
    engine().context(chunkId, offset)
  }

  /** C4: summaries indexed back into the store as summary chunks
    * (mainwindow.cpp:783-802: re-embedded, chunk_type='summary', level 1).
    * Summary rows are re-inserted with CURRENT_TIMESTAMP like the
    * reference's addEntry (vector_store.cpp:80), so fresh summaries carry
    * recency ≈ 1.0 rather than decaying from a pinned epoch. */
  def summarizeSections(): Long = maintenance.synchronized {
    ensureOpen()
    import org.apache.spark.sql.functions._
    if (workspace.getMeta("summaries_indexed").contains("true")) return 0L
    // summaries never feed summaries (a second pass over an already-
    // summarized store would re-derive and duplicate them)
    val chunks = workspace.readLiveChunks().filter(col("chunk_type") =!= "summary")
    val rows = Summarizer.summaryRows(chunks, summaryModel, embedder)
    // summary rows occupy the reserved 999xxx band of the per-doc id range,
    // one slot per heading (ordinal within doc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("heading_path"))
    val withIdx = rows.withColumn("sum_idx",
      lit(999000) + org.apache.spark.sql.functions.row_number().over(w) - 1)
    val asChunks = withIdx.select(
      (ChunkStore.docKeyCol(col("doc_id")) * 1000000L + col("sum_idx")).as("id"),
      col("doc_id"),
      col("heading_path").as("source_file"),
      col("sum_idx").as("chunk_idx"),
      col("summary").as("text_chunk"),
      col("embedding"), col("model_sig"), col("model_dim"),
      lit(1).as("sentence_count"), lit(0).as("page_num"),
      col("heading_path"), col("heading_level"), col("chunk_type"),
      lit(null).cast("string").as("list_type"), lit(0).as("list_length"),
      lit(1.0f).as("boost_factor"),
      current_timestamp().as("created_at"))
      .select(chunks.columns.map(col): _*)
      .cache() // ONE execution of the summarize+embed pipeline: the guard
               // count, the returned count, and the append all read this
    try {
      // the 999xxx band holds 1000 slots per doc; a doc with more heading
      // paths would collide with the next docKey's id range (mirror of the
      // chunkIdx < 999000 require in ChunkStore.buildChunks)
      val agg = asChunks.agg(
        count(lit(1)).as("n"),
        count(when(col("chunk_idx") >= 999000 + 1000, 1)).as("overflow")).head()
      require(agg.getLong(1) == 0,
        s"summary band overflow: ${agg.getLong(1)} rows beyond 1000 headings/doc")
      workspace.appendChunks(asChunks)
      rebuildPostings()
      rebuildAnn() // summary rows must be probe-visible too, not just FTS-visible
      workspace.setMeta("summaries_indexed", "true")
      invalidate()
      agg.getLong(0)
    } finally asChunks.unpersist()
  }

  /** E5–E8: deep-dive claim synthesis over the top results. */
  def deepDive(query: String): Seq[DeepDive.DeepDiveClaim] = {
    ensureOpen()
    DeepDive.run(engine(), query, embedder, synthesisModel)
  }

  /** Lifecycle end — the reference closes its store on workspace switch
    * (mainwindow.cpp:120-137); Spark-side the close is what actually frees
    * executor memory: dropping an Engine REFERENCE frees nothing, because
    * the pinned chunk cache lives in the session-global block manager
    * until unpersisted. Drains queued background maintenance, flushes
    * pending retrieval-log rows (A6) and calibration (E4) through
    * [[invalidate]], unpersists the raw chunk cache, and stops the
    * maintenance thread. Terminal: index/search after close is a caller
    * bug (the maintenance executor is shut down). Idempotent.
    *
    * `deleteWorkspace = true` additionally removes the on-disk workspace
    * root — for THROWAWAY workspaces only (bench/test temp roots whose
    * sole reader is this engine). */
  def close(deleteWorkspace: Boolean = false): Unit = closeLock.synchronized {
    // closeLock serializes concurrent closers (a bare isShutdown check
    // let two callers race into submit-after-shutdown); the flag makes
    // the second caller a no-op.
    if (!closed) {
      closed = true // public entry points fail fast from here on
      // Quiesce, not just drain: the retrain rerun handshake re-enqueues
      // from the job's `finally` — a single drain marker can complete
      // with a freshly queued retrain BEHIND it, and invalidate/delete
      // below would then race a live maintenance task (workspace files
      // recreated after the delete, blocks re-pinned after unpersist).
      // Loop until a drain completes with every job flag clear; the
      // cascade terminates because `closed` stops new work arriving.
      var quiescent = false
      while (!quiescent) {
        awaitMaintenance()
        quiescent = !(annRetrainQueued.get() || annRetrainRerun.get() ||
          chunkCompactQueued.get())
      }
      maintExec.shutdown()
      invalidate() // flush log + calibration, unpersist the pinned cache
      if (deleteWorkspace)
        graft.util.TempRoot.deleteRecursively(java.nio.file.Paths.get(workspace.root))
    }
  }
}

object Engine {
  /** A8: open (or switch to) a workspace by name. */
  def open(spark: SparkSession, appRoot: String, name: String,
           opts: SearchOptions = SearchOptions()): Engine =
    new Engine(spark, Workspace.open(spark, appRoot, name), opts = opts)
}
