package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Workspace layout + auxiliary sinks (SURVEY §2 A4–A8, D20, D21).
  *
  * A workspace = a directory holding the chunk table, the retrieval log,
  * and a metadata KV sidecar — the Spark analog of the reference's
  * one-sqlite-file-per-workspace layout (mainwindow.cpp:936-952). At
  * cluster scale the root becomes a bucket/catalog prefix; the layout and
  * operations are unchanged.
  */
final class Workspace(val spark: SparkSession, val root: String) {

  private def p(parts: String*): String = (root +: parts).mkString("/")

  // ---- A8: workspace scan/switch

  /** The chunk table is VERSIONED exactly like the posting/ANN indexes
    * (chunks/v1, v2, …, pointer in the metadata KV): writeChunks is a
    * full rebuild, and an overwrite of the live dir would delete part
    * files out from under a concurrently-running search — the same
    * reader-safety contract as [[writePostings]]/[[writeAnn]]. Appends
    * (the streaming path) go INTO the live version: files only ever
    * added, never mutated, so in-flight readers stay consistent.
    *
    * Workspaces written before versioning stored parquet directly under
    * chunks/ with no pointer — those resolve to the legacy dir (reads
    * and appends keep working on it) until the next full rebuild
    * migrates them to v1. The superseded legacy files then behave like
    * any prior version: retained for [[Workspace.RetainPriorVersions]]
    * swap cycles (an in-flight legacy reader keeps its files), then
    * reclaimed best-effort on every later swap. */
  def chunksPath: String = currentVersion("chunks_v") match {
    case Some(v)                    => p("chunks", s"v$v")
    case None if legacyChunkLayout  => p("chunks")
    case None                       => p("chunks", "v1")
  }

  /** Entries under chunks/ that are NOT versioned dirs — the ONE place
    * the "legacy file = non-v-prefixed entry" convention lives (the
    * detector and the reclaimer must never disagree on it). */
  private def nonVersionedChunkEntries: List[Path] = {
    val dir = Paths.get(p("chunks"))
    if (!Files.exists(dir)) Nil
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.filterNot(_.getFileName.toString.startsWith("v")).toList
      finally s.close()
    }
  }

  private def legacyChunkLayout: Boolean = nonVersionedChunkEntries.nonEmpty

  /** Data files of the live chunk version (committer sidecars excluded) —
    * the compaction trigger's input, and the snapshot/delta unit for the
    * background compactor: the live dir only ever GAINS files (appends
    * never mutate), so "files added since a listing" is exactly the rows
    * a snapshot taken at that listing missed. */
  def chunkDataFiles: Seq[String] = {
    val dir = Paths.get(chunksPath)
    if (!Files.exists(dir)) Nil
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.toString)
        .filter { full =>
          val name = full.substring(full.lastIndexOf('/') + 1)
          !name.startsWith("_") && !name.startsWith(".")
        }
        .toList.sorted
      finally s.close()
    }
  }

  def chunkFileCount: Int = chunkDataFiles.size

  def logPath: String = p("retrieval_logs")
  private def metaPath: Path = Paths.get(root, "workspace_metadata.json")

  // ---- A3: chunk sink

  /** `clearOnCommit` names version POINTERS (e.g. "tombstones_v",
    * "deny_docs_v") reset to 0 in the SAME atomic metadata write as the
    * chunk-pointer flip — a full corpus replace that instead cleared them
    * in follow-up writes could crash in between and leave the new table
    * masked by stale tombstones (and re-ingest blocked by a stale
    * deny-list), breaking the replace flow's idempotence contract. */
  def writeChunks(chunks: DataFrame, clearOnCommit: Seq[String] = Nil): Unit = {
    // cache for the validate+write double pass — the ingest pipeline
    // (chunk+embed) would otherwise execute twice
    val c = chunks.cache()
    try {
      // first write registers the embedding dimension (vector_store.cpp:186-189)
      val dim = registeredDim match {
        case Some(d) => d
        case None =>
          val d = c.select(size(col("embedding"))).head().getInt(0)
          setMeta("model_dim", d.toString)
          d
      }
      val bad = ChunkStore.checkDim(c, dim)
      require(bad == 0, s"dimension guardrail: $bad rows with embedding length != $dim")
      commitChunkVersion(prepareChunkVersion(c), clearOnCommit)
    } finally c.unpersist()
  }

  /** Write `chunks` as a freshly-ALLOCATED next chunk version WITHOUT
    * moving the live pointer — the background compactor's first half
    * (runs outside the maintenance lock; readers and appenders never see
    * the dir until [[commitChunkVersion]]). Allocation is serialized
    * through the metadata lock, so a concurrent inline rebuild can never
    * be handed the same version number. */
  private[graft] def prepareChunkVersion(chunks: DataFrame): Int = {
    val next = allocateVersion("chunks_v", "chunks_alloc_v")
    ChunkStore.write(chunks, p("chunks", s"v$next"))
    next
  }

  /** Append rows into a PREPARED (uncommitted) chunk version — the
    * compactor's catch-up for files appended to the live version after
    * its snapshot listing. Runs before the pointer swap, so no reader
    * ever observes the version partially caught up. */
  private[graft] def appendChunksToVersion(version: Int, rows: DataFrame): Unit =
    rows.write.mode(SaveMode.Append).parquet(p("chunks", s"v$version"))

  /** Carry already-compacted data files into a PREPARED (uncommitted)
    * chunk version as HARD LINKS — the size-tiered compactor's large-tier
    * carry: version dirs only ever gain immutable files, so a link is
    * safe, and reclaiming the source version later merely unlinks its
    * directory entry. O(1) per file (no bytes rewritten); falls back to a
    * copy where the filesystem can't link. Basenames are job-UUID-unique,
    * but a collision degrades to a prefixed name, never an overwrite. */
  private[graft] def linkChunkFilesIntoVersion(version: Int, files: Seq[String]): Unit = {
    val dir = Paths.get(p("chunks", s"v$version"))
    files.zipWithIndex.foreach { case (f, i) =>
      val src = Paths.get(f)
      val base = src.getFileName.toString
      val dst0 = dir.resolve(base)
      val dst = if (Files.exists(dst0)) dir.resolve(s"tier$i-$base") else dst0
      try Files.createLink(dst, src)
      catch {
        case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
          Files.copy(src, dst)
      }
    }
  }

  /** Move the live chunk pointer to `version` — the COMMIT point of the
    * swap — then reclaim versions past the retention window. Version
    * numbers may skip (an aborted background preparation leaves a gap),
    * so reclamation SWEEPS all committed versions below the window
    * rather than index-subtracting. */
  private[graft] def commitChunkVersion(version: Int,
                                        clearPointers: Seq[String] = Nil): Unit = {
    require(currentVersion("chunks_v").getOrElse(0) < version,
      s"chunk version pointer may only advance (live=${currentVersion("chunks_v")}, commit=$version)")
    // commit stamp BEFORE the pointer flip (a crash in between leaves an
    // uncommitted dir with a stray stamp — harmless, reclaimed with it);
    // clamped monotone over existing stamps so a wall-clock step back
    // can never make timestamp-as-of resolution non-monotonic in the
    // version order. "_"-prefixed sidecars are invisible to parquet
    // readers and to chunkDataFiles.
    writeCommitStamp(version)
    // the pointer flip IS the commit point; any delete-state pointers the
    // caller retires land in the same atomic metadata move (see writeChunks)
    setMetaAll(clearPointers.map(_ -> "0").toMap + ("chunks_v" -> version.toString))
    versionNumbers("chunks")
      .filter(_ < version - Workspace.RetainPriorVersions)
      .foreach(v => deleteTree(Paths.get(p("chunks", s"v$v"))))
    if (version - 1 - Workspace.RetainPriorVersions >= 0) {
      // the legacy (pre-versioning) files are "v0": once v0 would be
      // past the retention window, reclaim them too — BEST-EFFORT and
      // re-attempted on EVERY later swap (a crash or IO error here
      // must neither strand them forever nor skip the staging
      // invalidation below), never at the migration commit itself (an
      // in-flight legacy reader gets the same grace as any version)
      try nonVersionedChunkEntries.foreach(f =>
        if (Files.isDirectory(f)) deleteTree(f) else Files.delete(f))
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // staged plans keyed on this workspace's paths are now stale
    graft.functions.Staging.invalidate(root)
  }

  /** Drop an uncommitted prepared version (a background job that lost the
    * commit race — an inline rebuild superseded its basis). */
  private[graft] def discardVersion(kind: String, version: Int): Unit =
    deleteTree(Paths.get(p(kind, s"v$version")))

  /** Committed-or-prepared version numbers present on disk under `kind`. */
  private def versionNumbers(kind: String): Seq[Int] = {
    val dir = Paths.get(p(kind))
    if (!Files.exists(dir)) Nil
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.matches("v\\d+") => n.drop(1).toInt }
        .toList
      finally s.close()
    }
  }

  /** Hand out a version number no other writer (inline or background) can
    * receive: max(live pointer, last allocation) + 1, recorded under ONE
    * metadata-lock hold — two concurrent preparations can therefore never
    * write into the same version dir. */
  private def allocateVersion(pointerKey: String, allocKey: String): Int =
    metaLock.synchronized {
      val next = math.max(
        currentVersion(pointerKey).getOrElse(0),
        getMeta(allocKey).map(_.toInt).getOrElse(0)) + 1
      writeAllMeta(allMeta + (allocKey -> next.toString))
      next
    }

  def readChunks(): DataFrame = spark.read.parquet(chunksPath)

  /** COMMITTED chunk-table versions still on disk — the live pointer plus
    * the [[Workspace.RetainPriorVersions]] retained priors (uncommitted
    * background preparations are excluded: their dirs exist above the
    * pointer but hold no committed state). These are the snapshot ids a
    * reproducible training run can pin with [[readChunksAt]] — the
    * versioned swap already keeps the files, so time travel inside the
    * retention window is free. */
  def chunkVersions: Seq[Int] = {
    val live = currentVersion("chunks_v").getOrElse(0)
    versionNumbers("chunks").filter(_ <= live).sorted
  }

  /** Read the chunk table AS OF a retained version. A PRIOR version is
    * frozen the moment the pointer moves past it (appends only ever
    * target the live version), so a run that pins a superseded id
    * re-reads identical data until the retention walk reclaims it;
    * pinning the LIVE id observes its appends until the next swap.
    * Throws on an unknown or already-reclaimed id.
    *
    * CONTRACT — time travel is a TABLE-level guarantee, not an
    * engine-level one: this pins the DATA a reproducible run reads
    * (training snapshots, exports, audits). [[graft.api.Engine.search]]
    * always serves the LIVE corpus through the LIVE posting/ANN
    * indexes — index versions advance independently of chunk versions
    * (drift retrains, posting merges), and there is deliberately no
    * search-as-of: a historical search would need the index HISTORY
    * re-resolved against the snapshot (candidates absent from today's
    * index are unrecoverable once a post-delete retrain dropped them),
    * which no candidate-join can reconstruct. The reproducibility path
    * that IS sound — an exact scan over the frozen table, no index
    * consulted — exists as [[graft.api.Engine.searchAt]]. Pinned by
    * EngineFacadeSpec ("time travel pins the table; search serves the
    * live corpus"). */
  def readChunksAt(version: Int): DataFrame = {
    require(chunkVersions.contains(version),
      s"chunk version v$version is not on disk (committed versions: ${chunkVersions.mkString(", ")})")
    // the CURRENT tombstone set overlays every snapshot: a takedown
    // hides the document from history too, not just from the live view
    minusTombstones(spark.read.parquet(p("chunks", s"v$version")))
  }

  private def stampPath(version: Int): Path =
    Paths.get(p("chunks", s"v$version", "_committed_at"))

  private def writeCommitStamp(version: Int): Unit = {
    val floor = chunkVersions.flatMap(commitStampOf).maxOption.getOrElse(0L)
    val ts = math.max(System.currentTimeMillis(), floor + 1)
    val dir = Paths.get(p("chunks", s"v$version"))
    if (!Files.exists(dir)) Files.createDirectories(dir)
    Files.write(stampPath(version),
      ts.toString.getBytes(StandardCharsets.UTF_8))
  }

  /** Commit wall-clock (epoch millis) of a retained version — None for
    * versions committed before stamps existed (or the legacy v1
    * migration, which never passes through commitChunkVersion). */
  def commitStampOf(version: Int): Option[Long] =
    if (!Files.exists(stampPath(version))) None
    else scala.util.Try(new String(Files.readAllBytes(stampPath(version)),
      StandardCharsets.UTF_8).trim.toLong).toOption

  /** Retained committed versions with their commit stamps — the snapshot
    * listing a reproducible run chooses from. */
  def chunkVersionInfo: Seq[(Int, Option[Long])] =
    chunkVersions.map(v => v -> commitStampOf(v))

  /** Latest retained version committed AT OR BEFORE `tsMillis` —
    * Delta-style TIMESTAMP AS OF resolution. Unstamped (pre-feature)
    * versions can't participate; None when nothing retained qualifies.
    * Stamps are monotone in the version order (clamped at write), so
    * "latest stamp ≤ ts" and "largest qualifying version" agree. */
  def chunkVersionAt(tsMillis: Long): Option[Int] =
    chunkVersionInfo.collect { case (v, Some(ts)) if ts <= tsMillis => v }
      .maxOption

  /** Read the chunk table AS OF a wall-clock instant (see
    * [[chunkVersionAt]]); same contract as [[readChunksAt]] — a
    * resolution inside the LIVE version's window observes that
    * version's later appends too, exactly as pinning the live id does.
    * Throws when no retained version was committed at or before the
    * instant. */
  def readChunksAtTime(tsMillis: Long): DataFrame =
    readChunksAt(chunkVersionAt(tsMillis).getOrElse(
      throw new IllegalArgumentException(
        s"no retained chunk version committed at or before $tsMillis " +
          s"(retained: ${chunkVersionInfo.map { case (v, ts) => s"v$v@${ts.getOrElse("unstamped")}" }.mkString(", ")})")))

  /** Append rows to the chunk table (same guardrail; no overwrite, so a
    * plan derived from the current table can safely feed it — the C4
    * summary re-index path). */
  def appendChunks(chunks: DataFrame): Unit = {
    val c = chunks.cache()
    try {
      // a micro-batch whose documents all chunk to nothing must be a
      // no-op: registering a dimension off head() would throw here and
      // kill the streaming query
      if (c.isEmpty) return
      // an append into a fresh workspace (streaming-first ingest) must
      // register the dimension exactly like the first batch write
      val dim = registeredDim.getOrElse {
        val d = c.select(size(col("embedding"))).head().getInt(0)
        setMeta("model_dim", d.toString)
        d
      }
      val bad = ChunkStore.checkDim(c, dim)
      require(bad == 0, s"dimension guardrail: $bad rows with embedding length != $dim")
      // streaming-first ingest into a fresh workspace creates v1; the
      // pointer registers so later writes version past it. A LEGACY
      // (pre-versioning) table keeps appending into its unversioned dir
      // — registering v1 here would strand the legacy rows invisibly
      if (currentVersion("chunks_v").isEmpty && !legacyChunkLayout)
        setMeta("chunks_v", "1")
      c.write.mode(SaveMode.Append).parquet(chunksPath)
      graft.functions.Staging.invalidate(root)
    } finally c.unpersist()
  }

  // ---- A6: retrieval-log sink (append-only observability table),
  // partitioned by a 64-way query-hash bucket so the per-query stability
  // lookup (D9) prunes to one partition instead of scanning the log

  def appendLog(rows: DataFrame): Unit =
    rows
      .withColumn("query_bucket",
        pmod(graft.functions.F.hash60(col("query")), lit(TokenIndex.DefaultBuckets)))
      .write.partitionBy("query_bucket").mode(SaveMode.Append).parquet(logPath)

  def readLog(): DataFrame = spark.read.parquet(logPath)

  def hasLog: Boolean = Files.exists(Paths.get(logPath))

  // ---- D4 scale path: the posting-list inverted index, maintained by the
  // same jobs that write the chunk table (TokenIndex is the FTS5 mirror,
  // vector_store.cpp:195-201)
  //
  // Index writes are VERSIONED (v1, v2, … under the index dir, pointer in
  // the metadata KV): a SaveMode.Overwrite of the live dir would delete
  // part files out from under a concurrently-running search (the
  // streaming-ingest foreachBatch rebuilds indexes on its own thread).
  // The writer creates v(n+1), moves the pointer, and deletes versions
  // older than [[Workspace.RetainPriorVersions]] rebuild cycles — an
  // in-flight reader of v(n) keeps its files for that many full cycles
  // of wall-clock (NOT reader-lifetime leases: a query outliving two
  // complete rebuilds still loses its files; at cluster scale the
  // catalog's snapshot-expiry policy takes this job). This is the
  // atomic-swap layout every mutable-index-on-immutable-files store uses.

  private def currentVersion(key: String): Option[Int] = getMeta(key).map(_.toInt)

  def writePostings(postings: DataFrame): Unit = {
    val next = currentVersion("postings_v").getOrElse(0) + 1
    TokenIndex.write(postings, p("postings", s"v$next"))
    setMeta("postings_v", next.toString)
    deleteTree(Paths.get(p("postings", s"v${next - 1 - Workspace.RetainPriorVersions}")))
  }

  /** O(batch) posting maintenance: append a batch's posting rows into the
    * LIVE version's token buckets. Sound because the chunk table is
    * append-only with fresh ids — a new chunk contributes strictly new
    * (token, chunk_id) rows, so no existing posting row ever needs a
    * rewrite, and concurrent readers only ever see a consistent prefix
    * (parquet appends add files; they never delete or mutate). A caller
    * replacing existing chunks must use [[writePostings]] (full rebuild)
    * instead. */
  def appendPostings(postings: DataFrame): Unit = {
    require(hasPostings, "appendPostings needs an existing posting index (writePostings first)")
    TokenIndex.append(postings, postingsPath)
  }

  def postingsPath: String =
    p("postings", s"v${currentVersion("postings_v").getOrElse(0)}")

  def readPostings(): DataFrame = spark.read.parquet(postingsPath)

  def hasPostings: Boolean =
    currentVersion("postings_v").isDefined && Files.exists(Paths.get(postingsPath))

  // ---- D2 scale path: the IVF cell index — (id, embedding, cid) vectors
  // PARTITIONED BY cid (a probe's `cid IN (...)` filter prunes at the
  // scan, reading nprobe/k of the corpus) plus the trained centroids
  // (k·d doubles — driver-sized by construction)

  def annVectorsPath: String =
    p("ann", s"v${currentVersion("ann_v").getOrElse(0)}", "vectors")
  def annCentroidsPath: String =
    p("ann", s"v${currentVersion("ann_v").getOrElse(0)}", "centroids")
  def annPqCodebookPath: String =
    p("ann", s"v${currentVersion("ann_v").getOrElse(0)}", "pq_codebook")

  /** Versioned like writePostings: v(n+1) written, pointer moved, versions
    * older than the retention window dropped — a concurrent probe on v(n)
    * keeps its files for [[Workspace.RetainPriorVersions]] rebuild cycles.
    *
    * Alongside each vector the layout persists its quantized serving
    * columns: by default SQ8 (`sq_code` int8 array + `sq_scale` +
    * `sq_norm`, FAISS-SQ8 shape, 4× fewer phase-1 scan bytes than
    * float32); with a `pqCodebook`, residual-PQ instead (`pq_code` 4-bit
    * codes + `pq_norm`, 8× fewer than SQ8 — the round-7 IVFADC serving
    * tier) plus the codebook itself, persisted next to the centroids so
    * appends encode against the FROZEN codebook — see
    * [[graft.search.IvfGenerator]]. */
  def writeAnn(vectors: DataFrame, centroids: Seq[Seq[Double]],
               pqCodebook: Option[Seq[Seq[Float]]] = None): Unit =
    commitAnnVersion(prepareAnnVersion(vectors, centroids, pqCodebook))

  // centroids BY NAME: the SQ8 default ignores them, and the eager form
  // charged every streaming micro-batch a centroids parquet read+collect
  // whose result was discarded
  private def quantized(vectors: DataFrame, centroids: => Seq[Seq[Double]],
                        pqCodebook: Option[Seq[Seq[Float]]]): DataFrame =
    pqCodebook match {
      case Some(cb) => graft.search.AnnIndex.withPq(vectors, centroids, cb)
      case None => graft.search.AnnIndex.withSq8(vectors)
    }

  /** Write an ANN index as a freshly-allocated next version WITHOUT moving
    * the live pointer — the background retrainer's first half (runs
    * outside the maintenance lock while micro-batches keep appending to
    * the LIVE version; [[commitAnnVersion]] swaps after catch-up). */
  private[graft] def prepareAnnVersion(vectors: DataFrame, centroids: Seq[Seq[Double]],
                                       pqCodebook: Option[Seq[Seq[Float]]] = None): Int = {
    val next = allocateVersion("ann_v", "ann_alloc_v")
    quantized(vectors, centroids, pqCodebook).write
      .partitionBy("cid").mode(SaveMode.Overwrite)
      .parquet(p("ann", s"v$next", "vectors"))
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cid", "centroid")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(p("ann", s"v$next", "centroids"))
    pqCodebook.foreach { cb =>
      cb.zipWithIndex.map { case (c, j) => (j, c) }.toDF("j", "c")
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(p("ann", s"v$next", "pq_codebook"))
    }
    next
  }

  /** Append assigned (id, embedding, cid) rows into a PREPARED ANN
    * version — the retrainer's catch-up for chunk rows appended after its
    * training snapshot. Runs before the pointer swap. Quantizes with the
    * version's own (frozen) codebook when it has one. */
  private[graft] def appendAnnToVersion(version: Int, assigned: DataFrame): Unit =
    quantized(assigned, centroidsAt(p("ann", s"v$version", "centroids")),
      pqCodebookAt(p("ann", s"v$version", "pq_codebook"))).write
      .partitionBy("cid").mode(SaveMode.Append)
      .parquet(p("ann", s"v$version", "vectors"))

  /** Swap the live ANN pointer to `version` and reset the drift baseline
    * to the committed row count; sweeps versions past the retention
    * window (numbers may skip — aborted preparations leave gaps). */
  private[graft] def commitAnnVersion(version: Int): Unit = {
    require(currentVersion("ann_v").getOrElse(0) < version,
      s"ANN version pointer may only advance (live=${currentVersion("ann_v")}, commit=$version)")
    // drift baseline for the incremental append path: how many vectors the
    // committed version holds (parquet metadata count — no data read)
    val baseN = spark.read.parquet(p("ann", s"v$version", "vectors")).count()
    setMeta("ann_v", version.toString)
    setMeta("ann_base_n", baseN.toString)
    setMeta("ann_appended_n", "0")
    versionNumbers("ann")
      .filter(_ < version - Workspace.RetainPriorVersions)
      .foreach(v => deleteTree(Paths.get(p("ann", s"v$v"))))
  }

  /** O(batch) ANN maintenance: append a batch's (id, embedding, cid) rows —
    * already assigned against the FROZEN centroids — into the live
    * version's cid= partitions, and advance the drift counter. Appends add
    * parquet files only, so concurrent probes stay consistent. The caller
    * owns the retrain decision via [[annDriftExceeded]]. */
  def appendAnn(assigned: DataFrame): Unit = {
    require(hasAnn, "appendAnn needs an existing ANN index (writeAnn first)")
    val batch = quantized(assigned, readAnnCentroids(), readPqCodebook())
      .localCheckpoint()
    try {
      val n = batch.count()
      if (n > 0) {
        batch.write.partitionBy("cid").mode(SaveMode.Append).parquet(annVectorsPath)
        // compound RMW under ONE lock hold: a getMeta+setMeta pair would
        // race a concurrent writeAnn's reset-to-0 (fresh retrain baseline)
        // and resurrect the stale counter — a spurious full retrain right
        // after the compaction that was meant to clear it
        updateMeta("ann_appended_n")(v => (v.map(_.toLong).getOrElse(0L) + n).toString)
      }
    } finally graft.functions.Checkpoints.release(batch)
  }

  /** Has the corpus drifted past the trained centroids' mandate? True once
    * more rows were appended than the centroids were trained over — the
    * retrain trigger for the incremental path (assignment against frozen
    * centroids stays CORRECT forever; only cell balance degrades). */
  def annDriftExceeded: Boolean = {
    val base = getMeta("ann_base_n").map(_.toLong).getOrElse(0L)
    val appended = getMeta("ann_appended_n").map(_.toLong).getOrElse(0L)
    base > 0 && appended > base
  }

  def readAnn(): DataFrame = spark.read.parquet(annVectorsPath)

  /** Vectors + centroids + codebook of ONE consistent ANN version: the
    * pointer is read ONCE and all three artifacts resolve against it, so
    * a background retrain committing between the reads can never pair
    * v(n) codes with the v(n+1) codebook (near-random ADC candidates,
    * silently). Returns None when no index is committed. */
  def readAnnSnapshot(): Option[(DataFrame, Seq[Seq[Double]], Option[Seq[Seq[Float]]])] =
    currentVersion("ann_v").flatMap { v =>
      val base = p("ann", s"v$v")
      if (!Files.exists(Paths.get(base, "vectors"))) None
      else Some((
        spark.read.parquet(s"$base/vectors"),
        centroidsAt(s"$base/centroids"),
        pqCodebookAt(s"$base/pq_codebook")))
    }

  private def centroidsAt(path: String): Seq[Seq[Double]] =
    spark.read.parquet(path)
      .orderBy(col("cid")).select(col("centroid")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq

  def readAnnCentroids(): Seq[Seq[Double]] = centroidsAt(annCentroidsPath)

  private def pqCodebookAt(path: String): Option[Seq[Seq[Float]]] =
    if (!Files.exists(Paths.get(path))) None
    else Some(spark.read.parquet(path)
      .orderBy(col("j")).select(col("c")).collect()
      .map(_.getSeq[Float](0).toSeq).toSeq)

  /** The live version's frozen residual-PQ codebook, when the index was
    * written under annQuant="pq" (absent under the SQ8 default). */
  def readPqCodebook(): Option[Seq[Seq[Float]]] = pqCodebookAt(annPqCodebookPath)

  def hasAnn: Boolean =
    currentVersion("ann_v").isDefined && Files.exists(Paths.get(annVectorsPath))

  /** Drop the ANN index (both vectors and centroids). Called whenever the
    * chunk table is rewritten by an engine NOT configured for ANN: the
    * old index would otherwise survive on disk and a later ivf-mode
    * engine would silently probe ids that no longer exist. */
  def clearAnn(): Unit = {
    deleteTree(Paths.get(p("ann")))
    removeMeta("ann_v", "ann_base_n", "ann_appended_n", "ann_alloc_v")
  }

  /** Recursive delete with the walk stream CLOSED (Files.walk holds a
    * directory handle until closed — a leak under repeated clears). */
  private def deleteTree(dir: Path): Unit =
    if (Files.exists(dir)) {
      val walk = Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally walk.close()
    }

  // ---- A7: metadata KV (JSON sidecar — the workspace_metadata table)
  //
  // Writers serialize read-modify-write through `metaLock` and publish via
  // write-temp-then-ATOMIC_MOVE, so a concurrent reader (a search thread
  // resolving hasPostings/ann_v while the streaming thread swaps an index
  // version) sees the old file or the new file, never a torn or empty one
  // — and two writer threads (index() vs the stream's foreachBatch) can't
  // lose a key via interleaved read-modify-write. The lock is JVM-wide per
  // workspace instance; cross-process coordination is the catalog's job at
  // cluster scale (the reference's analog is sqlite's file lock).

  private val metaLock = new Object

  private def writeAllMeta(m: Map[String, String]): Unit = {
    val json = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}")
    Files.createDirectories(metaPath.getParent)
    val tmp = Files.createTempFile(metaPath.getParent, ".workspace_metadata", ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, metaPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def setMeta(key: String, value: String): Unit = metaLock.synchronized {
    writeAllMeta(allMeta + (key -> value))
  }

  /** Multi-key write under ONE lock hold and ONE atomic file move — for
    * pointer flips that must be observed together (e.g. a full corpus
    * replace retiring the tombstone/deny pointers with the chunk
    * pointer: a crash can no longer land between them and leave the new
    * table masked by stale delete state). */
  def setMetaAll(kvs: Map[String, String]): Unit = metaLock.synchronized {
    if (kvs.nonEmpty) writeAllMeta(allMeta ++ kvs)
  }

  def removeMeta(keys: String*): Unit = metaLock.synchronized {
    if (Files.exists(metaPath)) writeAllMeta(allMeta -- keys)
  }

  /** Atomic read-modify-write of one key: the read and the write happen
    * under a single lock hold, so no concurrent setMeta/updateMeta can
    * interleave between them (getMeta-then-setMeta can). */
  def updateMeta(key: String)(f: Option[String] => String): Unit = metaLock.synchronized {
    writeAllMeta(allMeta + (key -> f(allMeta.get(key))))
  }

  def getMeta(key: String): Option[String] = allMeta.get(key)

  def registeredDim: Option[Int] = getMeta("model_dim").map(_.toInt)

  private def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def allMeta: Map[String, String] =
    if (!Files.exists(metaPath)) Map.empty
    else {
      val json = new String(Files.readAllBytes(metaPath), StandardCharsets.UTF_8)
      """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
        .findAllMatchIn(json)
        .map(m => unesc(m.group(1)) -> unesc(m.group(2)))
        .toMap
    }

  private def unesc(s: String): String = s.replace("\\\"", "\"").replace("\\\\", "\\")

  // ---- Tombstones: document-level deletes over immutable chunk files.
  // No reference analog — the reference can only clear the whole store
  // (vector_store.cpp:636-646); at 100 TB removing one document must not
  // rewrite anything. A delete appends the doc id to a tiny tombstone
  // SET (bounded by deletes since the last physical purge); every read
  // path serves the chunk table MINUS that set, and the purge itself
  // rides the next full compaction. The set swaps wholesale through the
  // chunk table's versioned-pointer discipline: writers prepare v{n+1}
  // and flip the pointer, so a concurrent reader holding v{n} keeps its
  // files until the retention walk passes it.

  def hasTombstones: Boolean = currentVersion("tombstones_v").exists(_ > 0)

  def readTombstones(): DataFrame = readIdSet("tombstones")

  /** Versioned-swap write of a doc-id SET table (tombstones and the
    * delete deny-list share the machinery): new version dir + atomic
    * pointer flip; old versions pruned past the retention walk. Returns
    * the written set's size (the caller's delta arithmetic then needs no
    * extra count job — the write materializes the frame anyway). */
  private def swapIdSet(kind: String, ids: DataFrame): Long = {
    val next = allocateVersion(s"${kind}_v", s"${kind}_alloc_v")
    val c = ids.select(col("doc_id").cast("string").as("doc_id")).distinct()
      .coalesce(1) // the set is doc-id-sized; one file keeps the read cheap
      .cache()
    val n = try {
      c.write.mode(SaveMode.Overwrite).parquet(p(kind, s"v$next"))
      c.count()
    } finally c.unpersist()
    // version pointer + set size in ONE atomic metadata move: the size
    // rides along so callers needing before/after deltas (undelete's
    // `lifted`) read metadata instead of paying a count job per call
    setMetaAll(Map(s"${kind}_v" -> next.toString, s"${kind}_n" -> n.toString))
    versionNumbers(kind)
      .filter(_ < next - Workspace.RetainPriorVersions)
      .foreach(v => deleteTree(Paths.get(p(kind, s"v$v"))))
    graft.functions.Staging.invalidate(root)
    n
  }

  private def readIdSet(kind: String): DataFrame =
    currentVersion(s"${kind}_v").filter(_ > 0) match {
      case Some(v) => spark.read.parquet(p(kind, s"v$v")).select(col("doc_id"))
      case None    => spark.range(0).select(col("id").cast("string").as("doc_id"))
    }

  /** Add doc ids to the tombstone set (Engine.deleteDocuments); returns
    * the set's NEW total size. */
  def addTombstones(ids: DataFrame): Long =
    swapIdSet("tombstones", readTombstones()
      .unionByName(ids.select(col("doc_id").cast("string").as("doc_id"))))

  /** Drop doc ids from the tombstone set — a re-ingested document
    * supersedes its tombstone (the delete-then-reinsert flow). An
    * emptied set drops the pointer too, so reads stop paying the
    * (no-op) anti-join. Returns the set's NEW total size (swapIdSet
    * already materializes it — callers needing the removed count pay
    * no extra count job). */
  def removeTombstones(ids: DataFrame): Long =
    if (hasTombstones) {
      val n = swapIdSet("tombstones", readTombstones().join(
        broadcast(ids.select(col("doc_id").cast("string").as("doc_id"))),
        Seq("doc_id"), "left_anti"))
      if (n == 0) clearTombstones()
      n
    } else 0L

  /** Reset after a physical purge (a full rewrite dropped the tombstoned
    * rows from every live file). Version dirs are pruned by the next
    * swap's retention walk, so an in-flight reader keeps its files. */
  def clearTombstones(): Unit = setMeta("tombstones_v", "0")

  /** Live tombstone-set size from metadata (recorded by every swap);
    * guarded by the version pointer so a pointer retired to 0 (full
    * replace, purge) never serves a stale size. Falls back to one count
    * for a legacy workspace whose set predates the size metadata. */
  def tombstoneCount: Long =
    if (!hasTombstones) 0L
    else getMeta("tombstones_n")
      .flatMap(s => scala.util.Try(s.toLong).toOption) // corrupt meta falls back to a count job, not a throw
      .getOrElse(readTombstones().count())

  /** `chunks` MINUS the tombstone set — the ONE filter definition every
    * read path applies (live reads, the engine's cached view, retrain
    * and compaction snapshots, pinned time-travel versions). The
    * tombstone side broadcasts (bounded by deletes since the last
    * purge); the corpus side stays scan-local, no shuffle. */
  def minusTombstones(chunks: DataFrame): DataFrame =
    if (hasTombstones)
      chunks.join(broadcast(readTombstones()), Seq("doc_id"), "left_anti")
    else chunks

  /** The chunk table MINUS tombstoned documents — the logical view every
    * read path serves between a delete and its purge. */
  def readLiveChunks(): DataFrame = minusTombstones(readChunks())

  // ---- Delete deny-list: doc ids whose deletion must survive the
  // tombstone purge. Tombstones reset when a compaction physically
  // drops the rows — but an at-least-once streaming REPLAY of an epoch
  // older than the purge could then re-ingest the deleted document with
  // no physical rows and no tombstone to stop it. The deny-list is the
  // durable record consulted ONLY by the ingest path (reads never pay
  // it): bounded by lifetime deletes (bare doc ids), cleared per id by
  // an explicit undelete, wholesale by a full index(). */

  def hasDenyDocs: Boolean = currentVersion("deny_docs_v").exists(_ > 0)

  def readDenyDocs(): DataFrame = readIdSet("deny_docs")

  def addDenyDocs(ids: DataFrame): Unit =
    swapIdSet("deny_docs", readDenyDocs()
      .unionByName(ids.select(col("doc_id").cast("string").as("doc_id"))))

  def removeDenyDocs(ids: DataFrame): Unit =
    if (hasDenyDocs) {
      val n = swapIdSet("deny_docs", readDenyDocs().join(
        broadcast(ids.select(col("doc_id").cast("string").as("doc_id"))),
        Seq("doc_id"), "left_anti"))
      if (n == 0) clearDenyDocs()
    }

  def clearDenyDocs(): Unit = setMeta("deny_docs_v", "0")

  // ---- Near-dup admission bitmap (Engine.dedupIngest): the Bloom
  // bitset over OCCUPIED MinHash band buckets, as packed long words.
  // Tiny (m/8 bytes) and rewritten wholesale per ingest batch through
  // the metadata file's atomic temp+move, so a reader never observes a
  // torn bitmap and a crash between the chunk append and this write
  // merely re-admits the batch on replay (the chunk probe then skips
  // the rows — idempotent).

  private def dedupBloomPath: Path = Paths.get(root, "dedup_bloom.bin")

  def hasDedupBloom: Boolean = Files.exists(dedupBloomPath)

  def readDedupBloom(): Option[Array[Long]] =
    if (!hasDedupBloom) None
    else {
      val bytes = Files.readAllBytes(dedupBloomPath)
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val words = new Array[Long](bytes.length / 8)
      buf.asLongBuffer().get(words)
      Some(words)
    }

  def writeDedupBloom(words: Array[Long]): Unit = {
    val buf = java.nio.ByteBuffer.allocate(words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.asLongBuffer().put(words)
    Files.createDirectories(dedupBloomPath.getParent)
    val tmp = Files.createTempFile(dedupBloomPath.getParent, ".dedup_bloom", ".tmp")
    Files.write(tmp, buf.array())
    Files.move(tmp, dedupBloomPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def clearDedupBloom(): Unit =
    if (hasDedupBloom) Files.delete(dedupBloomPath)

  // ---- A4: CSV export (vector_store.cpp:657-671)

  /** Reference-parity export writes ONE csv file (the reference emits a
    * single exportToCsv file); pass numFiles=0 to keep the table's natural
    * parallelism for bulk exports at scale. */
  def exportCsv(path: String, numFiles: Int = 1): Unit = {
    val base = readLiveChunks().select(col("id"), col("source_file"), col("text_chunk"))
    val shaped = if (numFiles > 0) base.coalesce(numFiles) else base
    shaped.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }

  // ---- A5: matrix export (texts + N×D float matrix, export_for_training.py)

  def exportMatrix(path: String): Unit =
    readLiveChunks()
      .select(col("id"), col("text_chunk"), col("embedding"))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** JSONL export — the LLM-training handoff format (one JSON object per
    * line: id, source, text, heading path). Deterministic layout: rows
    * sort by id WITHIN each output file; numFiles = 1 (the default)
    * yields one totally-ordered file, numFiles = 0 keeps the table's own
    * partitioning for corpus-scale exports (a 100 TB export must not
    * single-file through one task). */
  def exportJsonl(path: String, numFiles: Int = 1): Unit = {
    val base = readLiveChunks()
      .select(col("id"), col("doc_id"), col("source_file").as("source"),
        col("heading_path"), col("text_chunk").as("text"))
    val shaped =
      if (numFiles > 0) base.coalesce(numFiles).sortWithinPartitions("id")
      else base.sortWithinPartitions("id")
    shaped.write.mode(SaveMode.Overwrite).json(path)
  }

  // ---- D20: warmup; D21: count/clear

  def warmup(): Long = readChunks().cache().count()

  def count(): Long = readChunks().count()

  def clear(): Unit = {
    deleteTree(Paths.get(p("chunks")))
    deleteTree(Paths.get(p("postings")))
    deleteTree(Paths.get(p("ann")))
    deleteTree(Paths.get(p("tombstones")))
    deleteTree(Paths.get(p("deny_docs")))
    clearDedupBloom()
    // dropping the table also drops the dimension registration
    removeMeta("chunks_v", "chunks_alloc_v", "postings_v",
      "ann_v", "ann_alloc_v", "ann_base_n", "ann_appended_n", "model_dim",
      "tombstones_v", "tombstones_alloc_v", "deny_docs_v", "deny_docs_alloc_v")
    graft.functions.Staging.invalidate(root)
  }
}

object Workspace {
  /** How many PRIOR index versions survive each pointer swap (plus the
    * live one): an in-flight reader keeps its files for this many full
    * rebuild cycles of wall-clock. Two cycles covers a query spanning one
    * swap comfortably even under a continuous 200 ms trigger; a reader
    * slower than TWO complete rebuilds still loses its files — lease-based
    * reclamation is a catalog concern at cluster scale. */
  final val RetainPriorVersions = 2

  /** A8: discover workspaces = subdirectories holding a chunks table. */
  def discover(spark: SparkSession, appRoot: String): Seq[String] = {
    val root = Paths.get(appRoot)
    if (!Files.exists(root)) return Seq.empty
    Files.list(root).iterator().asScala
      .filter(d => Files.isDirectory(d) && Files.exists(d.resolve("chunks")))
      .map(_.getFileName.toString).toSeq.sorted
  }

  def open(spark: SparkSession, appRoot: String, name: String): Workspace =
    new Workspace(spark, s"$appRoot/$name")
}
