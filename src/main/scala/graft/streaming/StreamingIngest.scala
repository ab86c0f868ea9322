package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.embed.Embedder
import graft.ingest.TextChunker

/** Structured Streaming ingestion (SURVEY §1.5, §3.1 redesign).
  *
  * The reference ingests incrementally (chunks emitted per page while
  * extraction continues, pdf_processor.cpp:396-403); the Spark-native form
  * is a file-source stream: documents landing in a directory are chunked,
  * embedded and appended to the chunk table continuously. The per-document
  * transform is the same pure function as the batch path — one code path,
  * two execution modes.
  */
object StreamingIngest {

  /** The streaming file source requires a directory; testdata tables are
    * single files. Stage the file into a temp dir (driver-side, cheap). */
  def stageAsDir(filePath: String): String = {
    val dir = graft.util.TempRoot.dir("stream-")
    val src = java.nio.file.Paths.get(filePath)
    java.nio.file.Files.copy(src, dir.resolve(src.getFileName))
    dir.toString
  }

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming chunk+embed transform over a documents file-source. */
  def chunkStream(spark: SparkSession, inputDir: String, embedder: Embedder): DataFrame = {
    import spark.implicits._
    val e = embedder
    spark.readStream
      .schema(documentsSchema)
      .parquet(inputDir)
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .flatMap { case (docId, text, source) =>
        TextChunker.chunk(if (text == null) "" else text).map { c =>
          require(c.chunkIdx < 999000, s"doc $docId exceeds chunk-index range")
          (docId * 1000000L + c.chunkIdx, docId.toString, source, c.chunkIdx,
            c.text, e.embed(c.text), e.modelSig, e.dim)
        }
      }
      .toDF("id", "doc_id", "source_file", "chunk_idx", "text_chunk",
        "embedding", "model_sig", "model_dim")
  }

  /** Run the ingest stream into a parquet chunk table (checkpointed append —
    * exactly-once at the file-sink level). */
  def startIngest(spark: SparkSession, inputDir: String, outDir: String,
                  checkpointDir: String, embedder: Embedder): StreamingQuery =
    chunkStream(spark, inputDir, embedder)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming events source with `ts` normalized to a proper
    * TimestampType — the streaming twin of [[graft.queries.events]]. A
    * file stream needs an explicit schema, and the driver's physical form
    * has varied across testdata generations (TIMESTAMP(NANOS) → long
    * nanos under nanosAsLong; TIMESTAMP(MICROS) without a timezone →
    * TIMESTAMP_NTZ), so the schema is sniffed from the staged files with
    * one driver-side batch read and `ts` converted accordingly. */
  private def eventsStream(spark: SparkSession, inputDir: String): DataFrame = {
    val schema = spark.read.parquet(inputDir).schema
    val raw = spark.readStream.schema(schema).parquet(inputDir)
    schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Per-user session state for [[sessionStream]]: sessions emitted so
    * far (`counter`, = the 1-based ordinal numbering of q_sessionize) and
    * the currently open session, if any. */
  final case class SessState(counter: Long, open: Boolean,
                             startMs: Long, lastMs: Long, n: Long)

  /** Streaming sessionization via `flatMapGroupsWithState` — the
    * custom-state API for semantics no built-in operator expresses: a
    * 30-minute-gap session CLOSES (and emits) only when a later event of
    * the same user proves the gap, so emission is driven purely by data
    * arrival (NoTimeout; no watermark race in bounded runs). The staged
    * input carries one far-future sentinel event per user (event_id = −1)
    * that closes each user's final session without ever emitting itself —
    * at which point the bounded stream's output equals batch
    * sessionization exactly (the q_sessionize oracle). */
  def sessionStream(spark: SparkSession, inputDir: String,
                    gapMs: Long = 1800000): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val events = eventsStream(spark, inputDir)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
      .as[(Long, Long, Long)]
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessState, (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, Long)], state: GroupState[SessState]) =>
          // a group's batch rows arrive unsorted; order by (ms, event_id)
          // so the fold below is deterministic however the files batch
          val evs = rows.map(r => (r._3, r._2)).toSeq.sortBy(identity)
          var st = state.getOption.getOrElse(SessState(0L, open = false, 0L, 0L, 0L))
          val out = Seq.newBuilder[(Long, Long, Long, Long)]
          def close(): Unit = if (st.open) {
            out += ((userId, st.counter + 1, st.n, st.lastMs - st.startMs))
            st = SessState(st.counter + 1, open = false, 0L, 0L, 0L)
          }
          evs.foreach { case (ms, eventId) =>
            val sentinel = eventId < 0
            if (st.open && !sentinel && ms - st.lastMs <= gapMs)
              st = st.copy(lastMs = ms, n = st.n + 1)
            else {
              close()
              if (!sentinel) st = st.copy(open = true, startMs = ms, lastMs = ms, n = 1L)
            }
          }
          state.update(st)
          out.result().iterator
      }
      .toDF("user_id", "session_id", "n", "dur_ms")
  }

  /** Stage the events table as a stream-source dir PLUS one sentinel event
    * per user at max(ts)+1h (event_id = −1): ≥ 1h after every user's last
    * real event, so it closes each final session (see [[sessionStream]]). */
  def stageEventsWithSentinels(spark: SparkSession, eventsParquet: String): String = {
    val dir = stageAsDir(eventsParquet)
    val ev = spark.read.parquet(eventsParquet)
    // the sentinel file is read by the SAME stream source as the real
    // file, so its ts must carry the source's physical type: +1h in raw
    // nanos for the long form, +INTERVAL for the timestamp forms. The
    // one-row max rides along as a broadcast cross join (type-preserving,
    // no driver literal to re-encode).
    val maxPlus1h = ev.schema("ts").dataType match {
      case LongType => max(col("ts")) + 3600L * 1000 * 1000 * 1000
      case _ => max(col("ts")) + expr("INTERVAL 1 HOUR")
    }
    val sentinels = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(ev.agg(maxPlus1h.as("ts"))))
      .select(
        lit(-1L).as("event_id"),
        col("ts"),
        col("user_id"),
        lit("sentinel").as("event_type"),
        lit(0.0).as("value"),
        lit(null).cast("string").as("props"))
    val tmp = graft.util.TempRoot.dir("sentinel-")
    sentinels.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).iterator()
    while (part.hasNext) {
      val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet"))
        java.nio.file.Files.copy(p, java.nio.file.Paths.get(dir, "zz_sentinel.parquet"))
    }
    dir
  }

  /** Stream-static enrichment: a streaming events source joined to a
    * static customer dimension (broadcast — the dimension is small and the
    * stream side never shuffles for the join), aggregated per market
    * segment. The standard streaming-ETL enrich shape: at 100 TB/day the
    * stream is unbounded but the dimension still broadcasts. `value` is
    * quantized to cents PER ROW before the sum so the running aggregate is
    * exact integers (order-free, restart-safe). */
  def enrichStream(spark: SparkSession, inputDir: String,
                   customers: DataFrame): DataFrame =
    eventsStream(spark, inputDir)
      .join(broadcast(customers), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("value_cents"))

  /** Stream-stream time-range self-join: clicks matched to the same
    * user's views from the preceding 30 minutes. Both sides carry
    * watermarks (bounding the buffered state to the range + slack — the
    * thing that makes an unbounded double-stream join feasible at all);
    * an INNER join emits on match, so a bounded run emits exactly the
    * batch join's rows. */
  def clickViewStream(spark: SparkSession, inputDir: String): DataFrame = {
    val ev = eventsStream(spark, inputDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"), col("ts").as("cts"))
      .withWatermark("cts", "1 hour")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("event_id").as("view_id"), col("ts").as("vts"))
      .withWatermark("vts", "1 hour")
    clicks.join(views,
        expr("cu = vu AND vts BETWEEN cts - INTERVAL 30 MINUTES AND cts"))
      .select(col("click_id"), col("view_id"),
        (unix_millis(col("cts")) - unix_millis(col("vts"))).as("lag_ms"))
  }

  /** Streaming exact dedup: md5 of normalized text, first arrival wins —
    * Structured Streaming keeps the seen-keys state so a continuously
    * arriving corpus emits each distinct document once (the streaming twin
    * of `dedup_exact`). A production stream bounds the state with
    * `dropDuplicatesWithinWatermark`; the bounded harness run needs no
    * watermark. */
  def dedupStream(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream
      .schema(documentsSchema)
      .parquet(inputDir)
      .select(md5(lower(trim(col("text")))).as("text_md5"))
      .dropDuplicates("text_md5")

  /** Streaming dedup with BOUNDED state: duplicates are only tracked
    * within the event-time watermark, so the seen-keys state is evicted as
    * the watermark advances — the shape that survives an unbounded stream
    * (dedupStream's global state grows with distinct keys forever). Input
    * rows are replicated 3× to make the dedup observable; duplicates of
    * one event share its event-time, i.e. are always inside the 10-minute
    * delay, where dropDuplicatesWithinWatermark GUARANTEES single
    * emission. */
  def dedupWithinWatermarkStream(spark: SparkSession, inputDir: String): DataFrame =
    eventsStream(spark, inputDir)
      .select(col("event_id"), col("ts"), explode(array(lit(1), lit(2), lit(3))).as("copy"))
      .drop("copy")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-bucket state of [[nearDupStream]]: the smallest doc id this LSH
    * band bucket has seen so far — one long per occupied bucket, the
    * whole state an online near-dup filter needs. */
  final case class BucketMin(min: Long)

  /** Streaming NEAR-dup filtering — online MinHash-LSH dedup, the
    * streaming twin of dedup_minhash_lsh: each arriving document is
    * banded with the SAME DedupPipeline signature pipeline, and each of
    * its band buckets reports whether an earlier document already
    * occupies it. A document is kept iff ALL its buckets are fresh — the
    * first-in-bucket-wins contract a production ingest filter applies
    * before paying embedding/indexing cost for a near-duplicate.
    *
    * Emits one (doc_id, band, dup) row per band; the caller aggregates
    * kept = (no dup band). State is BOUNDED: one long per occupied
    * bucket, ≤ Bands·distinct-bkeys regardless of stream length.
    * "Earlier" is by doc id: batches process their bucket groups in
    * ascending id order, so a bounded run over id-ordered arrivals (a
    * log-structured source with monotonic ids — batch boundaries may
    * fall anywhere) emits exactly the batch oracle's verdicts; under
    * out-of-order arrival the filter is still a correct
    * first-ARRIVAL-wins dedup, just keyed by arrival rather than id. */
  def nearDupStream(spark: SparkSession, inputDir: String,
                    maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val reader = spark.readStream.schema(documentsSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toLong))
    val sets = reader
      .parquet(inputDir)
      .select(col("doc_id"),
        array_distinct(graft.functions.F.tokens(col("text"))).as("toks"))
      // a token-less doc has no signature (its minhash entries are null):
      // it can't collide with anything, so it bypasses the filter — and
      // excluding it keeps bucket keys non-null in both engines (SQL
      // equi-joins drop null keys; the stream's state map would not)
      .filter(size(col("toks")) > 0)
    val bands = graft.dedup.DedupPipeline.bandBuckets(sets, "doc_id", "toks")
      .select(col("band"), col("bkey"), col("doc_id"))
      .as[(Int, String, Long)]
    bands.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[BucketMin, (Long, Int, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: (Int, String), rows: Iterator[(Int, String, Long)],
         state: GroupState[BucketMin]) =>
          val ids = rows.map(_._3).toSeq.sorted
          var mn = state.getOption.map(_.min).getOrElse(Long.MaxValue)
          val out = ids.map { id =>
            val dup = id > mn || (id == mn && state.exists)
            mn = math.min(mn, id)
            (id, bucket._1, dup)
          }
          state.update(BucketMin(mn))
          out.iterator
      }
      .toDF("doc_id", "band", "dup")
  }

  /** Per-source state of [[sourceQuotaStream]]: tokens seen so far — one
    * long per source, the whole state quota admission needs. */
  final case class QuotaUsed(used: Long)

  /** Streaming per-source token-quota admission — the anti-domination
    * gate a production ingest stream runs in front of the corpus: each
    * source (domain/crawl/feed) may contribute at most `budget` tokens,
    * and a document is admitted iff its source's running token total
    * (in doc id order) still fits. The streaming complement of
    * [[nearDupStream]]: that filter rejects REDUNDANT documents, this
    * one caps OVER-REPRESENTED sources — together they are the two
    * admission controls that keep a continuously-crawled mixture from
    * skewing. State is one long per source (≤ |sources| regardless of
    * stream length); per-wave work is O(batch). Same arrival contract
    * as nearDupStream: batches process each source's rows in ascending
    * doc id order, so a bounded id-ordered run emits exactly the batch
    * prefix-cumsum verdicts (the registered oracle); under out-of-order
    * arrival it is still a correct first-arrival-wins quota. */
  def sourceQuotaStream(spark: SparkSession, inputDir: String, budget: Long,
                        maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val reader = spark.readStream.schema(documentsSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toLong))
    val docs = reader.parquet(inputDir)
      .select(col("doc_id"), col("source"),
        size(graft.functions.F.tokens(col("text"))).cast("long").as("n_tokens"))
      .as[(Long, String, Long)]
    docs.groupByKey(_._2)
      .flatMapGroupsWithState[QuotaUsed, (Long, String, Long, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[(Long, String, Long)],
         state: GroupState[QuotaUsed]) =>
          val evs = rows.toSeq.sortBy(_._1)
          var used = state.getOption.map(_.used).getOrElse(0L)
          val out = evs.map { case (id, _, n) =>
            used += n
            (id, source, n, used <= budget)
          }
          state.update(QuotaUsed(used))
          out.iterator
      }
      .toDF("doc_id", "source", "n_tokens", "admitted")
  }

  /** Streaming value histogram — the incremental form of
    * sketch_quantile_hist: per-(event_type, bin) counts over a FIXED
    * 1024-bin integer-cent domain (a streaming histogram fixes its bin
    * edges a priori — a data-dependent min/max would need a second
    * pass the stream can't make). State is BOUNDED by construction:
    * ≤ event_types × 1024 groups regardless of stream length, and
    * partial histograms merge by addition — the mergeable-sketch
    * property that makes this the 100 TB/continuous shape. */
  def histogramStream(spark: SparkSession, inputDir: String): DataFrame =
    eventsStream(spark, inputDir)
      .select(col("event_type"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      // bin width 1024 cents is FIXED — the 1023 clamp ceiling and the
      // registered oracle's `// 1024` encode the same constant, so a
      // width knob here would be a silent parity trap. Clamp BEFORE
      // comparing engines: div truncates toward zero in Spark but
      // floors in DuckDB — both land on 0 once clamped
      .groupBy(col("event_type"),
        least(lit(1023L), greatest(lit(0L), expr("cents div 1024"))).as("bin"))
      .agg(count(lit(1)).as("n"))

  /** Per-bucket state of [[seqPackStream]]: tokens packed so far — the
    * single long that places every future document in its bucket's
    * 512-token sequence stream. */
  final case class PackCum(cum: Long)

  /** Streaming sequence packing — the incremental form of
    * text_seq_pack's concat-and-chop layout: each arriving document is
    * routed to its hash bucket and takes the next `n_tokens` slots of
    * that bucket's running 512-token sequence stream; the per-bucket
    * state is ONE long (tokens packed so far). The third admission-side
    * streaming operator next to nearDupStream (redundancy) and
    * sourceQuotaStream (over-representation): together they let a
    * continuous crawl emit TRAINING-READY packed sequences without ever
    * re-scanning the corpus. Parallelism ∝ buckets (Packing.Buckets),
    * ids globally unique via the 2⁴⁰ stride. Same arrival contract as
    * the other two: batches process each bucket's rows in ascending
    * doc_id order, so a bounded id-ordered run emits exactly the batch
    * pack layout (the registered oracle = text_seq_pack's SQL). */
  def seqPackStream(spark: SparkSession, inputDir: String,
                    maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    import graft.functions.F
    import graft.queries.Packing
    val reader = spark.readStream.schema(documentsSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toLong))
    val docs = reader.parquet(inputDir)
      .select(col("doc_id"),
        size(F.tokens(col("text"))).cast("long").as("n_tokens"),
        pmod(F.hash60(concat(col("doc_id").cast("string"), lit(":pack"))),
          lit(Packing.Buckets.toLong)).as("bucket"))
      .as[(Long, Long, Long)]
    docs.groupByKey(_._3)
      .flatMapGroupsWithState[PackCum, (Long, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[PackCum]) =>
          val evs = rows.toSeq.sortBy(_._1)
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = evs.map { case (id, n, _) =>
            val r = (id, bucket,
              bucket * Packing.SeqIdStride + cum / Packing.SeqLen,
              cum % Packing.SeqLen, n)
            cum += n
            r
          }
          state.update(PackCum(cum))
          out.iterator
      }
      .toDF("doc_id", "bucket", "seq_id", "seq_off", "n_tokens")
  }

  /** Streaming HLL register maintenance — the incremental form of
    * sketch_hll_distinct's register table: each arriving document's
    * 5-gram hashes update a 1024-register max-rho state via a plain
    * streaming groupBy (max is the mergeable-sketch operation, so
    * partial states merge associatively across micro-batches and
    * executors alike). State is BOUNDED by construction at 1024 rows
    * however long the stream runs — the distinct-count sketch a
    * continuous ingest keeps warm so "how many unique shingles so far"
    * never needs a corpus rescan. Bounded run ≡ the batch register
    * table, which is the exact oracle (the estimator composition over
    * these registers is pinned by sketch_hll_distinct). */
  def hllRegisterStream(spark: SparkSession, inputDir: String,
                        maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import graft.functions.F
    val reader = spark.readStream.schema(documentsSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toLong))
    reader.parquet(inputDir)
      .select(explode(F.shingles(F.tokens(col("text")), 5)).as("g"))
      .select(F.hash60(col("g")).as("h"))
      .select(graft.queries.Hll.bucketCol, graft.queries.Hll.rhoCol.cast("long").as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("mx"))
  }

  /** Count-Min sketch cells maintained as streaming state — the
    * frequency complement of [[hllRegisterStream]]'s distinct sketch.
    * Counter cells fold by ADDITION across micro-batches (counts are
    * associative), so state is bounded at CmsRows×CmsWidth rows for any
    * stream length; bucket arithmetic is graft.queries.ScaleQueries'
    * cmsRowBuckets — ONE definition shared with the batch build, so the
    * incremental and batch sketches can't drift. Bounded run ≡ the
    * batch cell table (the estimator over these cells is pinned by
    * sketch_cms_estimate). */
  def cmsCellStream(spark: SparkSession, inputDir: String,
                    maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import graft.functions.F
    val reader = spark.readStream.schema(documentsSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toLong))
    reader.parquet(inputDir)
      .select(explode(F.tokens(col("text"))).as("tok"))
      .select(explode(graft.queries.ScaleQueries.cmsRowBuckets(col("tok"))).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Watermarked tumbling-window aggregation over an events stream — the
    * streaming form of q_event_window_agg (same plan shape; late data
    * beyond 10 minutes dropped by the watermark). */
  def windowedEventCounts(spark: SparkSession, inputDir: String): DataFrame =
    eventsStream(spark, inputDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("win"), col("event_type"), col("n"), col("total"))

  /** Drive a bounded streaming query to completion into an in-memory table
    * and return the result (test/driver harness). */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
                  outputMode: String = "append"): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
