package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.embed.HashNgramEmbedder
import graft.multimodal.Multimodal
import graft.store.ChunkStore
import graft.streaming.StreamingIngest

class StreamMultimodalSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val embedder = HashNgramEmbedder(dim = 64)

  test("streaming ingest equals the batch ingest on the same input") {
    val stagedDir = StreamingIngest.stageAsDir(s"$sf/documents.parquet")
    val streamed = StreamingIngest.runToMemory(spark,
      StreamingIngest.chunkStream(spark, stagedDir, embedder), "spec_stream_ingest")
    val batch = ChunkStore.buildChunks(spark.read.parquet(s"$sf/documents.parquet"), embedder)
    assert(streamed.count() == batch.count())
    // same ids + same text lengths (one code path, two execution modes)
    val sIds = streamed.select("id").collect().map(_.getLong(0)).sorted
    val bIds = batch.select("id").collect().map(_.getLong(0)).sorted
    assert(sIds.sameElements(bIds))
  }

  test("streaming ingest to parquet sink is checkpointed and restartable") {
    val in = StreamingIngest.stageAsDir(s"$sf/documents.parquet")
    val out = Files.createTempDirectory("graft-chunks-").toString + "/chunks"
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString
    val q = StreamingIngest.startIngest(spark, in, out, ckpt, embedder)
    q.awaitTermination()
    val n1 = spark.read.parquet(out).count()
    assert(n1 > 0)
    // restart with no new files: exactly-once, no duplicates
    val q2 = StreamingIngest.startIngest(spark, in, out, ckpt, embedder)
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == n1)
  }

  test("streaming sessionization equals batch sessionize on the same events") {
    val staged = StreamingIngest.stageEventsWithSentinels(spark, s"$sf/events.parquet")
    val streamed = StreamingIngest.runToMemory(spark,
      StreamingIngest.sessionStream(spark, staged), "spec_stream_sess")
      .select("user_id", "session_id", "n", "dur_ms")
    val batch = graft.queries.ScaleQueries.all.find(_.name == "q_sessionize").get.fn(spark, sf)
      .select("user_id", "session_id", "n", "dur_ms")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming near-dup filter equals the batch min-per-bucket verdicts across micro-batches") {
    import org.apache.spark.sql.functions._
    // the batch twin: band every doc, a doc is dup iff ANY of its buckets
    // holds a smaller doc_id (first-in-bucket wins)
    val sets = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), array_distinct(graft.functions.F.tokens(col("text"))).as("toks"))
      .filter(size(col("toks")) > 0)
    val bands = graft.dedup.DedupPipeline.bandBuckets(sets, "doc_id", "toks")
    val mins = bands.groupBy("band", "bkey").agg(min(col("doc_id")).as("first_id"))
    val batch = bands.join(mins, Seq("band", "bkey"))
      .groupBy("doc_id")
      .agg(max(col("doc_id") > col("first_id")).as("is_dup"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(batch.values.exists(identity), "fixture should contain near-dups")

    // stage id-ordered halves as TWO files and force one file per
    // micro-batch: batch 2's dups are suppressed by batch 1's bucket
    // STATE, not by same-batch grouping
    val median = sets.agg(expr("cast(percentile_approx(doc_id, 0.5) as long)")).head().getLong(0)
    val dir = graft.util.TempRoot.dir("neardup-")
    spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") <= median)
      .coalesce(1).write.parquet(s"$dir/batch_a")
    spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") > median)
      .coalesce(1).write.parquet(s"$dir/batch_b")
    val staged = graft.util.TempRoot.dir("neardup-in-")
    def copyPart(sub: String, as: String): Unit = {
      val it = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/$sub")).iterator()
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.endsWith(".parquet"))
          java.nio.file.Files.copy(p, staged.resolve(as))
      }
    }
    copyPart("batch_a", "a.parquet")
    copyPart("batch_b", "b.parquet")
    // the file source orders micro-batches by modification time — equal
    // mtimes from back-to-back copies leave the order arbitrary, and the
    // id-ordered-arrival contract needs a strictly first
    java.nio.file.Files.setLastModifiedTime(staged.resolve("a.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 60000))
    val streamed = StreamingIngest.runToMemory(spark,
      StreamingIngest.nearDupStream(spark, staged.toString, maxFilesPerTrigger = Some(1)),
      "spec_stream_neardup")
      .groupBy("doc_id").agg(max(col("dup")).as("is_dup"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(streamed == batch)
  }

  test("streaming seq pack: bucket cum state carries across micro-batches, equals the batch layout") {
    import org.apache.spark.sql.functions._
    import graft.queries.Packing
    val t = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        size(graft.functions.F.tokens(col("text"))).cast("long").as("n"),
        pmod(graft.functions.F.hash60(concat(col("doc_id").cast("string"), lit(":pack"))),
          lit(Packing.Buckets.toLong)).as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val batch = t.withColumn("cum", coalesce(sum(col("n")).over(w), lit(0L)))
      .select(col("doc_id"), Packing.seqId(col("bucket"), col("cum")).as("seq_id"),
        (col("cum") % Packing.SeqLen).as("seq_off"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // two id-ordered files, one micro-batch each: batch-2 docs must pack
    // AFTER batch 1's token mass via the carried per-bucket cum
    val median = t.agg(expr("cast(percentile_approx(doc_id, 0.5) as long)")).head().getLong(0)
    val dir = graft.util.TempRoot.dir("pack-")
    spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") <= median)
      .coalesce(1).write.parquet(s"$dir/batch_a")
    spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") > median)
      .coalesce(1).write.parquet(s"$dir/batch_b")
    val staged = graft.util.TempRoot.dir("pack-in-")
    def copyPart(sub: String, as: String): Unit = {
      val it = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/$sub")).iterator()
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.endsWith(".parquet"))
          java.nio.file.Files.copy(p, staged.resolve(as))
      }
    }
    copyPart("batch_a", "a.parquet")
    copyPart("batch_b", "b.parquet")
    java.nio.file.Files.setLastModifiedTime(staged.resolve("a.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 60000))
    val streamed = StreamingIngest.runToMemory(spark,
      StreamingIngest.seqPackStream(spark, staged.toString, maxFilesPerTrigger = Some(1)),
      "spec_stream_pack")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(streamed == batch)
    // a batch-2 doc landing mid-sequence proves carried (not reset) cum
    assert(streamed.exists { case (id, (_, off)) => id > median && off != 0 })
  }

  test("streaming HLL registers: max-rho state merges across micro-batches, equals the batch sketch") {
    import org.apache.spark.sql.functions._
    val batch = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(graft.functions.F.shingles(graft.functions.F.tokens(col("text")), 5)).as("g"))
      .select(graft.functions.F.hash60(col("g")).as("h"))
      .select(pmod(col("h"), lit(1024L)).as("bucket"),
        (lit(51) - length(ltrim(bin(expr("h div 1024")), "0"))).cast("long").as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("mx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch.size > 900, s"corpus should populate most registers, got ${batch.size}")
    // two micro-batches: registers touched by both files must carry the
    // MAX across them, not the last batch's value
    val staged = StreamingIngest.stageAsDir(s"$sf/documents.parquet")
    val half = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 2 === 0)
    half.coalesce(1).write.parquet(s"$staged-b")
    val it = java.nio.file.Files.list(java.nio.file.Paths.get(s"$staged-b")).iterator()
    while (it.hasNext) {
      val p = it.next()
      if (p.getFileName.toString.endsWith(".parquet"))
        java.nio.file.Files.copy(p, java.nio.file.Paths.get(staged, "zz_half.parquet"))
    }
    val streamed = StreamingIngest.runToMemory(spark,
      StreamingIngest.hllRegisterStream(spark, staged, maxFilesPerTrigger = Some(1)),
      "spec_stream_hll", outputMode = "complete")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the duplicate half adds no new distinct hashes, so registers must
    // equal the single-copy batch sketch exactly
    assert(streamed == batch)
  }

  test("streaming CMS cells: counters ADD across micro-batches (duplicate half doubles its counts)") {
    import graft.queries.ScaleQueries
    // single-copy batch twin, built from the SHARED cmsRowBuckets definition
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      df.select(explode(graft.functions.F.tokens(col("text"))).as("tok"))
        .select(explode(ScaleQueries.cmsRowBuckets(col("tok"))).as("rb"))
        .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
        .agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val whole = cells(docs)
    val half = docs.filter(col("doc_id") % 2 === 0)
    val halfCells = cells(half)
    // stage docs + a duplicated half-file → ≥2 micro-batches at 1 file each
    val staged = StreamingIngest.stageAsDir(s"$sf/documents.parquet")
    half.coalesce(1).write.parquet(s"$staged-b")
    val it = java.nio.file.Files.list(java.nio.file.Paths.get(s"$staged-b")).iterator()
    while (it.hasNext) {
      val p = it.next()
      if (p.getFileName.toString.endsWith(".parquet"))
        java.nio.file.Files.copy(p, java.nio.file.Paths.get(staged, "zz_half.parquet"))
    }
    val streamed = StreamingIngest.runToMemory(spark,
      StreamingIngest.cmsCellStream(spark, staged, maxFilesPerTrigger = Some(1)),
      "spec_stream_cms", outputMode = "complete")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // unlike the HLL registers (max → duplicates invisible), CMS counters
    // are additive: the duplicated half contributes its counts AGAIN
    val expected = (whole.keySet ++ halfCells.keySet).map(k =>
      k -> (whole.getOrElse(k, 0L) + halfCells.getOrElse(k, 0L))).toMap
    assert(streamed == expected)
    // state stays within the sketch geometry whatever streamed through
    assert(streamed.size <= 4 * 256)
  }

  test("streaming source quota: budget state carries across micro-batches, equals batch cumsum") {
    import org.apache.spark.sql.functions._
    val budget = 800L
    // batch twin: per-source prefix cumsum in id order
    val t = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(graft.functions.F.tokens(col("text"))).cast("long").as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val batch = t.withColumn("cum", sum(col("n")).over(w))
      .select(col("doc_id"), (col("cum") <= budget).as("admitted"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(batch.values.exists(identity) && batch.values.exists(!_),
      "budget should split the corpus into admitted and rejected docs")

    // two id-ordered files, one micro-batch each: a source whose budget
    // is consumed in batch 1 must keep rejecting in batch 2 via STATE
    val median = t.agg(expr("cast(percentile_approx(doc_id, 0.5) as long)")).head().getLong(0)
    val dir = graft.util.TempRoot.dir("quota-")
    spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") <= median)
      .coalesce(1).write.parquet(s"$dir/batch_a")
    spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") > median)
      .coalesce(1).write.parquet(s"$dir/batch_b")
    val staged = graft.util.TempRoot.dir("quota-in-")
    def copyPart(sub: String, as: String): Unit = {
      val it = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/$sub")).iterator()
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.endsWith(".parquet"))
          java.nio.file.Files.copy(p, staged.resolve(as))
      }
    }
    copyPart("batch_a", "a.parquet")
    copyPart("batch_b", "b.parquet")
    java.nio.file.Files.setLastModifiedTime(staged.resolve("a.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 60000))
    val streamed = StreamingIngest.runToMemory(spark,
      StreamingIngest.sourceQuotaStream(spark, staged.toString, budget,
        maxFilesPerTrigger = Some(1)),
      "spec_stream_quota")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(streamed == batch)
    // and the second batch really contains rejections forced by batch-1 state
    assert(streamed.exists { case (id, adm) => id > median && !adm })
  }

  test("watermarked streaming dedup: 3x-replicated input emits once, state is watermark-bounded") {
    val staged = StreamingIngest.stageAsDir(s"$sf/events.parquet")
    val stream = StreamingIngest.dedupWithinWatermarkStream(spark, staged)
    // the bounded-state operator (not the unbounded dropDuplicates) must be
    // in the plan — this is what evicts seen keys as the watermark advances
    assert(stream.queryExecution.logical.toString.contains("DeduplicateWithinWatermark"),
      stream.queryExecution.logical.toString)
    val out = StreamingIngest.runToMemory(spark, stream, "spec_stream_dedup_wm")
    val n = spark.read.parquet(s"$sf/events.parquet").count()
    assert(out.count() == n, s"expected $n distinct events, got ${out.count()}")
    assert(out.select("event_id").distinct().count() == n)
  }

  test("media table: binary payload with typed metadata") {
    val media = Multimodal.asMediaTable(spark.read.parquet(s"$sf/documents.parquet"))
    val r = media.head()
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    assert(Seq("image", "audio", "video").contains(r.getAs[String]("media_type")))
  }

  test("feature extraction: fixed shape, normalized, deterministic") {
    val media = Multimodal.asMediaTable(spark.read.parquet(s"$sf/documents.parquet").limit(20))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 20)
    feats.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Float]]("features")
      assert(f.size == 16)
      assert(math.abs(f.map(_.toDouble).sum - 1.0) < 1e-4) // L1-normalized
    }
    // deterministic stub decode
    val a = Multimodal.decodeToFeatures("hello world".getBytes)
    val b = Multimodal.decodeToFeatures("hello world".getBytes)
    assert(a.sameElements(b))
  }

  test("frame sampling covers the payload with the configured stride") {
    val media = Multimodal.asMediaTable(spark.read.parquet(s"$sf/documents.parquet").limit(5))
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 16)
    val byDoc = frames.groupBy("media_id").agg(count(lit(1)).as("n"),
      max("byte_offset").as("maxOff")).collect()
    byDoc.foreach { r => assert(r.getAs[Long]("n") > 0) }
  }

  test("byte_window_sums: exact sums, partial trailing window dropped, null-safe") {
    import graft.functions.BlobFunctions.byteWindowSums
    import spark.implicits._
    val payload = Array.tabulate[Byte](10)(i => (i * 30).toByte) // wraps past 127 → unsigned read
    val df = Seq((1L, payload), (2L, Array.emptyByteArray), (3L, null: Array[Byte]))
      .toDF("id", "p")
      .select(col("id"), byteWindowSums(col("p"), 4).as("sums"))
    val rows = df.collect().sortBy(_.getLong(0))
    val s1 = rows(0).getAs[scala.collection.Seq[Long]]("sums")
    // windows of 4 over bytes [0,30,60,90, 120,150,180,210, 240,270→wrapped]
    val b = payload.map(_ & 0xff)
    assert(s1 == Seq(b.slice(0, 4).sum.toLong, b.slice(4, 8).sum.toLong)) // 10/4 = 2 full windows
    assert(rows(1).getAs[scala.collection.Seq[Long]]("sums").isEmpty)
    assert(rows(2).isNullAt(1))
  }

  test("byte_cdc_boundaries: rolling sum matches a naive per-position re-sum; edge shapes; null-safe") {
    import graft.functions.BlobFunctions.byteCdcBoundaries
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val payload = Array.fill[Byte](997)(rnd.nextInt(256).toByte) // odd length, wraps past 127
    val df = Seq(
      (1L, payload),
      (2L, Array.emptyByteArray),
      (3L, null: Array[Byte]),
      (4L, Array.fill[Byte](7)(0)),   // shorter than the window → no boundaries
      (5L, Array.fill[Byte](40)(0)))  // all-zero: EVERY j >= w-1 is a boundary (0 % m == 0)
      .toDF("id", "p")
      .select(col("id"), byteCdcBoundaries(col("p"), 16, 64).as("bd"))
    val rows = df.collect().sortBy(_.getLong(0))
    // oracle replay: naive windowed re-sum at every position
    val b = payload.map(_ & 0xff)
    val naive = (16 to b.length).filter(j => b.slice(j - 16, j).sum % 64 == 0)
    assert(rows(0).getAs[scala.collection.Seq[Int]]("bd") == naive)
    assert(naive.nonEmpty, "997 random bytes should hit at least one mod-64 boundary")
    assert(rows(1).getAs[scala.collection.Seq[Int]]("bd").isEmpty)
    assert(rows(2).isNullAt(1))
    assert(rows(3).getAs[scala.collection.Seq[Int]]("bd").isEmpty)
    assert(rows(4).getAs[scala.collection.Seq[Int]]("bd") == (16 to 40))
  }

  test("long-payload linearity: 1 MB doc VAD + fingerprint stay O(len) (byte-indexed)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.BlobFunctions.byteWindowSums
    // 1 MB ASCII payload. The pre-round-8 char-indexed shape
    // (ascii(substr(text, i*64+j+1, 1)) per character / md5(substring(
    // lower(text), i, 8)) per stride-4 offset) costs O(len²/window) —
    // ≈ 10⁹–10¹⁰ code-point scans for this one row, i.e. minutes. The
    // byte-indexed plan is one O(len) pass; a 15 s wall bound on the
    // warm run is therefore a robust linearity witness, not a flaky
    // micro-benchmark.
    val n = 1 << 20
    val sb = new StringBuilder(n)
    var i = 0
    while (i < n) { sb.append((32 + ((i * 131) % 95)).toChar); i += 1 }
    val text = sb.toString
    val docs = Seq((1L, text)).toDF("doc_id", "text")

    def vad(): Array[org.apache.spark.sql.Row] = docs
      .select(col("doc_id").as("media_id"),
        posexplode(byteWindowSums(encode(col("text"), "UTF-8"), 64)))
      .select(col("media_id"), col("pos").cast("long").as("i"), col("col").as("en"))
      .filter(col("en") >= 6050)
      .withColumn("run", col("i") - row_number().over(
        Window.partitionBy("media_id").orderBy("i")))
      .groupBy(col("media_id"), col("run"))
      .agg(min(col("i")).as("start_win"), count(lit(1)).as("n_win"), sum(col("en")).as("energy_sum"))
      .collect()

    def fingerprint(): String = docs
      .select(col("doc_id"), encode(lower(col("text")), "UTF-8").as("payload"))
      .select(col("doc_id"),
        expr("array_min(transform(sequence(1, greatest(length(payload) - 7, 1), 4), i -> md5(substr(payload, i, 8))))").as("fp"))
      .collect()(0).getString(1)

    def frames(): Long = Multimodal.sampleFrames(
      Multimodal.asMediaTable(docs), frameBytes = 32, stride = 16).count()

    vad(); fingerprint(); frames() // warm: codegen compile + class-load
    val t0 = System.nanoTime()
    val segs = vad()
    val fp = fingerprint()
    val nFrames = frames()
    val wallSec = (System.nanoTime() - t0) / 1e9
    assert(wallSec < 15.0, s"byte-indexed 1 MB doc took ${wallSec}s — quadratic shape regressed?")
    assert(nFrames == (n - 31 + 15) / 16) // ceil((len - frame + 1) / stride)

    // correctness on the big doc: window count + total energy vs a plain
    // Scala single pass over the same bytes
    val bytes = text.getBytes("UTF-8")
    val nWin = bytes.length / 64
    val expEnergies = Array.tabulate(nWin)(w => (w * 64 until w * 64 + 64).map(bytes(_) & 0xff).sum.toLong)
    val active = expEnergies.zipWithIndex.filter(_._1 >= 6050)
    assert(segs.map(_.getAs[Long]("n_win")).sum == active.length)
    assert(segs.map(_.getAs[Long]("energy_sum")).sum == active.map(_._1).sum)
    assert(fp.length == 32) // md5 hex

    // byte path ≡ char path (the old expression) on a modest doc, where
    // the quadratic shape is still affordable
    val small = Seq((7L, text.substring(0, 10000))).toDF("doc_id", "text")
    val charFp = small.select(
      expr("array_min(transform(sequence(1, greatest(length(lower(text)) - 7, 1), 4), i -> md5(substring(lower(text), i, 8))))"))
      .collect()(0).getString(0)
    val byteFp = small
      .select(encode(lower(col("text")), "UTF-8").as("payload"))
      .select(expr("array_min(transform(sequence(1, greatest(length(payload) - 7, 1), 4), i -> md5(substr(payload, i, 8))))"))
      .collect()(0).getString(0)
    assert(charFp == byteFp)
    val charEn = small.select(col("text"),
      explode(sequence(lit(0L), expr("cast(length(text) div 64 as bigint)") - 1)).as("i"))
      .select(expr("aggregate(transform(sequence(0, 63), j -> ascii(substr(text, cast(i * 64 + j + 1 as int), 1))), cast(0 as bigint), (s, v) -> s + v)").as("en"))
      .collect().map(_.getLong(0))
    val byteEn = small.select(posexplode(byteWindowSums(encode(col("text"), "UTF-8"), 64)))
      .collect().map(_.getLong(1))
    assert(charEn.sameElements(byteEn))
  }

  test("corpus ASCII invariant: byte-stripe oracles require octet_length == char_length") {
    // Several oracles (mm_feature_extract_int byte stripe, the large-payload
    // char-list CTEs, mm_frame_sample) compare DuckDB code-point ascii()/
    // char-offset arithmetic against the engine's UTF-8 byte values — exact
    // ONLY while documents.text is pure ASCII. A non-ASCII corpus would
    // desync the two sides SILENTLY (hash mismatch with no local failure);
    // this spec turns that into a loud, attributable break. Checked at all
    // three SFs the driver gates on.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .foreach { dir =>
        val nonAscii = spark.read.parquet(s"$dir/documents.parquet")
          .filter(expr("octet_length(text) != char_length(text)"))
          .count()
        assert(nonAscii == 0L,
          s"$dir/documents.parquet has $nonAscii non-ASCII docs; " +
            "byte-stripe oracles (mm_feature_extract_int, large-payload " +
            "char lists) assume byte==char offsets")
      }
  }

  test("resize metadata: aspect preserved, never upscales") {
    val media = Multimodal.asMediaTable(spark.read.parquet(s"$sf/documents.parquet"))
    val resized = Multimodal.resizeMeta(media, 256).collect()
    resized.foreach { r =>
      val (w, h) = (r.getAs[Int]("meta_width"), r.getAs[Int]("meta_height"))
      val (rw, rh) = (r.getAs[Int]("resized_width"), r.getAs[Int]("resized_height"))
      assert(rw <= 256 + 1 && rh <= 256 + 1)
      assert(rw <= w && rh <= h || (w <= 256 && h <= 256 && rw == w && rh == h))
    }
  }
}
