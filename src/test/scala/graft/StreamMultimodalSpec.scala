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
