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
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-")
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

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos (driver parquet is TIMESTAMP(NANOS))
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

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

  /** Watermarked tumbling-window aggregation over an events stream — the
    * streaming form of q_event_window_agg (same plan shape; late data
    * beyond 10 minutes dropped by the watermark). */
  def windowedEventCounts(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .parquet(inputDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
