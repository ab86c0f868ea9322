package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.embed.Embedder
import graft.ingest.TextChunker

/** Chunk-table construction + persistence (SURVEY §2 A3, §1.2).
  *
  * The chunk table is the engine's single fact table (embeddings v15,
  * vector_store.cpp:67-141). Scale layout: partition by workspace, sort
  * within files by (doc_id, chunk_idx) so the D13 context-window self-join
  * prunes to one file run; embeddings are fixed-width `array<float>` which
  * parquet encodes compactly.
  */
object ChunkStore {

  /** Numeric key for a (possibly non-numeric) doc id: unsigned decimal ids
    * of ≤18 digits (safely inside Long range) keep their value; everything
    * else — including negatives and overlong digit strings — hashes via
    * the portable 60-bit md5 prefix into [0, 9e12). One definition, two
    * forms (Scala + Column) with the SAME ^[0-9]{1,18}$ numeric gate, so
    * chunk rows and summary rows always agree for every doc id shape. */
  def docKey(docId: String): Long =
    if (docId != null && docId.length <= 18 && docId.nonEmpty && docId.forall(c => c >= '0' && c <= '9'))
      docId.toLong
    else {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(Option(docId).getOrElse("").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Math.floorMod(java.lang.Long.parseLong(hex, 16), 9000000000000L)
    }

  def docKeyCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c.rlike("^[0-9]{1,18}$"), c.cast("long"))
      .otherwise(pmod(conv(substring(md5(c), 1, 15), 16, 10).cast("long"), lit(9000000000000L)))

  /** Ingest a documents table (doc_id, text, source, …) into the chunk
    * schema: per-document chunking (sequential within doc, parallel across
    * docs) + embedding at the model boundary. */
  def buildChunks(docs: DataFrame, embedder: Embedder): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val emb = embedder
    // chunk+embed is the heaviest scan-local work in the engine; spread a
    // deficient-parallelism input (single-row-group parquet → 1-task scan)
    // across the cluster first. Identity on any real multi-split corpus.
    val chunked = graft.functions.F.fanout(docs
      .select(col("doc_id").cast("string"), col("text"), col("source")))
      .as[(String, String, String)]
      .flatMap { case (docId, text, source) =>
        // id = docKey·10⁶ + idx: collision-free for numeric ids up to
        // 999000 chunks/doc (the 999xxx band is reserved for summary rows)
        // and 9.2·10¹² docs; (doc_id, chunk_idx) remains the primary
        // composite identity (hashed string keys carry a documented
        // birthday-collision caveat at extreme corpus sizes).
        val key = ChunkStore.docKey(docId)
        TextChunker.chunk(if (text == null) "" else text).map { c =>
          require(c.chunkIdx < 999000, s"doc $docId exceeds chunk-index range")
          (key * 1000000L + c.chunkIdx, docId, source, c.chunkIdx,
            c.text, emb.embed(c.text), emb.modelSig, emb.dim, c.sentenceCount)
        }
      }
      .toDF("id", "doc_id", "source_file", "chunk_idx", "text_chunk",
        "embedding", "model_sig", "model_dim", "sentence_count")
    chunked
      .withColumn("page_num", lit(0))
      .withColumn("heading_path", col("source_file"))
      .withColumn("heading_level", lit(0))
      // deterministic synthetic chunk_type over the test corpus (the layout
      // chunker assigns real types for paged documents)
      .withColumn("chunk_type",
        element_at(array(lit("text"), lit("definition"), lit("list"), lit("example"), lit("summary")),
          (pmod(col("doc_id").cast("long") + col("chunk_idx"), lit(5)) + 1).cast("int")))
      .withColumn("list_type", lit(null).cast("string"))
      .withColumn("list_length", lit(0))
      .withColumn("boost_factor", lit(1.0f))
      // ingest time: recency starts at ~1.0 so the trust<=1.0 exploration
      // quarantine behaves like the reference's fresh inserts (D3/D11)
      .withColumn("created_at", current_timestamp())
  }

  /** Dimension guardrail (SURVEY §2 C3): reject rows whose embedding length
    * differs from the registered workspace dim — enforced at write time,
    * mirroring mainwindow.cpp:530-539. */
  def checkDim(chunks: DataFrame, registeredDim: Int): Long =
    chunks.filter(size(col("embedding")) =!= registeredDim).count()

  def write(chunks: DataFrame, path: String): Unit =
    chunks
      .repartition(col("doc_id"))
      .sortWithinPartitions(col("doc_id"), col("chunk_idx"))
      .write.mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
