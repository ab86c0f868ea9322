package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The Spark-side plumbing — schema, partition-parallel batch processing,
  * fixed-shape feature output — is real and tested; the codec itself is a
  * deliberate STUB (this container ships no image/audio libraries): a
  * deterministic byte-level featurizer stands in where a real deployment
  * would call the decoder inside the same `mapPartitions` boundary. The
  * boundary is identical to the embedder's (SURVEY §2 C1): batched,
  * partition-local, no driver involvement.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, media_type: String,
                            payload: Array[Byte], meta_width: Int, meta_height: Int)

  final case class MediaFeatures(media_id: Long, features: Array[Float])

  /** Shape a documents-like table into a media table (payload = encoded
    * text bytes standing in for image bytes; at 100 TB this column is the
    * dominant storage and must stay binary + never be shuffled wholesale). */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(640)) + lit(1)).cast("int").as("meta_width"),
      (pmod(col("doc_id"), lit(480)) + lit(1)).cast("int").as("meta_height"))

  /** STUB decode: a real implementation decodes the image/audio payload
    * here (partition-local, one codec instance per partition). The stand-in
    * derives a deterministic 16-bin byte histogram, L1-normalized — same
    * output contract: fixed-shape float features per row. */
  def decodeToFeatures(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (payload == null || payload.isEmpty) return hist
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1f; i += 1 }
    val total = payload.length.toFloat
    var j = 0
    while (j < 16) { hist(j) /= total; j += 1 }
    hist
  }

  /** Feature extraction over the media table: mapPartitions so codec setup
    * amortizes per partition (the Scala analog of mapInPandas batches). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = media
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { rows =>
      // per-partition codec init would go here (expensive native handle)
      rows.map { case (id, payload) => MediaFeatures(id, decodeToFeatures(payload)) }
    }.toDF("media_id", "features")
  }

  /** Frame sampling: emit one row per fixed-stride window of the payload
    * (video → frames; audio → windows). Pure column ops — stays in
    * whole-stage codegen, no UDF. The signature slice is `substr` on the
    * BINARY payload — an O(frameBytes) `Arrays.copyOfRange`, NOT the
    * O(position) code-point scan STRING substr pays — so a full pass
    * over an L-byte payload costs O(L·frameBytes/stride), linear in L
    * (pinned by the 1 MB-payload linearity spec). The payload column is
    * only referenced between the Generate and the immediately following
    * Project (same codegen stage, no shuffle), so frames never carry
    * payload bytes past this operator. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(
      col("media_id"),
      col("payload"),
      posexplode(sequence(lit(1),
        greatest(length(col("payload")) - (frameBytes - 1), lit(1)), lit(stride))))
      .select(
        col("media_id"),
        col("pos").cast("long").as("frame_idx"),
        col("col").cast("long").as("byte_offset"),
        md5(expr(s"substr(payload, col, $frameBytes)")).as("frame_sig"))

  /** Resize metadata transform (stub: the codec call site; metadata math is
    * the real, testable part). */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(
      lit(maxDim.toDouble) / col("meta_width"),
      lit(maxDim.toDouble) / col("meta_height"),
      lit(1.0))
    media
      .withColumn("resized_width", ceil(col("meta_width") * scale).cast("int"))
      .withColumn("resized_height", ceil(col("meta_height") * scale).cast("int"))
  }
}
