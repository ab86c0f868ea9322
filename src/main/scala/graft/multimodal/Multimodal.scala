package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The decode is REAL for every codec the JDK ships: payloads that sniff
  * as ImageIO-decodable images (PNG/JPEG/GIF/BMP) are actually decoded
  * (headless `javax.imageio`, see [[graft.functions.MediaCodecs]]) and
  * featurized from pixels; RIFF/WAVE PCM16 audio has an exact chunk-walk
  * parser ([[graft.functions.WavParse]]). Only codecs absent from the
  * JDK (mp4/webp/opus) fall back to the deterministic byte-level
  * featurizer — same fixed-shape output contract, so a real native codec
  * drops into the identical `mapPartitions` boundary. The boundary
  * matches the embedder's (SURVEY §2 C1): batched, partition-local, no
  * driver involvement.
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

  /** Decode → fixed 16-float features. Image payloads (anything ImageIO
    * decodes: PNG/JPEG/GIF/BMP) take the REAL pixel path:
    * [w, h, meanR, meanG, meanB, 11-bin luma histogram (L1-normalized)].
    * Everything else — including codecs the JDK lacks — falls back to a
    * deterministic 16-bin byte histogram, L1-normalized. Same contract
    * either way: fixed-shape float features per row. */
  def decodeToFeatures(payload: Array[Byte]): Array[Float] =
    graft.functions.MediaCodecs.readImage(payload) match {
      case Some(img) =>
        val out = new Array[Float](16)
        val px = graft.functions.MediaCodecs.rgb(img)
        val n = px.length.toFloat
        out(0) = img.getWidth.toFloat
        out(1) = img.getHeight.toFloat
        var i = 0
        while (i < px.length) {
          val p = px(i)
          val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
          out(2) += r; out(3) += g; out(4) += b
          val luma = (299 * r + 587 * g + 114 * b) / 1000
          out(5 + math.min(luma * 11 / 256, 10)) += 1f
          i += 1
        }
        var j = 2
        while (j < 5) { out(j) /= n; j += 1 }
        while (j < 16) { out(j) /= n; j += 1 }
        out
      case None =>
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

  /** Resize metadata transform (the metadata-math half; the PIXEL half is
    * real too — [[graft.functions.ImageResampleRgb]] decodes and
    * nearest-neighbor resamples through the actual codec, pinned
    * oracle-exact by mm_image_resize). */
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
