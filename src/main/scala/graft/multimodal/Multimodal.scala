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

  /** The INTEGER stage of [[decodeToFeatures]] — everything before the
    * float normalization (round-9 task 6: the normalization is honestly
    * rows-only, but these integers replay exactly in SQL, so they carry
    * their own oracle, `mm_feature_extract_int`). Image path: width,
    * height, mean-RGB NUMERATORS (pixel-channel sums) and the 11-bin
    * luma-histogram COUNTS over the decoded pixels; byte fallback: the
    * 16-bin high-nibble COUNTS. `denom` is the L1 denominator (pixel
    * count / payload length).
    * @return (kind, width, height, sumR, sumG, sumB, bins, denom) */
  def decodeToIntFeatures(payload: Array[Byte])
      : (String, Int, Int, Long, Long, Long, Array[Long], Long) =
    graft.functions.MediaCodecs.readImage(payload) match {
      case Some(img) =>
        val px = graft.functions.MediaCodecs.rgb(img)
        val bins = new Array[Long](11)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < px.length) {
          val p = px(i)
          val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
          sr += r; sg += g; sb += b
          val luma = (299 * r + 587 * g + 114 * b) / 1000
          bins(math.min(luma * 11 / 256, 10)) += 1L
          i += 1
        }
        ("image", img.getWidth, img.getHeight, sr, sg, sb, bins, px.length.toLong)
      case None =>
        val bins = new Array[Long](16)
        val len = if (payload == null) 0L else payload.length.toLong
        var i = 0
        while (i < len) { bins((payload(i.toInt) & 0xff) >> 4) += 1L; i += 1 }
        ("bytes", 0, 0, 0L, 0L, 0L, bins, len)
    }

  /** Decode → fixed 16-float features. Image payloads (anything ImageIO
    * decodes: PNG/JPEG/GIF/BMP) take the REAL pixel path:
    * [w, h, meanR, meanG, meanB, 11-bin luma histogram (L1-normalized)].
    * Everything else — including codecs the JDK lacks — falls back to a
    * deterministic 16-bin byte histogram, L1-normalized. Same contract
    * either way: fixed-shape float features per row. The integer stage is
    * [[decodeToIntFeatures]]; the counts/sums here are all < 2^24, so
    * normalizing long integers is bit-identical to the float
    * accumulation this replaced. */
  def decodeToFeatures(payload: Array[Byte]): Array[Float] = {
    val (kind, w, h, sr, sg, sb, bins, denom) = decodeToIntFeatures(payload)
    val out = new Array[Float](16)
    if (denom == 0L) return out
    val n = denom.toFloat
    if (kind == "image") {
      out(0) = w.toFloat
      out(1) = h.toFloat
      out(2) = sr / n; out(3) = sg / n; out(4) = sb / n
      var j = 0
      while (j < 11) { out(5 + j) = bins(j) / n; j += 1 }
    } else {
      var j = 0
      while (j < 16) { out(j) = bins(j) / n; j += 1 }
    }
    out
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
