package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

import graft.functions.{ByteCdcBoundaries, ByteWindowSums, CosineSimilarity, DotProduct, Float32Decode, Float32Encode, ImageAhash, ImageDecodeStats, ImageResampleRgb, L2Norm, LenPrefixedSlices, PngEncodeRgb, PqEncode, SignLshBuckets, TopKBy, WavEncodePcm16, WavParse}

/** SparkSessionExtensions registration: makes the engine's Catalyst
  * expressions available to any session (including pure-SQL users) via
  * `spark.sql.extensions=graft.GraftExtensions` — the supported extension
  * point, no temp-function setup needed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(e: SparkSessionExtensions): Unit = {
    // Norm-precompute rewrite (SURVEY §4 upgrade 3): resolution-stage on
    // purpose — see the rule's scaladoc for why the optimizer stage is too
    // late (ColumnPruning has already dropped unreferenced norm columns).
    e.injectPostHocResolutionRule(_ => graft.plans.NormPrecomputeRewrite)
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float arrays"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("l2_norm"),
      info("l2_norm", "l2_norm(a) - L2 norm of a float array"),
      (es: Seq[Expression]) => L2Norm(es.head)))
    e.injectFunction((FunctionIdentifier("float32_decode"),
      info("float32_decode", "float32_decode(blob) - little-endian float32 blob to array<float>"),
      (es: Seq[Expression]) => Float32Decode(es.head)))
    e.injectFunction((FunctionIdentifier("float32_encode"),
      info("float32_encode", "float32_encode(arr) - array<float> to little-endian float32 blob"),
      (es: Seq[Expression]) => Float32Encode(es.head)))
    e.injectFunction((FunctionIdentifier("pq_encode"),
      info("pq_encode", "pq_encode(vec, codebook, subDim) - product-quantization codes per subspace"),
      (es: Seq[Expression]) => es(2) match {
        case Literal(s: Int, IntegerType) => PqEncode(es.head, es(1), s)
        case other => throw new IllegalArgumentException(
          s"pq_encode: subDim must be an integer literal, got $other")
      }))
    e.injectFunction((FunctionIdentifier("sign_lsh_buckets"),
      info("sign_lsh_buckets", "sign_lsh_buckets(vec, hyperplanes, tables) - all sign-LSH table buckets in one pass"),
      (es: Seq[Expression]) => es(2) match {
        case Literal(t: Int, IntegerType) => SignLshBuckets(es.head, es(1), t)
        case other => throw new IllegalArgumentException(
          s"sign_lsh_buckets: tables must be an integer literal, got $other")
      }))
    e.injectFunction((FunctionIdentifier("byte_window_sums"),
      info("byte_window_sums", "byte_window_sums(blob, window) - per-window unsigned-byte sums, one O(n) pass"),
      (es: Seq[Expression]) => es(1) match {
        case Literal(w: Int, IntegerType) => ByteWindowSums(es.head, w)
        case other => throw new IllegalArgumentException(
          s"byte_window_sums: window must be an integer literal, got $other")
      }))
    e.injectFunction((FunctionIdentifier("byte_cdc_boundaries"),
      info("byte_cdc_boundaries", "byte_cdc_boundaries(blob, window, modulus) - content-defined chunk boundaries (rolling window sum % modulus == 0), one O(n) pass"),
      (es: Seq[Expression]) => (es(1), es(2)) match {
        case (Literal(w: Int, IntegerType), Literal(m: Int, IntegerType)) =>
          ByteCdcBoundaries(es.head, w, m)
        case other => throw new IllegalArgumentException(
          s"byte_cdc_boundaries: window and modulus must be integer literals, got $other")
      }))
    e.injectFunction((FunctionIdentifier("png_encode_rgb"),
      info("png_encode_rgb", "png_encode_rgb(rgb_array, width, height) - encode row-major 0xRRGGBB ints as PNG bytes (JDK ImageIO)"),
      (es: Seq[Expression]) => (es(1), es(2)) match {
        case (Literal(w: Int, IntegerType), Literal(h: Int, IntegerType)) =>
          PngEncodeRgb(es.head, w, h)
        case other => throw new IllegalArgumentException(
          s"png_encode_rgb: width and height must be integer literals, got $other")
      }))
    e.injectFunction((FunctionIdentifier("image_decode_stats"),
      info("image_decode_stats", "image_decode_stats(blob) - decode PNG/JPEG/GIF/BMP once and report struct(width, height, sum_r, sum_g, sum_b, ahash)"),
      (es: Seq[Expression]) => ImageDecodeStats(es.head)))
    e.injectFunction((FunctionIdentifier("image_ahash"),
      info("image_ahash", "image_ahash(blob, grid_w, grid_h) - average-hash bits over a decoded image (nearest-neighbor grid, integer luma)"),
      (es: Seq[Expression]) => (es(1), es(2)) match {
        case (Literal(w: Int, IntegerType), Literal(h: Int, IntegerType)) =>
          ImageAhash(es.head, w, h)
        case other => throw new IllegalArgumentException(
          s"image_ahash: grid dims must be integer literals, got $other")
      }))
    e.injectFunction((FunctionIdentifier("image_resample_rgb"),
      info("image_resample_rgb", "image_resample_rgb(blob, out_w, out_h) - decode and nearest-neighbor resample to out_w x out_h row-major 0xRRGGBB ints"),
      (es: Seq[Expression]) => (es(1), es(2)) match {
        case (Literal(w: Int, IntegerType), Literal(h: Int, IntegerType)) =>
          ImageResampleRgb(es.head, w, h)
        case other => throw new IllegalArgumentException(
          s"image_resample_rgb: dims must be integer literals, got $other")
      }))
    e.injectFunction((FunctionIdentifier("wav_encode_pcm16"),
      info("wav_encode_pcm16", "wav_encode_pcm16(samples, sample_rate) - mono PCM16 RIFF/WAVE bytes"),
      (es: Seq[Expression]) => WavEncodePcm16(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("len_prefixed_slices"),
      info("len_prefixed_slices", "len_prefixed_slices(blob) - split [4-byte BE length][record]... packed binary into array<binary>; null on corruption"),
      (es: Seq[Expression]) => LenPrefixedSlices(es.head)))
    e.injectFunction((FunctionIdentifier("wav_parse"),
      info("wav_parse", "wav_parse(blob) - RIFF/WAVE chunk walk; struct(sample_rate, channels, n_frames, sum_sq, peak) for PCM16"),
      (es: Seq[Expression]) => WavParse(es.head)))
    e.injectFunction((FunctionIdentifier("topk_by"),
      info("topk_by", "topk_by(payload, score, k) - exact per-group top-k (score desc, payload asc) with map-side partial reduction"),
      (es: Seq[Expression]) => es(2) match {
        case Literal(k: Int, IntegerType) => TopKBy(es.head, es(1), k)
        case other => throw new IllegalArgumentException(
          s"topk_by: k must be an integer literal, got $other")
      }))
  }
}
