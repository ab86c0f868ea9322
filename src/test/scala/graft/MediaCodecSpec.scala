package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ImageAhash, ImageDecodeStats, MediaCodecs, PngEncodeRgb, WavEncodePcm16, WavParse}
import graft.multimodal.Multimodal

/** The REAL JDK codec layer: PNG/JPEG/GIF/BMP via headless javax.imageio,
  * RIFF/WAVE PCM16 via the hand-rolled chunk walker. PNG and BMP are
  * lossless, so round-trips must be bit-exact; the WAV parser is
  * cross-validated against javax.sound's own writer. */
class MediaCodecSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val rnd = new scala.util.Random(11)
  private val W = 24; private val H = 16
  private val pixels: Array[Int] = Array.fill(W * H)(rnd.nextInt(1 << 24))

  private def pngBytes(px: Array[Int], w: Int, h: Int): Array[Byte] =
    PngEncodeRgb(Literal.create(new GenericArrayData(px), ArrayType(IntegerType)), w, h)
      .eval(null).asInstanceOf[Array[Byte]]

  test("png encode → decode stats round-trips pixel sums bit-exactly (lossless)") {
    val bytes = pngBytes(pixels, W, H)
    assert(bytes(0) == 0x89.toByte && bytes(1) == 'P', "PNG magic")
    assert(MediaCodecs.sniffsImage(bytes))
    val st = ImageDecodeStats(Literal.create(bytes, BinaryType))
      .eval(null).asInstanceOf[InternalRow]
    assert(st.getInt(0) == W && st.getInt(1) == H)
    assert(st.getLong(2) == pixels.map(p => (p >> 16) & 0xff).map(_.toLong).sum)
    assert(st.getLong(3) == pixels.map(p => (p >> 8) & 0xff).map(_.toLong).sum)
    assert(st.getLong(4) == pixels.map(p => p & 0xff).map(_.toLong).sum)
    // the ride-along ahash equals the standalone expression (one decode
    // serves both — the field exists so consumers never decode twice)
    assert(st.getLong(5) ==
      ImageAhash(Literal.create(bytes, BinaryType), 8, 8).eval(null).asInstanceOf[Long])
  }

  test("image_ahash matches a naive reimplementation on the decoded pixels") {
    val bytes = pngBytes(pixels, W, H)
    val got = ImageAhash(Literal.create(bytes, BinaryType), 8, 8)
      .eval(null).asInstanceOf[Long]
    val luma = (0 until 64).map { p =>
      val sx = (p % 8) * W / 8; val sy = (p / 8) * H / 8
      val c = pixels(sy * W + sx)
      (299L * ((c >> 16) & 0xff) + 587L * ((c >> 8) & 0xff) + 114L * (c & 0xff)) / 1000L
    }
    val mean = luma.sum / 64
    val want = (0 until 64).filter(p => luma(p) > mean)
      .foldLeft(0L)((acc, p) => acc | (1L << p))
    assert(got == want)
    assert(want != 0L, "fixture should set at least one bit")
  }

  test("bmp (lossless) decodes to the same exact sums; jpeg (lossy) to the same dims") {
    val img = new java.awt.image.BufferedImage(W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (p <- pixels.indices) img.setRGB(p % W, p / W, pixels(p))
    for ((fmt, exact) <- Seq("bmp" -> true, "jpg" -> false)) {
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), fmt)
      val bytes = out.toByteArray
      assert(MediaCodecs.sniffsImage(bytes), fmt)
      val st = ImageDecodeStats(Literal.create(bytes, BinaryType))
        .eval(null).asInstanceOf[InternalRow]
      assert(st.getInt(0) == W && st.getInt(1) == H, fmt)
      if (exact)
        assert(st.getLong(2) == pixels.map(p => (p >> 16) & 0xff).map(_.toLong).sum, fmt)
    }
  }

  test("image_resample_rgb: exact nearest-neighbor sampling, non-uniform ratios included") {
    import graft.functions.ImageResampleRgb
    val bytes = pngBytes(pixels, W, H)
    // 8×6 from 24×16: x maps uniformly (3·x2), y non-uniformly (16/6)
    val got = ImageResampleRgb(Literal.create(bytes, BinaryType), 8, 6)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
    val want = Array.tabulate(48) { p =>
      val sx = (p % 8) * W / 8; val sy = (p / 8) * H / 6
      pixels(sy * W + sx)
    }
    assert(got.sameElements(want))
    // identity resample reproduces the full pixel array
    val id = ImageResampleRgb(Literal.create(bytes, BinaryType), W, H)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
    assert(id.sameElements(pixels))
    assert(ImageResampleRgb(Literal.create(
      "not an image".getBytes("UTF-8"), BinaryType), 8, 6).eval(null) == null)
  }

  test("non-image payloads: sniff rejects, decode exprs yield null, wrong-size pixel array yields null") {
    val text = "just some text bytes, definitely not an image".getBytes("UTF-8")
    assert(!MediaCodecs.sniffsImage(text))
    assert(ImageDecodeStats(Literal.create(text, BinaryType)).eval(null) == null)
    assert(ImageAhash(Literal.create(text, BinaryType), 8, 8).eval(null) == null)
    assert(PngEncodeRgb(Literal.create(
      new GenericArrayData(Array(1, 2, 3)), ArrayType(IntegerType)), W, H).eval(null) == null)
  }

  private def wavBytes(samples: Array[Int], rate: Int): Array[Byte] =
    WavEncodePcm16(
      Literal.create(new GenericArrayData(samples), ArrayType(IntegerType)),
      Literal(rate)).eval(null).asInstanceOf[Array[Byte]]

  private def parse(bytes: Array[Byte]): InternalRow =
    WavParse(Literal.create(bytes, BinaryType)).eval(null).asInstanceOf[InternalRow]

  test("wav encode → parse round-trips header fields and exact signal stats") {
    val samples = Array.fill(400)(rnd.nextInt(65536) - 32768)
    val st = parse(wavBytes(samples, 16000))
    assert(st.getInt(0) == 16000 && st.getInt(1) == 1)
    assert(st.getLong(2) == 400L)
    assert(st.getLong(3) == samples.map(s => s.toLong * s).sum)
    assert(st.getInt(4) == samples.map(math.abs).max)
  }

  test("wav parser cross-validates against javax.sound's own writer") {
    val samples = Array.tabulate(256)(i => (math.sin(i / 8.0) * 20000).toInt)
    val pcm = java.nio.ByteBuffer.allocate(512)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(s => pcm.putShort(s.toShort))
    val fmt = new javax.sound.sampled.AudioFormat(11025f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm.array()), fmt, 256)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val st = parse(out.toByteArray)
    assert(st != null, "JDK-written WAV must parse")
    assert(st.getInt(0) == 11025 && st.getInt(1) == 1)
    assert(st.getLong(2) == 256L)
    assert(st.getLong(3) == samples.map(s => s.toLong * s).sum)
  }

  test("wav chunk walk: unknown chunks skipped, odd sizes padded, malformed/non-PCM16 rejected") {
    val samples = Array.tabulate(8)(i => i * 1000 - 3500)
    val plain = wavBytes(samples, 8000)
    // splice a 7-byte junk chunk (odd → 1 pad byte) between WAVE and fmt
    val junk = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    junk.put("LIST".getBytes("US-ASCII")).putInt(7)
      .put(Array.tabulate[Byte](7)(_.toByte)).put(0.toByte)
    val spliced = java.nio.ByteBuffer.allocate(plain.length + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    spliced.put(plain, 0, 12).put(junk.array()).put(plain, 12, plain.length - 12)
    // RIFF size field must cover the added chunk
    spliced.putInt(4, plain.length + 16 - 8)
    val st = parse(spliced.array())
    assert(st != null, "spliced WAV must still parse")
    assert(st.getLong(2) == 8L && st.getLong(3) == samples.map(s => s.toLong * s).sum)
    // malformed: truncated data chunk
    assert(parse(java.util.Arrays.copyOf(plain, plain.length - 2)) == null)
    // non-PCM: flip audioFormat to 3 (IEEE float)
    val floatFmt = plain.clone(); floatFmt(20) = 3
    assert(parse(floatFmt) == null)
    // not RIFF at all
    assert(parse("RIFX....WAVE".getBytes("US-ASCII")) == null)
  }

  test("len_prefixed_slices: exact pack round-trip; corruption yields null, not truncation") {
    import graft.functions.LenPrefixedSlices
    def slices(b: Array[Byte]) =
      LenPrefixedSlices(Literal.create(b, BinaryType)).eval(null)
    val recs = Seq(Array[Byte](1, 2, 3), Array.emptyByteArray, Array[Byte](9))
    val buf = java.nio.ByteBuffer.allocate(recs.map(_.length + 4).sum)
    recs.foreach { r => buf.putInt(r.length).put(r) } // BE by default
    val got = slices(buf.array()).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(got.numElements() == 3)
    assert(got.getBinary(0).toSeq == Seq[Byte](1, 2, 3))
    assert(got.getBinary(1).isEmpty && got.getBinary(2).toSeq == Seq[Byte](9))
    // empty payload → empty array (zero records is a valid pack)
    assert(slices(Array.emptyByteArray)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].numElements() == 0)
    // corruption surfaces as NULL: overrun length, trailing garbage, negative length
    assert(slices(Array[Byte](0, 0, 0, 9, 1)) == null)
    assert(slices(buf.array() :+ 7.toByte) == null)
    assert(slices(Array[Byte](-1, -1, -1, -1)) == null)
    // len = 0x7FFFFFFC: off + 4 + len wraps negative under Int arithmetic,
    // so only the long-arithmetic bound check rejects it (null, not a
    // task-killing copyOfRange throw)
    assert(slices(Array[Byte](0x7f, -1, -1, -4, 1, 2)) == null)
  }

  test("overflow hardening: huge WAV chunk size parses to null; absurd PNG dims are a construction error") {
    val plain = wavBytes(Array(1, 2, 3, 4), 8000)
    // declare the fmt chunk size as 0x7FFFFFF0 — bound check must fail cleanly
    val huge = plain.clone()
    val bb = java.nio.ByteBuffer.wrap(huge).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, 0x7ffffff0)
    assert(parse(huge) == null)
    assertThrows[IllegalArgumentException] {
      PngEncodeRgb(Literal.create(new GenericArrayData(Array.empty[Int]),
        ArrayType(IntegerType)), 65536, 65536)
    }
  }

  test("fuzz: random and bit-flipped payloads never throw in any binary decode expression") {
    import graft.functions.{ByteCdcBoundaries, ByteWindowSums, LenPrefixedSlices}
    // Every decode expression's documented contract on corrupt input is
    // null (or a valid value), NEVER a task-killing throw — the targeted
    // corrupt-case tests pin specific shapes; this sweep covers the
    // space between them. Two fuzz families: pure random buffers
    // (usually fail the magic-byte sniff) and bit-flipped VALID payloads
    // (pass the sniff, then hit the codec's own error paths).
    val fz = new scala.util.Random(42)
    val validPng = pngBytes(pixels, W, H)
    val validWav = wavBytes(Array.fill(200)(fz.nextInt(65536) - 32768), 8000)
    def mutated(base: Array[Byte]): Array[Byte] = {
      val b = base.clone()
      (0 until (1 + fz.nextInt(8))).foreach { _ =>
        b(fz.nextInt(b.length)) = (b(fz.nextInt(b.length)) ^ (1 << fz.nextInt(8))).toByte
      }
      b
    }
    val buffers =
      Array.fill(150)(Array.fill[Byte](fz.nextInt(4096))(fz.nextInt().toByte)) ++
      Array.fill(150)(mutated(validPng)) ++ Array.fill(150)(mutated(validWav))
    buffers.zipWithIndex.foreach { case (b, i) =>
      val lit = Literal.create(b, BinaryType)
      try {
        ImageDecodeStats(lit).eval(null)
        ImageAhash(lit, 8, 8).eval(null)
        WavParse(lit).eval(null)
        LenPrefixedSlices(lit).eval(null)
        ByteWindowSums(lit, 16).eval(null)
        ByteCdcBoundaries(lit, 16, 64).eval(null)
      } catch {
        case e: Throwable =>
          fail(s"decode threw on fuzz buffer #$i (len=${b.length}): $e")
      }
    }
  }

  test("decodeToFeatures: real pixel path for images, byte-histogram fallback otherwise") {
    val bytes = pngBytes(pixels, W, H)
    val f = Multimodal.decodeToFeatures(bytes)
    assert(f.length == 16)
    assert(f(0) == W.toFloat && f(1) == H.toFloat)
    val n = (W * H).toFloat
    assert(math.abs(f(2) - pixels.map(p => (p >> 16) & 0xff).sum / n) < 1e-3)
    // luma histogram is L1-normalized over pixels
    assert(math.abs(f.drop(5).sum - 1f) < 1e-3)
    // fallback: 16-bin byte histogram, L1-normalized
    val text = "fallback payload".getBytes("UTF-8")
    val g = Multimodal.decodeToFeatures(text)
    assert(math.abs(g.sum - 1f) < 1e-3)
    val expected = new Array[Float](16)
    text.foreach(b => expected((b & 0xff) >> 4) += 1f / text.length)
    assert(g.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-4 })
  }

  test("extractFeatures end-to-end: mixed image and non-image payloads through mapPartitions") {
    import spark.implicits._
    val png = pngBytes(pixels, W, H)
    val media = Seq(
      (1L, "image", png, W, H),
      (2L, "audio", "not an image".getBytes("UTF-8"), 0, 0))
      .toDF("media_id", "media_type", "payload", "meta_width", "meta_height")
    val rows = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(rows.length == 2)
    val imgF = rows(0).getAs[scala.collection.Seq[Float]]("features")
    assert(imgF(0) == W.toFloat && imgF(1) == H.toFloat)
    val othF = rows(1).getAs[scala.collection.Seq[Float]]("features")
    assert(math.abs(othF.sum - 1f) < 1e-3)
  }
}
