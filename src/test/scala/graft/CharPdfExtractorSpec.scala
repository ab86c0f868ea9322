package graft

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{CharPdfExtractor, DocId, PdfSource, SniffingExtractor}

/** A small REAL PDF (valid xref, Courier metrics, one Flate-compressed
  * page) built in-memory: per-char extraction → 5 pt line assembly → the
  * full B1–B9 layout pipeline, end to end. */
object PdfFixture {

  val NumPages = 7
  private val titles = Seq("1 Introduction", "2 Methods", "3 Results", "4 Discussion",
    "5 Evaluation", "6 Related Work", "7 Conclusion")

  def title(p: Int): String = titles(p - 1)

  private def pageContent(p: Int): String =
    s"""BT /F2 18 Tf 1 0 0 1 72 700 Tm (${title(p)}) Tj ET
       |BT /F1 10 Tf 1 0 0 1 72 660 Tm (This is body text on page $p. It explains the topic in detail.) Tj
       |0 -14 Td (A second line continues the paragraph with more words.) Tj
       |0 -14 Td [(kerned) -700 (gap)] TJ ET
       |BT /F1 8 Tf 1 0 0 1 72 24 Tm (Confidential Draft) Tj ET
       |BT /F1 8 Tf 1 0 0 1 300 24 Tm ($p) Tj ET""".stripMargin

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
    d.end()
    out.toByteArray
  }

  /** Assemble a structurally valid classic PDF with correct xref offsets. */
  def bytes: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(n: Int)(body: => Unit): Unit = {
      offsets += out.size; w(s"$n 0 obj\n"); body; w("endobj\n")
    }
    w("%PDF-1.4\n")
    obj(1) { w("<< /Type /Catalog /Pages 2 0 R >>\n") }
    obj(2) { w(s"<< /Type /Pages /Kids [${(0 until NumPages).map(i => s"${3 + i} 0 R").mkString(" ")}] /Count $NumPages >>\n") }
    for (i <- 0 until NumPages) obj(3 + i) {
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents ${10 + i} 0 R " +
        "/Resources << /Font << /F1 17 0 R /F2 18 0 R >> >> >>\n")
    }
    for (i <- 0 until NumPages) {
      val content = pageContent(i + 1)
      if (i == 1) { // page 2 exercises the FlateDecode path
        val z = deflate(content.getBytes(ISO_8859_1))
        obj(10 + i) {
          w(s"<< /Length ${z.length} /Filter /FlateDecode >>\nstream\n")
          out.write(z); w("\nendstream\n")
        }
      } else obj(10 + i) {
        w(s"<< /Length ${content.length} >>\nstream\n$content\nendstream\n")
      }
    }
    obj(17) { w("<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>\n") }
    obj(18) { w("<< /Type /Font /Subtype /Type1 /BaseFont /Courier-Bold >>\n") }
    val xref = out.size
    w(s"xref\n0 ${offsets.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.size + 1} /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }
}

class CharPdfExtractorSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("per-char extraction: line assembly, font metrics, space-gap inference (A1/B2)") {
    val pages = CharPdfExtractor().extract("doc.pdf", PdfFixture.bytes)
    assert(pages.size == PdfFixture.NumPages)
    assert(pages.head.width == 612.0 && pages.head.height == 792.0)

    val p1 = pages.head.lines
    // heading: Courier-Bold 18, assembled as one line from per-char boxes
    val head = p1.find(_.text == "1 Introduction").get
    assert(math.abs(head.fontSize - 18.0) < 1e-9)
    assert(head.fontWeight == 700)
    // body lines keep their literal spaces (no double-space from inference)
    assert(p1.exists(_.text == "This is body text on page 1. It explains the topic in detail."))
    // TJ kerning gap of 7 pt (> 4 pt) infers the space between runs
    assert(p1.exists(_.text == "kerned gap"))
    // top-down coordinates: heading sits above the body
    val body = p1.find(_.text.startsWith("This is body")).get
    assert(head.top < body.top)

    // page 2 went through FlateDecode and yields the same structure
    assert(pages(1).lines.exists(_.text == "2 Methods"))
  }

  test("end-to-end PDF ingest: binaryFile scan → chunks with breadcrumbs, noise dropped (A1+B1-B9)") {
    val dir = Files.createTempDirectory("graft-pdf-")
    val pdfBytes = PdfFixture.bytes
    Files.write(dir.resolve("doc.pdf"), pdfBytes)
    val rows = PdfSource.extractChunks(spark, dir.toString, extractor = SniffingExtractor())
      .collect()
    assert(rows.nonEmpty)
    val texts = rows.map(_.getAs[String]("text_chunk"))
    val paths = rows.map(_.getAs[String]("heading_path")).toSet
    // every page's heading became a breadcrumb for its prose
    (1 to PdfFixture.NumPages).foreach(p => assert(paths.contains(PdfFixture.title(p))))
    // heading level 1 (18 pt vs 10 pt baseline + short block)
    assert(rows.forall(_.getAs[Int]("heading_level") == 1))
    // the 7x-repeated margin footer and bare page numbers are noise-dropped
    assert(!texts.exists(_.contains("Confidential Draft")))
    assert(!texts.exists(_.trim.matches("\\d{1,4}")))
    // kerned TJ text landed in the prose with its inferred space
    assert(texts.exists(_.contains("kerned gap")))
    // all 7 pages contributed (including the Flate-compressed page 2)
    assert(rows.map(_.getAs[Int]("page_num")).toSet == (1 to PdfFixture.NumPages).toSet)
    // B10 doc identity: md5(filename + "_" + filesize)
    assert(rows.head.getAs[String]("doc_id") == DocId.generate("doc.pdf", pdfBytes.length.toLong))
  }
}
