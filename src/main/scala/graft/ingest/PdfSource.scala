package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document-file source (SURVEY §2 A1): `binaryFile` scan over a directory
  * of documents → pluggable page extraction → the layout pipeline — one row
  * per chunk, parallel across files.
  *
  * The reference drives PDFium per character (pdf_processor.cpp:88-95);
  * here [[CharPdfExtractor]] parses PDF content streams to per-char boxes
  * with the same line-assembly geometry, [[TextPageExtractor]] handles
  * plain text, and the default [[SniffingExtractor]] picks by file magic.
  * A full-metrics PDF library (pdfbox etc.) can replace the built-in
  * extractor behind the same trait without touching the pipeline.
  */
trait PageExtractor extends Serializable {
  def extract(path: String, content: Array[Byte]): Seq[LayoutChunker.Page]
}

/** Plain-text extractor: pages split on form-feed, lines on newline. */
final case class TextPageExtractor(pageWidth: Double = 600, pageHeight: Double = 800)
    extends PageExtractor {
  override def extract(path: String, content: Array[Byte]): Seq[LayoutChunker.Page] = {
    val text = new String(content, java.nio.charset.StandardCharsets.UTF_8)
    text.split("\f").toSeq.zipWithIndex.map { case (pageText, pi) =>
      val lines = pageText.split("\n").toSeq.zipWithIndex.collect {
        case (l, li) if l.nonEmpty =>
          LayoutChunker.Line(l, 50, 50 + li * 14.0, 550, 62 + li * 14.0, 12, 400)
      }
      LayoutChunker.Page(pi + 1, pageWidth, pageHeight, lines)
    }
  }
}

object PdfSource {

  /** Scan a directory of document files and run the full ingest pipeline:
    * one task per file, `Seq[LayoutChunk]` out (the Generator/UDTF role). */
  def extractChunks(spark: SparkSession, dir: String, glob: String = "*",
                    extractor: PageExtractor = SniffingExtractor()): DataFrame = {
    import spark.implicits._
    val ex = extractor
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("content"), col("length"))
      .as[(String, Array[Byte], Long)]
    files.flatMap { case (path, content, length) =>
      val name = path.substring(path.lastIndexOf('/') + 1)
      val docId = DocId.generate(name, length)
      LayoutChunker.chunkDocument(ex.extract(path, content)).zipWithIndex.map {
        case (c, i) =>
          (docId, name, i, c.pageNum, c.text, c.headingPath, c.headingLevel,
            c.chunkType, c.sentenceCount, c.listType, c.listLength)
      }
    }.toDF("doc_id", "source_file", "chunk_idx", "page_num", "text_chunk",
      "heading_path", "heading_level", "chunk_type", "sentence_count",
      "list_type", "list_length")
  }
}

/** Cloud OCR fallback (SURVEY §2 A2): ship the whole document payload to a
  * vision model and get text back (gemini_api.cpp:275-314). The transport
  * is injected like the embedder's; a deployment posts
  * base64(payload) to `generateContent` with the extraction prompt. Used as
  * the extractor of last resort when the local parse yields nothing. */
final case class CloudOcrExtractor(
    transport: Array[Byte] => String,
    pageWidth: Double = 600, pageHeight: Double = 800) extends PageExtractor {
  override def extract(path: String, content: Array[Byte]): Seq[LayoutChunker.Page] =
    TextPageExtractor(pageWidth, pageHeight)
      .extract(path, transport(content).getBytes(java.nio.charset.StandardCharsets.UTF_8))
}

/** A2 client side: the reference's cloud PDF-extraction call, re-expressed
  * as a [[CloudOcrExtractor]] transport. Builds the EXACT request shape —
  * `contents[0].parts = [{inline_data: {mime_type: "application/pdf",
  * data: base64(payload)}}, {text: <extraction prompt>}]`
  * (gemini_api.cpp:281-307) — and parses
  * `candidates[0].content.parts[0].text` from the reply
  * (gemini_api.cpp:637-648). The URL is injected: production points at a
  * real generateContent endpoint; the gate points at the in-process
  * loopback server's /ocr (the C1/E1 precedent), which closes socket +
  * serialization + both parses while model behavior stays the
  * deterministic stand-in. */
object CloudOcr {
  /** gemini_api.cpp:303 — byte-for-byte the reference's prompt. */
  val ExtractPrompt = "Extract all text from this PDF exactly as it is."

  def geminiTransport(url: String): Array[Byte] => String = { payload =>
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val req = JsonMethods.compact(JsonMethods.render(JObject(
      "contents" -> JArray(List(JObject("parts" -> JArray(List(
        JObject("inline_data" -> JObject(
          "mime_type" -> JString("application/pdf"),
          "data" -> JString(java.util.Base64.getEncoder.encodeToString(payload)))),
        JObject("text" -> JString(ExtractPrompt))))))))))
    val reply = graft.embed.LoopbackTransport(url)(req)
    JsonMethods.parse(reply) \ "candidates" match {
      case JArray(first :: _) =>
        (first \ "content" \ "parts") match {
          case JArray(p :: _) => p \ "text" match {
            case JString(s) => s
            case _          => ""
          }
          case _ => ""
        }
      case _ => "" // the reference surfaces empty extraction as an error row
    }
  }
}

/** Doc identity (SURVEY §2 B10): md5(filename + "_" + filesize),
  * pdf_processor.cpp:409-416. */
object DocId {
  def generate(fileName: String, fileSize: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"${fileName}_$fileSize".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }
}
