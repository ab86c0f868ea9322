package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{CharPdfExtractor, DocId, LayoutChunker, PdfSampleDoc, PdfSource, SniffingExtractor}

class CharPdfExtractorSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("per-char extraction: line assembly, font metrics, space-gap inference (A1/B2)") {
    val pages = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytes)
    assert(pages.size == PdfSampleDoc.NumPages)
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

  test("fuzz: random bytes and bit-flipped valid PDFs extract to pages-or-empty, never throw") {
    // A1's robustness contract: a real-world corrupt PDF degrades to
    // empty extraction — never an exception that kills the ingest task.
    // Random buffers miss the %PDF magic; bit-flipped VALID documents
    // get past the header and exercise the xref/stream/filter error
    // paths (including flips inside Flate data and the trailer).
    val fz = new scala.util.Random(1337)
    def mutated(base: Array[Byte]): Array[Byte] = {
      val b = base.clone()
      (0 until (1 + fz.nextInt(12))).foreach { _ =>
        b(fz.nextInt(b.length)) = (b(fz.nextInt(b.length)) ^ (1 << fz.nextInt(8))).toByte
      }
      b
    }
    val buffers =
      Array.fill(60)(Array.fill[Byte](fz.nextInt(8192))(fz.nextInt().toByte)) ++
      Array.fill(80)(mutated(PdfSampleDoc.bytes)) ++
      Array.fill(40)(mutated(PdfSampleDoc.bytesObjStm)) ++
      Array.fill(20)(mutated(PdfSampleDoc.bytesEncrypted(aes = true)))
    buffers.zipWithIndex.foreach { case (b, i) =>
      // full B pipeline: whatever pages a damaged file yields (possibly
      // odd geometry — zero-width lines, inverted boxes) must survive
      // the layout chunker too, end-to-end like PdfSource runs it
      try LayoutChunker.chunkDocument(CharPdfExtractor().extract(s"fuzz_$i.pdf", b))
      catch {
        case e: Throwable =>
          fail(s"extract+layout threw on fuzz doc #$i (len=${b.length}): $e")
      }
    }
  }

  test("PDF 1.5 object-stream + xref-stream layout extracts identically to the classic layout") {
    val classic = CharPdfExtractor().extract("classic.pdf", PdfSampleDoc.bytes)
    val modern = CharPdfExtractor().extract("objstm.pdf", PdfSampleDoc.bytesObjStm)
    // page dicts + fonts live in a compressed /ObjStm, the xref is a
    // binary /XRef stream, and /F1 carries an explicit Courier /Widths
    // table — none of which may change a single line, box, or weight
    assert(modern == classic)
    assert(modern.size == PdfSampleDoc.NumPages)
    assert(modern.head.lines.find(_.text == "1 Introduction").exists(_.fontWeight == 700))
  }

  test("Type0/Identity-H composite-font twin extracts identically to the simple-font layout") {
    val simple = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytes)
    val type0 = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytesType0)
    assert(type0.size == simple.size)
    // codes are unicode+0x100, so ANY extracted text proves the /ToUnicode
    // CMap (Flate, bfrange incremented + array targets, bfchar) decoded;
    // /W + /DW at exact Courier 600 em make the boxes identical too, so
    // full per-line equality (text, boxes, size, weight) is required
    simple.zip(type0).foreach { case (s, t) =>
      assert(t.lines == s.lines, s"page ${s.pageNum} diverges under the Type0 layout")
    }
  }

  test("Type3 /Differences twin extracts identically to the classic layout") {
    val simple = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytes)
    val type3 = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytesType3)
    assert(type3.size == simple.size)
    // body codes are ASCII−31, so ANY extracted body text proves the
    // /Encoding /Differences array resolved through the glyph list
    // (including the /uni0064 and /u0077 algorithmic names) with the
    // opaque /g76 name recovered via the font's raw 1-byte /ToUnicode;
    // /FontMatrix [0.01 …] × /Widths 60 must reproduce the 0.6 em Courier
    // advance, so full per-line equality (text, boxes, weight) is required.
    // The heading font separately pins the re-encoded-simple-font case
    // (byte 0xE9 → /o via its own /Differences).
    simple.zip(type3).foreach { case (s, t) =>
      assert(t.lines == s.lines, s"page ${s.pageNum} diverges under the Type3 layout")
    }
  }

  test("AGL name resolution: ASCII names, uniXXXX/uXXXX forms, out-of-subset names") {
    import graft.ingest.AdobeGlyphs
    assert(AdobeGlyphs.unicode("space").contains(" "))
    assert(AdobeGlyphs.unicode("quotesingle").contains("'"))
    assert(AdobeGlyphs.unicode("seven").contains("7"))
    assert(AdobeGlyphs.unicode("A").contains("A"))
    assert(AdobeGlyphs.unicode("uni0041").contains("A"))
    // multi-unit uniXXXXYYYY: two UTF-16 units
    assert(AdobeGlyphs.unicode("uni00410042").contains("AB"))
    // uXXXXX with an astral code point survives the surrogate split
    assert(AdobeGlyphs.unicode("u1D400").contains(new String(Character.toChars(0x1D400))))
    assert(AdobeGlyphs.unicode("g76").isEmpty)    // opaque writer name
    assert(AdobeGlyphs.unicode("uniXYZW").isEmpty) // non-hex uni name
  }

  test("/Differences parsing: restarts, unresolvable names advance the code") {
    val m = CharPdfExtractor().parseDifferences("1 /space /g99 /exclam 65 /A /uni0042")
    // /g99 resolves to nothing but still consumes code 2
    assert(m == Map(1 -> " ", 3 -> "!", 65 -> "A", 66 -> "B"))
  }

  test("/LZWDecode twin extracts identically to the classic layout") {
    val classic = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytes)
    val lzw = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytesLzw)
    // page 2 is LZW-compressed (variable-width early-change codes), page 3
    // Flate — the mixed-filter document must not change a single line
    assert(lzw == classic)
  }

  test("predictor twin (/Predictor 12 PNG rows + /Predictor 2 TIFF) extracts identically to the classic layout") {
    val classic = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytes)
    val pred = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytesPredictor)
    // page 2: Flate over PNG-filtered rows (per-row filter byte cycling
    // through all five PNG filters, short final row); page 3: LZW over
    // TIFF horizontal differencing. Byte parity required — before the
    // predictor pass these streams decoded to garbage and the pages
    // extracted nothing.
    assert(pred == classic)
    assert(classic.exists(_.lines.nonEmpty), "twin parity is vacuous on an empty extraction")
  }

  test("incremental-save twin: the NEWEST generation of each updated object wins (content stream, font, page dict)") {
    val inc = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytesIncremental)
    val expected = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytesIncrementalExpected)
    // the appended update section re-saves page 2's content stream
    // (revised text), the /F2 font (Courier-Bold → Courier: heading
    // weight must flip 700 → 400) and the page-2 dict (MediaBox grows to
    // 612×800) under their ORIGINAL object numbers — byte parity with
    // the one-shot save of the same final state, same discipline as the
    // encryption/predictor twins (PDFium anchor: xref-chain resolution
    // behind pdf_processor.cpp:23-407)
    assert(inc == expected)
    assert(inc.size == PdfSampleDoc.NumPages, "the stale page-2 stream must not extract as an extra page")
    val p2 = inc(1)
    assert(p2.height == 800.0, "the re-saved page dict's MediaBox must win")
    assert(p2.lines.exists(_.text == "2 Methods Revised"))
    assert(!inc.exists(_.lines.exists(_.text == "2 Methods")), "stale page-2 text leaked")
    assert(p2.lines.find(_.text == "2 Methods Revised").get.fontWeight == 400,
      "the re-encoded /F2 font must win")
    // pages 3..7 keep their original boxes — the duplicate page-2 dict
    // must not SHIFT later boxes (positional pairing)
    assert(inc(2).height == 792.0 && inc.last.height == 792.0)
    // untouched pages extract exactly as in the original document
    assert(inc.head.lines.exists(_.text == "1 Introduction"))
  }

  test("incremental-save precedence tolerates a bumped generation number (freed + reused object)") {
    // updates normally keep gen 0 (PDF §7.5.6), but a freed-then-reused
    // object number comes back at gen 1 — the object scan must not be
    // gen-0-anchored (the pre-round-9 fontInfos regex was)
    val base = new String(PdfSampleDoc.bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val upd = base +
      "\n18 1 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>\nendobj\n"
    val pages = CharPdfExtractor().extract("doc.pdf",
      upd.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    // /F2 resolved through the gen-1 replacement: headings lose boldness
    val head = pages.head.lines.find(_.text == "1 Introduction").get
    assert(head.fontWeight == 400, "gen-1 font update was not honored")
  }

  test("spurious obj/endobj byte patterns inside stream data cannot replace real objects") {
    // last-wins incremental-save precedence makes a fake `n g obj…endobj`
    // byte sequence inside stream data DANGEROUS: before the round-10
    // hardening it would REPLACE the real object's body (here: object 18,
    // the bold /F2 font) instead of merely adding noise. Matches starting
    // inside stream…endstream payload spans are now excluded.
    val base = new String(PdfSampleDoc.bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val spurious = base +
      "\n90 0 obj\n<< /Length 80 >>\nstream\n" +
      "18 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n" +
      "endstream\nendobj\n"
    val pages = CharPdfExtractor().extract("doc.pdf",
      spurious.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val clean = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytes)
    val head = pages.head.lines.find(_.text == "1 Introduction").get
    assert(head.fontWeight == 700,
      "stream-payload bytes replaced the real /F2 font object (weight lost boldness)")
    assert(pages == clean, "stream-payload obj/endobj bytes changed the extraction")
  }

  test("predictor unfiltering is exact for every PNG filter type and the TIFF path") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill[Byte](1000)(rnd.nextInt(256).toByte)
    // PNG round-trip via the private fixture encoder is covered by the
    // twin test; here pin the decoder directly against hand-built rows
    val cols = 16
    // filter 2 (Up) over two rows of a known pattern
    val row1 = Array.tabulate[Byte](cols)(i => (i * 3).toByte)
    val row2 = Array.tabulate[Byte](cols)(i => (i * 5 + 1).toByte)
    val png = new java.io.ByteArrayOutputStream()
    png.write(0); png.write(row1, 0, cols) // filter 0: verbatim
    png.write(2) // filter 2: up
    (0 until cols).foreach(i => png.write((row2(i) - row1(i)) & 0xff))
    val dict = s"<< /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $cols >> >>"
    val got = CharPdfExtractor().applyPredictor(dict, png.toByteArray)
    assert(got.sameElements(row1 ++ row2))
    // TIFF predictor 2: delta-encode then decode restores the original
    val tcols = 7
    val enc = data.clone()
    var r = 0
    while (r < enc.length) {
      val end = math.min(r + tcols, enc.length)
      var i = end - 1
      while (i > r) { enc(i) = (enc(i) - enc(i - 1)).toByte; i -= 1 }
      r = end
    }
    val tdict = s"<< /Filter /FlateDecode /DecodeParms << /Predictor 2 /Columns $tcols >> >>"
    assert(CharPdfExtractor().applyPredictor(tdict, enc).sameElements(data))
    // no /DecodeParms or /Predictor 1 → identity
    assert(CharPdfExtractor().applyPredictor("<< /Filter /FlateDecode >>", data).sameElements(data))
    assert(CharPdfExtractor().applyPredictor(
      "<< /DecodeParms << /Predictor 1 >> >>", data).sameElements(data))
  }

  test("RC4-encrypted twin (empty user password) extracts identically to the plain layout") {
    val classic = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytes)
    val rc4 = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytesEncrypted(aes = false))
    // every stream is RC4-encrypted under the /V 2 /R 3 per-object key —
    // including page 2's, where decryption must precede FlateDecode
    assert(rc4 == classic)
  }

  test("AES-128-encrypted twin (empty user password) extracts identically to the plain layout") {
    val classic = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytes)
    val aes = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytesEncrypted(aes = true))
    // /V 4 /R 4 /AESV2: per-stream IV prefix, CBC, PKCS#7 padding, and
    // the 50×MD5 key derivation with the sAlT object-key extension
    assert(aes == classic)
  }

  test("AES twin with /CF-first dict (no top-level /Length, unsigned /P) extracts identically") {
    val classic = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytes)
    // the adversarial-but-legal dict layout: /CF << … /Length 16 >> comes
    // BEFORE any top-level key, there is NO top-level /Length, and /P is
    // the unsigned-decimal form — a first-match /Length parse would
    // derive a 2-byte key and Cipher.init would throw
    val aes = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytesEncryptedAesCfFirst)
    assert(aes == classic)
  }

  test("identity stream filter (/CFM /None and absent /StmF): plain streams extract despite the Encrypt dict") {
    val classic = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytes)
    // /StmF /StdCF whose /CFM is /None: streams stored PLAIN — blindly
    // decrypting them would feed garbage to FlateDecode
    val none = CharPdfExtractor().extract("doc.pdf",
      PdfSampleDoc.bytesEncryptedIdentityStreams())
    assert(none == classic)
    // /StmF absent entirely: the spec default is Identity (§7.6.5)
    val absent = CharPdfExtractor().extract("doc.pdf",
      PdfSampleDoc.bytesEncryptedIdentityStreams(stmfAbsent = true))
    assert(absent == classic)
  }

  test("password-protected twin: extracts byte-identically WITH the password, empty without it") {
    val classic = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytes)
    val doc = PdfSampleDoc.bytesPassworded("hunter2")
    // Algorithm 2 padding of the supplied password; /U validates it
    val withPw = CharPdfExtractor(passwords = Seq("hunter2")).extract("doc.pdf", doc)
    assert(withPw == classic)
    // no password (and a wrong one): the empty-password candidate fails
    // the /U check, cryptoOf yields None, and the encrypted streams
    // degrade to EMPTY extraction — never garbage, never an exception
    // (the round-6 advice: a wrong key's plaintext must not reach
    // Inflater and kill the ingest task)
    val without = CharPdfExtractor().extract("doc.pdf", doc)
    assert(without.flatMap(_.lines).isEmpty,
      s"wrong-key extraction produced text: ${without.flatMap(_.lines).take(3)}")
    val wrongPw = CharPdfExtractor(passwords = Seq("letmein")).extract("doc.pdf", doc)
    assert(wrongPw.flatMap(_.lines).isEmpty)
  }

  test("owner-password twin: Algorithm 7 recovers the user password; either password opens, wrong ones degrade to empty") {
    val classic = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytes)
    val doc = PdfSampleDoc.bytesOwnerPassworded(owner = "admin-pw", user = "hunter2")
    // the USER password opens via the normal Algorithm 2 path
    assert(CharPdfExtractor(passwords = Seq("hunter2")).extract("doc.pdf", doc) == classic)
    // the OWNER password alone opens via Algorithm 7 (decrypt /O →
    // padded user password → Algorithm 2 → /U validates)
    assert(CharPdfExtractor(passwords = Seq("admin-pw")).extract("doc.pdf", doc) == classic)
    // no password / a wrong password: every candidate fails /U → empty
    assert(CharPdfExtractor().extract("doc.pdf", doc).flatMap(_.lines).isEmpty)
    assert(CharPdfExtractor(passwords = Seq("nope")).extract("doc.pdf", doc)
      .flatMap(_.lines).isEmpty)
  }

  test("AES-256 twins (/R 5 and /R 6): empty and non-empty passwords extract identically; wrong password degrades to empty") {
    val classic = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytes)
    // /R 6 (ISO 32000-2, the iterated 2.B hash), empty user password —
    // the common viewer-openable AES-256 case
    val r6 = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytesEncryptedAes256(r = 6))
    assert(r6 == classic)
    // /R 5 (the deprecated single-SHA-256 predecessor)
    val r5 = CharPdfExtractor().extract("doc.pdf", PdfSampleDoc.bytesEncryptedAes256(r = 5))
    assert(r5 == classic)
    // non-empty password through the same 2.B derivation
    val pwDoc = PdfSampleDoc.bytesEncryptedAes256(r = 6, password = "s3cret")
    val withPw = CharPdfExtractor(passwords = Seq("s3cret")).extract("doc.pdf", pwDoc)
    assert(withPw == classic)
    // no/wrong password: /U validation fails -> empty, never garbage
    assert(CharPdfExtractor().extract("doc.pdf", pwDoc).flatMap(_.lines).isEmpty)
    assert(CharPdfExtractor(passwords = Seq("nope")).extract("doc.pdf", pwDoc)
      .flatMap(_.lines).isEmpty)
  }

  test("/W array drives per-CID advances; hex strings decode in simple fonts too") {
    import java.nio.charset.StandardCharsets.ISO_8859_1
    // minimal Type0 doc: "AB" as 2-byte codes; A has /W 2000 (2.0 em),
    // B falls back to /DW 600 — at 10 pt the line must span 20 + 6 = 26
    def mini(content: String, fontObjs: String): Array[Byte] =
      (s"""%PDF-1.6
          |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
          |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
          |3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj
          |4 0 obj << /Length ${content.length} >>
          |stream
          |$content
          |endstream
          |endobj
          |$fontObjs
          |%%EOF
          |""".stripMargin).getBytes(ISO_8859_1)

    val cmap =
      """1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |1 beginbfrange
        |<0041> <0042> <0041>
        |endbfrange""".stripMargin
    val type0Doc = mini(
      "BT /F1 10 Tf 1 0 0 1 72 700 Tm <00410042> Tj ET",
      s"""5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /T /Encoding /Identity-H /DescendantFonts [6 0 R] /ToUnicode 7 0 R >> endobj
         |6 0 obj << /Type /Font /Subtype /CIDFontType2 /BaseFont /T /DW 600 /W [ 65 [2000] ] >> endobj
         |7 0 obj << /Length ${cmap.length} >>
         |stream
         |$cmap
         |endstream
         |endobj""".stripMargin)
    val line = CharPdfExtractor().extract("w.pdf", type0Doc).head.lines.head
    assert(line.text == "AB")
    assert(math.abs((line.right - line.left) - 26.0) < 1e-9,
      s"/W advance not honored: span ${line.right - line.left}")

    // hex string through a SIMPLE font: one byte per char
    val simpleDoc = mini(
      "BT /F1 12 Tf 1 0 0 1 72 700 Tm <48492E> Tj ET",
      "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Courier >> endobj")
    assert(CharPdfExtractor().extract("h.pdf", simpleDoc).head.lines.head.text == "HI.")

    // embedded /Encoding CMap: codes <0241 0242> remap to CIDs 65/66 via
    // a cidrange entry, so the SAME /W [65 [2000]] + /DW 600 advances
    // apply (CID-keyed) while /ToUnicode stays CODE-keyed — identical
    // "AB" text and the identical 26 pt span prove both lookups route
    // through the CMap correctly
    val cidCmap =
      """1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |1 begincidrange
        |<0241> <0242> 65
        |endcidrange""".stripMargin
    val uniCmap =
      """1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |1 beginbfrange
        |<0241> <0242> <0041>
        |endbfrange""".stripMargin
    val cmapDoc = mini(
      "BT /F1 10 Tf 1 0 0 1 72 700 Tm <02410242> Tj ET",
      s"""5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /T /Encoding 8 0 R /DescendantFonts [6 0 R] /ToUnicode 7 0 R >> endobj
         |6 0 obj << /Type /Font /Subtype /CIDFontType2 /BaseFont /T /DW 600 /W [ 65 [2000] ] >> endobj
         |7 0 obj << /Length ${uniCmap.length} >>
         |stream
         |$uniCmap
         |endstream
         |endobj
         |8 0 obj << /Type /CMap /CMapName /Custom-H /Length ${cidCmap.length} >>
         |stream
         |$cidCmap
         |endstream
         |endobj""".stripMargin)
    val cmLine = CharPdfExtractor().extract("cm.pdf", cmapDoc).head.lines.head
    assert(cmLine.text == "AB", s"embedded-CMap decode: '${cmLine.text}'")
    assert(math.abs((cmLine.right - cmLine.left) - 26.0) < 1e-9,
      s"CID-keyed /W advance not honored through the CMap: span ${cmLine.right - cmLine.left}")
  }

  test("/Widths array drives per-char advances (non-uniform metrics)") {
    // one page, font widths a=500 b=1000 c=1500 (FirstChar 97), size 10:
    // advances 5, 10, 15 → line right edge at 72 + 30
    val widths = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/FirstChar 97 /LastChar 99 /Widths [500 1000 1500] >>"
    val content = "BT /F1 10 Tf 1 0 0 1 72 700 Tm (abc) Tj ET"
    val pdf =
      s"""%PDF-1.4
         |1 0 obj
         |<< /Type /Catalog /Pages 2 0 R >>
         |endobj
         |2 0 obj
         |<< /Type /Pages /Kids [3 0 R] /Count 1 >>
         |endobj
         |3 0 obj
         |<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>
         |endobj
         |4 0 obj
         |<< /Length ${content.length} >>
         |stream
         |$content
         |endstream
         |endobj
         |5 0 obj
         |$widths
         |endobj
         |%%EOF
         |""".stripMargin
    val pages = CharPdfExtractor().extract("w.pdf",
      pdf.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val line = pages.head.lines.head
    assert(line.text == "abc")
    assert(math.abs(line.left - 72.0) < 1e-9)
    assert(math.abs(line.right - 102.0) < 1e-9, s"right = ${line.right}")
  }

  test("end-to-end PDF ingest: binaryFile scan → chunks with breadcrumbs, noise dropped (A1+B1-B9)") {
    val dir = Files.createTempDirectory("graft-pdf-")
    val pdfBytes = PdfSampleDoc.bytes
    Files.write(dir.resolve("doc.pdf"), pdfBytes)
    val rows = PdfSource.extractChunks(spark, dir.toString, extractor = SniffingExtractor())
      .collect()
    assert(rows.nonEmpty)
    val texts = rows.map(_.getAs[String]("text_chunk"))
    val paths = rows.map(_.getAs[String]("heading_path")).toSet
    // every page's heading became a breadcrumb for its prose
    (1 to PdfSampleDoc.NumPages).foreach(p => assert(paths.contains(PdfSampleDoc.title(p))))
    // heading level 1 (18 pt vs 10 pt baseline + short block)
    assert(rows.forall(_.getAs[Int]("heading_level") == 1))
    // the 7x-repeated margin footer and bare page numbers are noise-dropped
    assert(!texts.exists(_.contains("Confidential Draft")))
    assert(!texts.exists(_.trim.matches("\\d{1,4}")))
    // kerned TJ text landed in the prose with its inferred space
    assert(texts.exists(_.contains("kerned gap")))
    // all 7 pages contributed (including the Flate-compressed page 2)
    assert(rows.map(_.getAs[Int]("page_num")).toSet == (1 to PdfSampleDoc.NumPages).toSet)
    // B10 doc identity: md5(filename + "_" + filesize)
    assert(rows.head.getAs[String]("doc_id") == DocId.generate("doc.pdf", pdfBytes.length.toLong))
  }
}
