package graft.ingest

import java.util.zip.Inflater

/** Self-contained PDF page extractor (SURVEY §2 A1): JDK-only parsing of
  * classic PDF files — object scan, FlateDecode via [[java.util.zip.Inflater]],
  * a text-operator interpreter producing PER-CHARACTER boxes, and the
  * reference's exact char→line assembly: 5 pt row tolerance, 4 pt
  * space-gap inference, per-line char-averaged font size/weight
  * (pdf_processor.cpp:88-151, which drives PDFium the same way).
  *
  * Glyph metrics: a font's /FirstChar + /Widths array (inline or an
  * indirect reference) drives per-char advances when present; otherwise
  * standard-14 Courier is fixed-pitch 600/1000 em, so char advances (and
  * therefore boxes) are EXACT for Courier-family fonts; everything else
  * uses the configurable `defaultWidthEm` approximation. A full-AFM
  * library (pdfbox etc.) can plug in behind the same [[PageExtractor]]
  * trait without touching anything downstream.
  *
  * Supported subset (documented contract, pinned by LayoutChunkerSpec +
  * CharPdfExtractorSpec): classic AND PDF 1.5+ object-stream documents —
  * /ObjStm streams are inflated and their packed objects (page dicts,
  * fonts, …) joined to the object space; /XRef cross-reference streams
  * are recognized structural streams (never misread as page content; the
  * extractor scans objects directly and needs no xref table). Content
  * streams are raw, /FlateDecode or /LZWDecode, one per page in document
  * order; text operators BT ET Tf Tm Td TD TL T* Tj ' TJ; literal `(…)`
  * strings with escapes and nesting AND hex strings `<…>`.
  *
  * Encrypted documents: the standard security handler — RC4 (/V 1–2,
  * /R 2–3), AES-128-CBC (/V 4 /AESV2, /R 4) and AES-256-CBC (/V 5
  * /AESV3, /R 5–6, ISO 32000-2) — with the common "viewer-openable"
  * EMPTY user password plus caller-supplied passwords (the `passwords`
  * parameter; Algorithm 2 padding for /V ≤ 4, the SHA-256/2.B hash for
  * /V 5). Each supplied password is also tried as an OWNER password
  * (Algorithm 7: /O decrypts to the padded user password, /V ≤ 4). Candidate keys are validated against /U before use, and
  * stream bytes are decrypted under the [[PdfCrypto]] per-object key
  * (file key directly for /V 5) before filter decode (xref streams are
  * never encrypted, per spec). An IDENTITY stream crypt filter —
  * /StmF /Identity, /StmF absent (the §7.6.5 default), or a named
  * filter with /CFM /None — is honored: such streams decode directly.
  * Other non-default crypt filters remain out of subset — an
  * unvalidatable or undecodable document extracts EMPTY rather than as
  * garbage (per-stream decode is exception-guarded: one bad PDF never
  * fails the ingest job).
  *
  * Composite fonts (the layout most modern writers emit): /Type0 fonts
  * with Identity-H encoding decode 2-byte codes per glyph — code → CID
  * (identity) → unicode via the /ToUnicode CMap (bfchar + bfrange, single
  * targets, incremented-range targets, and array targets; Flate or raw),
  * with per-CID advances from the descendant CIDFontType2's /W array
  * (both the `c [w…]` consecutive and `cFirst cLast w` range forms) and
  * /DW default. An EMBEDDED /Encoding CMap stream (cidrange/cidchar
  * sections, PDF §9.7.5.3) remaps 2-byte codes to CIDs before the /W
  * lookup; named predefined CMaps (UniJIS etc.) and vertical Identity-V
  * remain out of subset — such text falls back to 2-byte identity
  * decoding.
  */
final case class CharPdfExtractor(defaultWidthEm: Double = 0.6,
                                  passwords: Seq[String] = Nil) extends PageExtractor {

  // def, not val: Charset is not Serializable and would poison the
  // executor closure of the binaryFile flatMap
  private def Iso = java.nio.charset.StandardCharsets.ISO_8859_1

  /** One positioned character — the FPDFText_GetCharBox analog
    * (pdf_processor.cpp:88-95). PDF coords: y grows UP. */
  private final case class Ch(c: Char, left: Double, top: Double, right: Double,
                              bottom: Double, size: Double, weight: Int)

  override def extract(path: String, content: Array[Byte]): Seq[LayoutChunker.Page] =
    // The A1 robustness contract: a corrupt document degrades to EMPTY
    // extraction, never a task-killing throw (the ingest flatMap runs
    // over arbitrary user files). Numeric tokens inside a damaged file
    // can fail any of the parser's toInt/toDouble sites — the boundary
    // guard, not per-site whack-a-mole, is what the contract promises.
    // Pinned by the bit-flip fuzz sweep in CharPdfExtractorSpec.
    try extractUnguarded(content)
    catch { case scala.util.control.NonFatal(_) => Seq.empty }

  private def extractUnguarded(content: Array[Byte]): Seq[LayoutChunker.Page] = {
    val raw0 = new String(content, Iso)
    // PDF 1.5+: packed /ObjStm objects (page dicts, fonts, …) joined into
    // the scannable object space; content streams stay top-level (the
    // spec forbids stream objects inside object streams).
    // Known limit: re-materialized objects append AFTER the top-level
    // scan text, so when page dicts are SPLIT between the two (an
    // incrementally-updated file), MediaBox order can disagree with
    // content-stream order — such files should use the real-codec
    // PageExtractor plug-in; fixtures and whole-document ObjStm files
    // (every page dict packed, the common writer layout) are unaffected.
    val crypto = cryptoOf(raw0, passwords)
    val raw = expandObjectStreams(content, raw0, crypto)
    val boxes = mediaBoxes(raw)
    val fonts = fontInfos(raw, crypto)
    contentStreams(content, raw0, crypto).zipWithIndex.map { case (ops, i) =>
      val (w, h) = boxes.lift(i).orElse(boxes.headOption).getOrElse((612.0, 792.0))
      LayoutChunker.Page(i + 1, w, h, assembleLines(interpret(ops, fonts), h))
    }
  }

  // ---- standard-security-handler decryption (PdfCrypto) ----

  /** Per-document decryption context: the Algorithm-2 file key and the
    * stream cipher (RC4 vs AES-128). */
  private[ingest] final case class Crypto(key: Array[Byte], aes: Boolean)

  /** A PDF string value after a dictionary key: hex `<…>` or literal
    * `(…)` with escapes — /O, /U, /UE and /ID carry binary bytes. The
    * key must end at a NAME BOUNDARY ("/U" must not match inside "/UE"),
    * so occurrences are scanned until a properly-delimited one is found. */
  private def stringAfter(body: String, key: String): Option[Array[Byte]] = {
    var at = body.indexOf(key)
    while (at >= 0 &&
           at + key.length < body.length &&
           Character.isLetterOrDigit(body.charAt(at + key.length)))
      at = body.indexOf(key, at + 1)
    if (at < 0) return None
    var i = at + key.length
    while (i < body.length && body.charAt(i).isWhitespace) i += 1
    if (i >= body.length) return None
    body.charAt(i) match {
      case '<' =>
        val j = body.indexOf('>', i)
        if (j < 0) None
        else Some(body.substring(i + 1, j).filter(c => Character.digit(c, 16) >= 0)
          .grouped(2).filter(_.length == 2)
          .map(h => Integer.parseInt(h, 16).toByte).toArray)
      case '(' =>
        val out = new java.io.ByteArrayOutputStream()
        var depth = 1
        i += 1
        while (i < body.length && depth > 0) {
          val c = body.charAt(i)
          if (c == '\\' && i + 1 < body.length) {
            val n = body.charAt(i + 1)
            n match {
              case 'n' => out.write('\n'); i += 2
              case 'r' => out.write('\r'); i += 2
              case 't' => out.write('\t'); i += 2
              case 'b' => out.write('\b'); i += 2
              case 'f' => out.write('\f'); i += 2
              case d if d >= '0' && d <= '7' =>
                val oct = body.substring(i + 1, math.min(i + 4, body.length))
                  .takeWhile(ch => ch >= '0' && ch <= '7')
                out.write(Integer.parseInt(oct, 8)); i += 1 + oct.length
              case other => out.write(other.toInt); i += 2
            }
          } else if (c == '(') { depth += 1; out.write(c.toInt); i += 1 }
          else if (c == ')') { depth -= 1; if (depth > 0) out.write(c.toInt); i += 1 }
          else { out.write(c.toInt); i += 1 }
        }
        Some(out.toByteArray)
      case _ => None
    }
  }

  /** The /Encrypt dict body with its /CF crypt-filter SUBDICT removed:
    * dict keys are unordered, so a /CF << /StdCF << … /Length 16 >> >>
    * may precede the top-level /Length — a naive first-match /Length
    * would then derive a short file key (and for AES an invalid
    * Cipher.init length). Only top-level keys survive this strip. */
  private def stripCfSubdict(body: String): String = {
    val at = body.indexOf("/CF")
    if (at < 0) return body
    val start = body.indexOf("<<", at)
    if (start < 0) return body
    var depth = 0
    var i = start
    var end = -1
    while (i < body.length - 1 && end < 0) {
      if (body.startsWith("<<", i)) { depth += 1; i += 2 }
      else if (body.startsWith(">>", i)) { depth -= 1; i += 2; if (depth == 0) end = i }
      else i += 1
    }
    if (end < 0) body else body.substring(0, at) + body.substring(end)
  }

  /** Resolve the trailer's /Encrypt dictionary to a [[Crypto]], when the
    * document is encrypted with a supported handler (standard filter,
    * /V ≤ 4). The /Encrypt dict's own strings are never encrypted.
    *
    * Robustness contract (PDF dict keys are unordered, writers vary):
    * /AESV2 always derives a 16-byte key (128-bit per spec) regardless
    * of any parsed /Length; RC4's /Length is read only OUTSIDE the /CF
    * subdict (default 40); /P accepts the unsigned-decimal form some
    * writers emit (toLong wrap). Candidate keys — the empty password
    * first, then each caller-supplied password — are validated against
    * /U (Algorithm 4/5), so a document whose password we don't hold
    * yields None (pages extract empty) instead of a wrong key whose
    * garbage plaintext would blow up the filter decoders. A document
    * without a parseable /U keeps the empty-password key unvalidated
    * (the legacy tolerant path; per-stream decode is exception-guarded
    * either way). */
  private[ingest] def cryptoOf(raw: String,
                               passwords: Seq[String] = Nil): Option[Crypto] =
    for {
      em <- """/Encrypt\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(raw)
      // (?<!\d) anchors the object number at a LEFT token boundary too:
      // without it "12 0 obj" matches inside "112 0 obj" and the wrong
      // body silently fails key derivation for a perfectly good document
      body <- ("""(?<!\d)""" + em.group(1) + """\s+\d+\s+obj\b([\s\S]*?)endobj""").r
        .findFirstMatchIn(raw).map(_.group(1))
      if body.contains("/Standard")
      v = """/V\s+(\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt).getOrElse(0)
      if v >= 1 && v <= 5
      // /V ≥ 4 routes stream bytes through the named /StmF crypt filter;
      // /Identity — which is also the SPEC DEFAULT when /StmF is absent
      // (§7.6.5) — or a named filter whose /CFM is /None means stream
      // bytes are NOT encrypted: yield no Crypto so filter decode runs
      // directly on the stored bytes
      if !(v >= 4 && streamFilterIsIdentity(body))
      // password ENCODING is per handler: /V ≤ 4's Algorithm 2 pads
      // PDFDocEncoding bytes (≈ Latin-1 for the practical range), while
      // ISO 32000-2's 2.A hashes UTF-8 — a Latin-1 "café" would fail on
      // every conforming AES-256 document. The UTF-8 path also keeps a
      // Latin-1 candidate for non-conforming writers.
      key <- if (v == 5)
               aes256Key(body, passwords.flatMap(pw => Seq(
                 pw.getBytes(java.nio.charset.StandardCharsets.UTF_8),
                 pw.getBytes(Iso))))
             else classicKey(raw, body, v, passwords.map(_.getBytes(Iso)))
    } yield Crypto(key._1, key._2)

  /** True when the /StmF stream crypt filter resolves to identity:
    * /StmF absent (spec default Identity), /StmF /Identity, or the named
    * filter's /CFM is /None. Only consulted for /V ≥ 4 (crypt filters
    * don't exist below). */
  private[ingest] def streamFilterIsIdentity(body: String): Boolean =
    """/StmF\s*/([A-Za-z0-9.]+)""".r.findFirstMatchIn(body).map(_.group(1)) match {
      case None => true
      case Some("Identity") => true
      case Some(name) =>
        (s"/$name\\s*<<([\\s\\S]*?)>>").r.findFirstMatchIn(body)
          .exists(m => """/CFM\s*/None""".r.findFirstIn(m.group(1)).isDefined)
    }

  /** /V ≤ 4 key resolution (RC4 and AES-128 — MD5/Algorithm-2 family). */
  private def classicKey(raw: String, body: String, v: Int,
                         passwords: Seq[Array[Byte]]): Option[(Array[Byte], Boolean)] =
    for {
      o <- stringAfter(body, "/O")
      p <- """/P\s+(-?\d+)""".r.findFirstMatchIn(body)
        .flatMap(m => scala.util.Try(m.group(1).toLong.toInt).toOption)
      r = """/R\s+(\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt).getOrElse(2)
      aes = v == 4 && body.contains("/AESV2")
      lenBits = if (aes) 128
        else """/Length\s+(\d+)""".r.findFirstMatchIn(stripCfSubdict(body))
          .map(_.group(1).toInt).getOrElse(40)
      id0 = """/ID\s*\[\s*<([0-9A-Fa-f]+)>""".r.findFirstMatchIn(raw)
        .map(_.group(1).grouped(2).filter(_.length == 2)
          .map(h => Integer.parseInt(h, 16).toByte).toArray)
        .getOrElse(Array.emptyByteArray)
      key <- {
        // each supplied password is tried BOTH ways: as the user password
        // directly, and as the OWNER password via Algorithm 7 (decrypt /O
        // to recover the padded user password) — all candidates validate
        // against /U, so a wrong guess on either path yields nothing
        val candidates = (Array.emptyByteArray +: passwords) ++
          passwords.map(pw => PdfCrypto.userPadFromOwner(pw, o, r, lenBits))
        stringAfter(body, "/U") match {
          case Some(u) if u.length >= 16 =>
            candidates.iterator
              .map(pw => PdfCrypto.fileKey(o, p, id0, r, lenBits, password = pw))
              .find(k => PdfCrypto.checkUser(k, id0, r, u))
          case _ => Some(PdfCrypto.fileKey(o, p, id0, r, lenBits))
        }
      }
    } yield (key, aes)

  /** /V 5 key resolution (AES-256, /R 5 and /R 6 — the SHA-256/2.B
    * family): validate each candidate password against the 48-byte /U,
    * then recover the 32-byte file key by decrypting /UE. No id0, no /P
    * mixing — the key is independent of the document. */
  private def aes256Key(body: String,
                        passwords: Seq[Array[Byte]]): Option[(Array[Byte], Boolean)] =
    for {
      u <- stringAfter(body, "/U")
      if u.length >= 48
      ue <- stringAfter(body, "/UE")
      if ue.length >= 32
      r = """/R\s+(\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt).getOrElse(6)
      if r == 5 || r == 6
      pw <- (Array.emptyByteArray +: passwords).iterator
        .find(pw => PdfCrypto.checkUserAes256(r, pw, u))
    } yield (PdfCrypto.aes256FileKey(r, pw, u, ue), true)

  /** What the interpreter needs per resource font: the weight
    * (FPDFText_GetFontWeight analog, pdf_processor.cpp:93) and the
    * optional /FirstChar-based width table (1/1000-em advances) for
    * simple fonts — or, for /Type0 composite fonts, the 2-byte decode
    * tables: per-CID advances (/W + /DW, in ems) and the code→unicode
    * map from the /ToUnicode CMap. */
  private[ingest] final case class FontInfo(weight: Int, firstChar: Int,
                                            widths: Option[Vector[Double]],
                                            composite: Boolean = false,
                                            cidWidths: Map[Int, Double] = Map.empty,
                                            defaultWEm: Double = 1.0,
                                            toUnicode: Map[Int, String] = Map.empty,
                                            codeToCid: Map[Int, Int] = Map.empty,
                                            // simple-font code → unicode from /Encoding
                                            // /Differences (AGL names) overlaid by a
                                            // /ToUnicode CMap; unmapped codes keep the
                                            // raw-byte fallback
                                            codeToUnicode: Map[Int, String] = Map.empty,
                                            // /Widths multiplier: 1/1000 for Type1/
                                            // TrueType glyph space; Type3 substitutes
                                            // its /FontMatrix horizontal scale
                                            widthScale: Double = 0.001)
  private val DefaultFont = FontInfo(400, 0, None)

  /** Resource font name (/F1 …) → [[FontInfo]], resolved through the
    * document's font objects: /BaseFont names containing "Bold" map to
    * 700; /Widths is honored inline or as an indirect array reference. */
  private def fontInfos(raw: String, crypto: Option[Crypto] = None): Map[String, FontInfo] = {
    // objectBodies resolves incremental-save duplicates to the NEWEST
    // copy before this map is built, so an updated font wins here.
    val bodies = objectBodies(raw).toMap
    def widthTable(body: String): Option[(Int, Vector[Double])] = {
      val first = """/FirstChar\s+(\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt)
      val inline = """/Widths\s*\[([^\]]*)\]""".r.findFirstMatchIn(body).map(_.group(1))
      val indirect = """/Widths\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(body)
        .flatMap(m => bodies.get(m.group(1)))
        .flatMap(b => """\[([^\]]*)\]""".r.findFirstMatchIn(b).map(_.group(1)))
      (first, inline.orElse(indirect)) match {
        case (Some(f), Some(arr)) =>
          // positional integrity: silently dropping one unparsable entry
          // would shift every later width onto the wrong char code — an
          // array we can't fully parse falls back to default advances
          val ws = arr.trim.split("\\s+").filter(_.nonEmpty)
            .map(s => scala.util.Try(s.toDouble).toOption)
          if (ws.nonEmpty && ws.forall(_.isDefined)) Some((f, ws.flatten.toVector))
          else None
        case _ => None
      }
    }
    val objInfo: Map[String, FontInfo] = bodies.flatMap { case (num, body) =>
      val base = """/BaseFont\s*/([A-Za-z0-9+-]+)""".r.findFirstMatchIn(body)
      val bold = base.exists(_.group(1).toLowerCase.contains("bold"))
      // /BaseFont is OPTIONAL for /Type3 fonts (PDF §9.6.4) — keying the
      // font table on it alone would drop every Type3 font to the raw-byte
      // default, which is wrong precisely when the font carries a
      // /Differences code remap
      if ("""/Subtype\s*/Type3""".r.findFirstIn(body).isDefined)
        Some(num -> type3Info(body, bold, bodies, crypto, widthTable(body)))
      else base.map { _ =>
        if ("""/Subtype\s*/Type0""".r.findFirstIn(body).isDefined)
          num -> type0Info(body, bold, bodies, crypto)
        else {
          val wt = widthTable(body)
          num -> FontInfo(if (bold) 700 else 400,
            wt.map(_._1).getOrElse(0), wt.map(_._2),
            codeToUnicode = simpleCodeMap(body, bodies, crypto))
        }
      }
    }
    """/Font\s*<<([^>]*)>>""".r.findAllMatchIn(raw).flatMap { fm =>
      """/([A-Za-z0-9]+)\s+(\d+)\s+0\s+R""".r.findAllMatchIn(fm.group(1))
        .map(rm => rm.group(1) -> objInfo.getOrElse(rm.group(2), DefaultFont))
    }.toMap
  }

  // ---- /Type3 + simple-font encoding resolution ----

  /** Resolve a /Type3 font: codes map to glyph names via /Encoding
    * /Differences (names resolve through the Adobe Glyph List ASCII
    * subset, [[AdobeGlyphs]]), optionally corrected by a /ToUnicode CMap;
    * /Widths entries are GLYPH-space units scaled by the /FontMatrix
    * horizontal term (PDF §9.6.4) instead of the simple-font 1/1000.
    * /CharProcs glyph-drawing streams are never interpreted — only the
    * page /Contents streams are, so glyph procs are structurally inert
    * here, exactly as for pdf_processor.cpp:88-95's PDFium text API. */
  private def type3Info(body: String, bold: Boolean,
                        bodies: Map[String, String],
                        crypto: Option[Crypto],
                        wt: Option[(Int, Vector[Double])]): FontInfo = {
    val scale = """/FontMatrix\s*\[\s*(-?\d*\.?\d+)""".r.findFirstMatchIn(body)
      .flatMap(m => scala.util.Try(m.group(1).toDouble).toOption)
      .filter(s => s > 0 && s.isFinite)
      .getOrElse(0.001)
    FontInfo(if (bold) 700 else 400, wt.map(_._1).getOrElse(0), wt.map(_._2),
      widthScale = scale,
      codeToUnicode = simpleCodeMap(body, bodies, crypto))
  }

  /** Simple-font (Type1/TrueType/Type3) code → unicode overrides:
    * /Encoding /Differences entries (inline dict or indirect object)
    * resolved through [[AdobeGlyphs]], then overlaid by the font's
    * /ToUnicode CMap when present — ToUnicode wins per code, which is
    * also the escape hatch for Differences names outside the glyph-list
    * subset (Type3 writers often emit opaque /gNN names). Codes mapped by
    * neither keep the raw-byte fallback in show(). */
  private def simpleCodeMap(body: String, bodies: Map[String, String],
                            crypto: Option[Crypto]): Map[Int, String] = {
    val encBody = """/Encoding\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(body)
      .flatMap(m => bodies.get(m.group(1))).getOrElse(body)
    val diffs = """/Differences\s*\[""".r.findFirstMatchIn(encBody)
      .map(m => parseDifferences(balancedArray(encBody, m.end - 1)))
      .getOrElse(Map.empty[Int, String])
    val toUni = """/ToUnicode\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(body)
      .flatMap(m => bodies.get(m.group(1)).map(b => (m.group(1).toInt, b)))
      .map { case (num, b) => streamPayload(num, b, crypto) }
      .map(parseToUnicode).getOrElse(Map.empty[Int, String])
    diffs ++ toUni
  }

  /** /Differences array (PDF §9.6.5.1): an integer sets the next code,
    * each following /name maps one consecutive code. Names that don't
    * resolve through the glyph list are skipped (code still advances) —
    * the raw-byte fallback is less wrong than dropping the glyph. */
  private[graft] def parseDifferences(inner: String): Map[Int, String] = {
    val out = Map.newBuilder[Int, String]
    var code = 0
    """/[^\s/\[\]<>()]+|\d+""".r.findAllIn(inner).foreach { t =>
      if (t.startsWith("/")) {
        AdobeGlyphs.unicode(t.drop(1)).foreach(u => out += code -> u)
        code += 1
      } else scala.util.Try(t.toInt).foreach(code = _)
    }
    out.result()
  }

  // ---- composite (/Type0 Identity-H) font resolution ----

  /** Resolve a /Type0 font: descendant CIDFontType2's /W + /DW give
    * per-CID advances; the /ToUnicode CMap stream gives code → unicode.
    * pdf_processor.cpp:88-95 gets all of this from PDFium for free — this
    * is the JDK-only equivalent for the Identity-H subset. */
  private def type0Info(body: String, bold: Boolean,
                        bodies: Map[String, String],
                        crypto: Option[Crypto] = None): FontInfo = {
    val desc = """/DescendantFonts\s*\[\s*(\d+)\s+0\s+R\s*\]""".r
      .findFirstMatchIn(body).map(_.group(1))
      .orElse("""/DescendantFonts\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(body)
        .flatMap(m => bodies.get(m.group(1)))
        .flatMap(b => """(\d+)\s+0\s+R""".r.findFirstMatchIn(b).map(_.group(1))))
      .flatMap(bodies.get)
    val dw = desc
      .flatMap(b => """/DW\s+(\d+(?:\.\d+)?)""".r.findFirstMatchIn(b).map(_.group(1).toDouble))
      .getOrElse(1000.0)
    val wInner = desc.flatMap { b =>
      """/W\s*\[""".r.findFirstMatchIn(b)
        .map(m => balancedArray(b, m.end - 1))
        .orElse("""/W\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(b)
          .flatMap(m => bodies.get(m.group(1)))
          .flatMap(wb => """\[""".r.findFirstMatchIn(wb).map(m => balancedArray(wb, m.start))))
    }
    val toUni = """/ToUnicode\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(body)
      .flatMap(m => bodies.get(m.group(1)).map(b => (m.group(1).toInt, b)))
      .map { case (num, b) => streamPayload(num, b, crypto) }
      .map(parseToUnicode).getOrElse(Map.empty[Int, String])
    // /Encoding: the name /Identity-H is the identity code→CID map; an
    // INDIRECT reference is an embedded CMap STREAM whose cidrange/
    // cidchar sections remap 2-byte codes to CIDs (PDF §9.7.5.3) —
    // /W advances are keyed by the CID, /ToUnicode stays keyed by the
    // CODE. Identity-V and named predefined CMaps remain out of subset
    // (they fall through to the identity map, the documented fallback).
    val cidMap = """/Encoding\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(body)
      .flatMap(m => bodies.get(m.group(1)).map(b => (m.group(1).toInt, b)))
      .map { case (num, b) => streamPayload(num, b, crypto) }
      .map(parseCidMap).getOrElse(Map.empty[Int, Int])
    FontInfo(if (bold) 700 else 400, 0, None,
      composite = true,
      cidWidths = wInner.map(parseWArray).getOrElse(Map.empty),
      defaultWEm = dw / 1000.0,
      toUnicode = toUni,
      codeToCid = cidMap)
  }

  /** The inner text of a balanced `[ … ]` starting at `open` (which must
    * index a '['), nested sub-arrays included. */
  private def balancedArray(s: String, open: Int): String = {
    var depth = 0
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '[') depth += 1
      else if (c == ']') { depth -= 1; if (depth == 0) return s.substring(open + 1, i) }
      i += 1
    }
    s.substring(math.min(open + 1, s.length))
  }

  /** /W array (PDF §9.7.4.3): `c [w1 w2 …]` assigns consecutive widths
    * from CID c; `cFirst cLast w` assigns w across the range. Returns
    * CID → em advance. */
  private[ingest] def parseWArray(inner: String): Map[Int, Double] = {
    val toks = """\[[^\]]*\]|-?\d+(?:\.\d+)?""".r.findAllIn(inner).toSeq
    val out = Map.newBuilder[Int, Double]
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (!t.startsWith("[") && i + 1 < toks.length && toks(i + 1).startsWith("[")) {
        val start = t.toDouble.toInt
        """-?\d+(?:\.\d+)?""".r.findAllIn(toks(i + 1)).zipWithIndex
          .foreach { case (w, k) => out += (start + k) -> w.toDouble / 1000.0 }
        i += 2
      } else if (!t.startsWith("[") && i + 2 < toks.length &&
                 !toks(i + 1).startsWith("[") && !toks(i + 2).startsWith("[")) {
        val lo = t.toDouble.toInt
        val hi = toks(i + 1).toDouble.toInt
        val w = toks(i + 2).toDouble / 1000.0
        var c = lo
        while (c <= hi) { out += c -> w; c += 1 }
        i += 3
      } else i += 1 // malformed tail: skip rather than shift later entries
    }
    out.result()
  }

  /** Decoded payload of a stream OBJECT body (dict + `stream…endstream`),
    * decrypted under objnum `num` when the document is encrypted, then
    * inflated/LZW-decoded per filter — ISO_8859_1 round-trips bytes
    * exactly. (The bodies map only indexes gen-0 objects, so gen = 0.) */
  private def streamPayload(num: Int, body: String, crypto: Option[Crypto]): String = {
    val s = body.indexOf("stream")
    val e = body.lastIndexOf("endstream")
    if (s < 0 || e <= s) return ""
    var dataStart = s + "stream".length
    if (dataStart < body.length && body.charAt(dataStart) == '\r') dataStart += 1
    if (dataStart < body.length && body.charAt(dataStart) == '\n') dataStart += 1
    var dataEnd = e
    if (dataEnd > dataStart && body.charAt(dataEnd - 1) == '\n') dataEnd -= 1
    if (dataEnd > dataStart && body.charAt(dataEnd - 1) == '\r') dataEnd -= 1
    val bytes0 = body.substring(dataStart, dataEnd).getBytes(Iso)
    val bytes = crypto match {
      case Some(c) => PdfCrypto.decrypt(c.key, num, 0, c.aes, bytes0)
      case None => bytes0
    }
    val dict = body.substring(0, s)
    if (dict.contains("FlateDecode")) new String(applyPredictor(dict, inflate(bytes)), Iso)
    else if (dict.contains("LZWDecode")) new String(applyPredictor(dict, lzwDecode(bytes)), Iso)
    else new String(bytes, Iso)
  }

  /** /ToUnicode CMap: bfchar entries map one code; bfrange entries map a
    * code range to an incremented base (last UTF-16 unit advances, per
    * spec) or to an explicit array of targets. Targets are UTF-16BE hex. */
  private[ingest] def parseToUnicode(cmap: String): Map[Int, String] = {
    val out = scala.collection.mutable.Map.empty[Int, String]
    def uniOf(hex: String): String =
      hex.grouped(4).filter(_.length == 4).map(h => Integer.parseInt(h, 16).toChar).mkString
    for (sec <- """beginbfrange([\s\S]*?)endbfrange""".r.findAllMatchIn(cmap);
         m <- """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[[\s\S]*?\]|<[0-9A-Fa-f]+>)""".r
           .findAllMatchIn(sec.group(1))) {
      val lo = Integer.parseInt(m.group(1), 16)
      val hi = Integer.parseInt(m.group(2), 16)
      val dst = m.group(3)
      if (dst.startsWith("[")) {
        """<([0-9A-Fa-f]+)>""".r.findAllMatchIn(dst).map(_.group(1)).zipWithIndex
          .foreach { case (h, k) => if (lo + k <= hi) out(lo + k) = uniOf(h) }
      } else {
        val base = uniOf(dst.drop(1).dropRight(1))
        if (base.nonEmpty)
          for (c <- lo to hi) out(c) = base.init + (base.last + (c - lo)).toChar
      }
    }
    for (sec <- """beginbfchar([\s\S]*?)endbfchar""".r.findAllMatchIn(cmap);
         m <- """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r.findAllMatchIn(sec.group(1)))
      out(Integer.parseInt(m.group(1), 16)) = uniOf(m.group(2))
    out.toMap
  }

  /** Embedded /Encoding CMap (PDF §9.7.5.3): `begincidrange` entries map
    * `<lo> <hi> cidFirst` code ranges to consecutive CIDs; `begincidchar`
    * entries map one `<code> cid`. CIDs are plain decimal integers (not
    * hex strings, unlike bf* targets). Returns code → CID. */
  private[ingest] def parseCidMap(cmap: String): Map[Int, Int] = {
    // MALFORMED-INPUT guard, same contract as stream decode: a CMap with
    // an overflowing CID literal or an absurd range must degrade to "no
    // remap" for the entries it breaks, never kill the ingest task. Codes
    // are 2 bytes in this subset, so a well-formed range spans ≤ 0x10000
    // entries — anything wider is clamped (a hostile <00000000> <7FFFFFF0>
    // range would otherwise expand ~2^31 map entries).
    val out = scala.collection.mutable.Map.empty[Int, Int]
    for (sec <- """begincidrange([\s\S]*?)endcidrange""".r.findAllMatchIn(cmap);
         m <- """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s+(\d+)""".r.findAllMatchIn(sec.group(1)))
      scala.util.Try {
        val lo = Integer.parseInt(m.group(1), 16)
        val hi = math.min(Integer.parseInt(m.group(2), 16), lo + 0xFFFF)
        val cid0 = m.group(3).toInt
        var c = lo
        while (c <= hi) { out(c) = cid0 + (c - lo); c += 1 }
      }
    for (sec <- """begincidchar([\s\S]*?)endcidchar""".r.findAllMatchIn(cmap);
         m <- """<([0-9A-Fa-f]+)>\s+(\d+)""".r.findAllMatchIn(sec.group(1)))
      scala.util.Try(out(Integer.parseInt(m.group(1), 16)) = m.group(2).toInt)
    out.toMap
  }

  // ---- document structure ----

  /** Top-level `n g obj … endobj` bodies in document order, with
    * incremental-save precedence (PDF §7.5.6: an update APPENDS a new
    * copy of the object — same number, usually same generation — and the
    * newest xref section points at it; PDFium resolves the same question
    * through the real xref chain behind pdf_processor.cpp:23-407). The
    * extractor scans objects directly and needs no xref table, so
    * precedence is re-created structurally: for a duplicated object
    * number the LAST occurrence supplies the body (append-only files
    * grow newest-last) while the FIRST occurrence keeps the document
    * position, so page ORDER is unaffected by where the update landed. */
  private[ingest] def objectBodies(raw: String): Seq[(String, String)] = {
    // Last-wins precedence makes a SPURIOUS `n g obj…endobj` byte pattern
    // inside compressed/encrypted stream data dangerous: it would REPLACE
    // the real object's body instead of merely adding noise. A real object
    // header can never begin inside stream data, so matches starting
    // inside any stream…endstream payload span are excluded.
    val inStream = streamDataRanges(raw)
    def insideStream(pos: Int): Boolean =
      inStream.exists { case (s, e) => pos >= s && pos < e }
    val ms = """(\d+)\s+\d+\s+obj\b([\s\S]*?)endobj""".r.findAllMatchIn(raw)
      .filterNot(m => insideStream(m.start))
      .map(m => m.group(1) -> m.group(2)).toSeq
    val lastByNum = ms.toMap // Scala toMap keeps the LAST duplicate key
    val seen = scala.collection.mutable.HashSet.empty[String]
    ms.collect { case (num, _) if seen.add(num) => num -> lastByNum(num) }
  }

  /** [dataStart, dataEnd) spans of every stream…endstream payload,
    * offsets only. Unlike [[rawStreams]]'s permissive walk, the keyword
    * here is ANCHORED: `stream` must directly follow the stream
    * dictionary's `>>` (whitespace allowed) and be terminated by an EOL
    * (ISO 32000-1 §7.3.8.1). These spans EXCLUDE objects from
    * [[objectBodies]], so a bare-substring match would be worse than a
    * miss — a literal "stream" in a name/comment/string outside a real
    * stream would open a bogus span that silently DROPS every real
    * object inside it. A span missed here merely restores the
    * pre-hardening noise exposure for that one payload. */
  private val StreamKeyword =
    java.util.regex.Pattern.compile(""">>[ \t\r\n\f]*stream(\r\n|\n|\r)""")
  private def streamDataRanges(raw: String): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    val m = StreamKeyword.matcher(raw)
    var from = 0
    var done = false
    while (!done && from <= raw.length - 1 && m.find(from)) {
      val dataStart = m.end // just past the keyword's EOL
      val e = raw.indexOf("endstream", dataStart)
      if (e < 0) done = true
      else { out += ((dataStart, e)); from = e + "endstream".length }
    }
    out.result()
  }

  private def mediaBoxes(raw: String): Seq[(Double, Double)] =
    objectBodies(raw).map(_._2).flatMap { body =>
      """/MediaBox\s*\[\s*([\d.-]+)\s+([\d.-]+)\s+([\d.-]+)\s+([\d.-]+)\s*\]""".r
        .findFirstMatchIn(body)
        .map(m => (m.group(3).toDouble - m.group(1).toDouble,
                   m.group(4).toDouble - m.group(2).toDouble))
    }

  /** One top-level stream object: its (objnum, gen), the owning
    * dictionary text, and the raw (still encoded/encrypted) data bytes. */
  private final case class RawStream(num: Int, gen: Int, dict: String, data: Array[Byte])

  /** Every top-level stream object in document order. Data begins after
    * "stream" + EOL (spec: CRLF/LF); the object id comes from the
    * `n g obj` header before the dictionary (needed for the per-object
    * decryption key). */
  private def rawStreams(content: Array[Byte], raw: String): Seq[RawStream] = {
    val out = Seq.newBuilder[RawStream]
    var from = 0
    while ({ val s = raw.indexOf("stream", from); s >= 0 && raw.indexOf("endstream", s) >= 0 }) {
      val s = raw.indexOf("stream", from)
      val e = raw.indexOf("endstream", s)
      var dataStart = s + "stream".length
      if (dataStart < raw.length && raw.charAt(dataStart) == '\r') dataStart += 1
      if (dataStart < raw.length && raw.charAt(dataStart) == '\n') dataStart += 1
      var dataEnd = e
      if (dataEnd > dataStart && raw.charAt(dataEnd - 1) == '\n') dataEnd -= 1
      if (dataEnd > dataStart && raw.charAt(dataEnd - 1) == '\r') dataEnd -= 1
      // the owning object's header + dictionary: back up to the previous
      // "obj" keyword, then to the start of its `n g obj` id
      val objStart = math.max(raw.lastIndexOf("obj", s), 0)
      val idStart = math.max(raw.lastIndexOf("endobj", objStart) + "endobj".length, 0)
      val (num, gen) = """(\d+)\s+(\d+)\s+obj\b""".r
        .findAllMatchIn(raw.substring(idStart, math.min(objStart + 3, raw.length)))
        .toSeq.lastOption
        .map(m => (m.group(1).toInt, m.group(2).toInt)).getOrElse((0, 0))
      out += RawStream(num, gen, raw.substring(objStart, s),
        java.util.Arrays.copyOfRange(content, dataStart, dataEnd))
      from = e + "endstream".length
    }
    dedupeStreams(out.result())
  }

  /** Incremental-save precedence for STREAM objects (the page-content /
    * ObjStm analog of [[objectBodies]]): a re-saved stream appends a
    * newer copy under the same object number — the LAST occurrence wins,
    * at the FIRST occurrence's document position (page order must not
    * change because the update landed at the file's end). Streams whose
    * object header could not be parsed (num 0) pass through untouched. */
  private def dedupeStreams(sts: Seq[RawStream]): Seq[RawStream] = {
    val last = scala.collection.mutable.HashMap.empty[Int, RawStream]
    sts.foreach(st => if (st.num > 0) last(st.num) = st)
    val seen = scala.collection.mutable.HashSet.empty[Int]
    sts.flatMap { st =>
      if (st.num <= 0) Some(st)
      else if (seen.add(st.num)) Some(last(st.num))
      else None
    }
  }

  /** Decrypt (when the document is encrypted) then filter-decode one
    * stream's bytes. Xref streams are never encrypted (spec §7.5.8.2);
    * /FlateDecode and /LZWDecode are the supported filters. EXCEPTION-
    * GUARDED per stream: an undecodable stream (unsupported crypt
    * filter, corrupt bytes — Inflater and Cipher both throw) degrades to
    * an empty page instead of failing the whole Spark ingest task; one
    * bad PDF must never kill the job. */
  private def decodeStream(st: RawStream, crypto: Option[Crypto]): Array[Byte] =
    try {
      val dec = crypto match {
        case Some(c) if !st.dict.contains("/XRef") =>
          PdfCrypto.decrypt(c.key, st.num, st.gen, c.aes, st.data)
        case _ => st.data
      }
      if (st.dict.contains("FlateDecode")) applyPredictor(st.dict, inflate(dec))
      else if (st.dict.contains("LZWDecode")) applyPredictor(st.dict, lzwDecode(dec))
      else dec
    } catch {
      case scala.util.control.NonFatal(_) => Array.emptyByteArray
    }

  /** Decoded content streams (those containing a BT text block), in
    * document order. Structural streams — /ObjStm object streams and
    * /XRef cross-reference streams — are never page content; their decoded
    * binary could contain accidental "BT" bytes, so they are excluded by
    * dictionary type. */
  private def contentStreams(content: Array[Byte], raw: String,
                             crypto: Option[Crypto]): Seq[String] =
    rawStreams(content, raw).flatMap { st =>
      if (st.dict.contains("/ObjStm") || st.dict.contains("/XRef")) None
      else {
        val decoded = new String(decodeStream(st, crypto), Iso)
        if (decoded.contains("BT")) Some(decoded) else None
      }
    }

  /** PDF 1.5+ object streams: each /ObjStm is inflated and its packed
    * objects are re-materialized as `n 0 obj … endobj` text appended to
    * the scannable object space. Layout per spec §7.5.7: /N (objnum,
    * offset) integer pairs before /First, then the objects back to back
    * with offsets relative to /First. */
  private def expandObjectStreams(content: Array[Byte], raw: String,
                                  crypto: Option[Crypto]): String = {
    val extra = new StringBuilder
    rawStreams(content, raw).foreach { st =>
      if (st.dict.contains("/ObjStm")) {
        val dict = st.dict
        val decoded = new String(decodeStream(st, crypto), Iso)
        val n = """/N\s+(\d+)""".r.findFirstMatchIn(dict).map(_.group(1).toInt).getOrElse(0)
        val first = """/First\s+(\d+)""".r.findFirstMatchIn(dict).map(_.group(1).toInt).getOrElse(0)
        if (n > 0 && first > 0 && first <= decoded.length) {
          val header = decoded.take(first).trim.split("\\s+").filter(_.nonEmpty)
          val pairs = header.grouped(2).take(n).collect {
            case Array(num, off) if num.forall(_.isDigit) && off.forall(_.isDigit) =>
              (num, off.toInt)
          }.toSeq
          pairs.zipWithIndex.foreach { case ((num, off), k) =>
            val start = math.min(first + off, decoded.length)
            val end =
              if (k + 1 < pairs.size) math.min(first + pairs(k + 1)._2, decoded.length)
              else decoded.length
            if (start < end)
              extra.append('\n').append(num).append(" 0 obj\n")
                .append(decoded.substring(start, end)).append("\nendobj\n")
          }
        }
      }
    }
    if (extra.isEmpty) raw else raw + extra
  }

  /** /DecodeParms predictor post-pass (PDF §7.4.4.4; PDFium's parity
    * path behind pdf_processor.cpp:23 handles the same chain): TIFF
    * /Predictor 2 (horizontal byte differencing) and PNG predictors
    * 10–15 (RFC 2083 §6 — each row is prefixed with ITS OWN filter-type
    * byte 0–4, which the decoder must honor regardless of the declared
    * predictor value). /Columns, /Colors, /BitsPerComponent default to
    * 1/1/8; a /Predictor ≤ 1 (or no /DecodeParms) is the identity. A
    * short final row is unfiltered over its actual length (writers that
    * don't pad). Predictor-compressed CONTENT streams are rare but
    * legal — before round 8 such a stream extracted nothing. */
  private[graft] def applyPredictor(dict: String, data: Array[Byte]): Array[Byte] = {
    val parms = """/(?:DecodeParms|DP)\s*<<([\s\S]*?)>>""".r
      .findFirstMatchIn(dict).map(_.group(1)).getOrElse(return data)
    def intOf(key: String, dflt: Int): Int =
      (s"""/$key\\s+(\\d+)""").r.findFirstMatchIn(parms).map(_.group(1).toInt).getOrElse(dflt)
    val predictor = intOf("Predictor", 1)
    if (predictor <= 1 || data.isEmpty) return data
    val columns = math.max(1, intOf("Columns", 1))
    val colors = math.max(1, intOf("Colors", 1))
    val bpc = math.max(1, intOf("BitsPerComponent", 8))
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = ((colors.toLong * bpc * columns + 7) / 8).toInt
    if (predictor == 2) {
      // TIFF horizontal differencing (byte-aligned components only —
      // sub-byte bpc differencing is not used by content streams)
      if (bpc != 8) return data
      val out = data.clone()
      var r = 0
      while (r < out.length) {
        val end = math.min(r + rowLen, out.length)
        var i = r + bpp
        while (i < end) { out(i) = (out(i) + out(i - bpp)).toByte; i += 1 }
        r = end
      }
      out
    } else {
      // PNG: rows of (filterByte + rowLen), each unfiltered against the
      // previous RECONSTRUCTED row
      val out = new java.io.ByteArrayOutputStream(data.length)
      var prev = new Array[Byte](rowLen)
      var pos = 0
      while (pos < data.length) {
        val ft = data(pos) & 0xff; pos += 1
        val len = math.min(rowLen, data.length - pos)
        val cur = java.util.Arrays.copyOfRange(data, pos, pos + len); pos += len
        var i = 0
        while (i < len) {
          val a = if (i >= bpp) cur(i - bpp) & 0xff else 0 // left (reconstructed)
          val b = prev(i) & 0xff                           // up
          val c = if (i >= bpp) prev(i - bpp) & 0xff else 0 // up-left
          val x = cur(i) & 0xff
          cur(i) = (ft match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + (a + b) / 2
            case 4 => // Paeth
              val p = a + b - c
              val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
              x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            case _ => x // unknown filter byte: pass through
          }).toByte
          i += 1
        }
        out.write(cur, 0, len)
        prev = if (len == rowLen) cur else java.util.Arrays.copyOf(cur, rowLen)
      }
      out.toByteArray
    }
  }

  /** /LZWDecode (PDF §7.4.4): MSB-first variable-width codes 9→12 bits,
    * 256 = clear table, 257 = EOD, default EarlyChange = 1 (the width
    * bumps one code BEFORE the table would overflow — the off-by-one
    * that distinguishes PDF/TIFF LZW from GIF). */
  private[ingest] def lzwDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 3)
    // table entries 0..255 are single bytes; 256/257 reserved
    var table = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def resetTable(): Unit = {
      table = scala.collection.mutable.ArrayBuffer.tabulate(258)(i =>
        if (i < 256) Array(i.toByte) else Array.emptyByteArray)
    }
    resetTable()
    var width = 9
    var acc = 0L
    var accBits = 0
    var prev: Array[Byte] = null
    var i = 0
    var done = false
    while (i < data.length && !done) {
      acc = (acc << 8) | (data(i) & 0xff)
      accBits += 8
      i += 1
      while (accBits >= width && !done) {
        val code = ((acc >> (accBits - width)) & ((1 << width) - 1)).toInt
        accBits -= width
        if (code == 257) done = true // EOD
        else if (code == 256) { resetTable(); width = 9; prev = null }
        else {
          val entry =
            if (code < table.length) table(code)
            else if (prev != null && code == table.length) prev :+ prev(0) // KwKwK
            else { done = true; Array.emptyByteArray } // corrupt: stop
          if (!done) {
            out.write(entry, 0, entry.length)
            if (prev != null) table += (prev :+ entry(0))
            prev = entry
            // EarlyChange=1: widen one code early (at 511/1023/2047)
            if (table.length + 1 >= (1 << width) && width < 12) width += 1
          }
        }
      }
    }
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  // ---- content-stream text interpreter ----

  private sealed trait Tok
  private final case class Num(v: Double) extends Tok
  private final case class Str(s: String) extends Tok
  private final case class Name(s: String) extends Tok
  private case object ArrStart extends Tok
  private case object ArrEnd extends Tok
  private final case class Op(s: String) extends Tok

  private def tokenize(s: String): Iterator[Tok] = new Iterator[Tok] {
    private var i = 0
    private def skipWs(): Unit = { while (i < s.length && s.charAt(i).isWhitespace) i += 1 }
    override def hasNext: Boolean = { skipWs(); i < s.length }
    override def next(): Tok = {
      skipWs()
      val c = s.charAt(i)
      if (c == '(') { i += 1; Str(literalString()) }
      else if (c == '<' && i + 1 < s.length && s.charAt(i + 1) == '<') {
        // inline dictionary (BDC property lists …): skip balanced << >>
        var depth = 0
        while (i < s.length && (depth > 0 || s.startsWith("<<", i))) {
          if (s.startsWith("<<", i)) { depth += 1; i += 2 }
          else if (s.startsWith(">>", i)) { depth -= 1; i += 2 }
          else i += 1
        }
        Op("<<dict>>")
      } else if (c == '<') {
        // hex string <…>: whitespace ignored, odd length padded with 0
        i += 1
        val j = i
        while (i < s.length && s.charAt(i) != '>') i += 1
        val hex = s.substring(j, i).filter(ch =>
          (ch >= '0' && ch <= '9') || (ch >= 'a' && ch <= 'f') || (ch >= 'A' && ch <= 'F'))
        if (i < s.length) i += 1 // consume '>'
        val padded = if (hex.length % 2 == 1) hex + "0" else hex
        Str(padded.grouped(2).map(h => Integer.parseInt(h, 16).toChar).mkString)
      }
      else if (c == '[') { i += 1; ArrStart }
      else if (c == ']') { i += 1; ArrEnd }
      else if (c == '/') {
        val j = i + 1
        i = j
        while (i < s.length && !s.charAt(i).isWhitespace && !"()[]/<>".contains(s.charAt(i))) i += 1
        Name(s.substring(j, i))
      } else if (c == '-' || c == '+' || c == '.' || c.isDigit) {
        val j = i
        i += 1
        while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        Num(s.substring(j, i).toDouble)
      } else {
        val j = i
        i += 1
        while (i < s.length && !s.charAt(i).isWhitespace && !"()[]/<>".contains(s.charAt(i))) i += 1
        Op(s.substring(j, i))
      }
    }
    /** Literal string body, cursor past '('; handles escapes + nesting. */
    private def literalString(): String = {
      val b = new StringBuilder
      var depth = 1
      while (i < s.length && depth > 0) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          val n = s.charAt(i + 1)
          n match {
            case 'n' => b.append('\n'); i += 2
            case 'r' => b.append('\r'); i += 2
            case 't' => b.append('\t'); i += 2
            case 'b' => b.append('\b'); i += 2
            case 'f' => b.append('\f'); i += 2
            case '(' | ')' | '\\' => b.append(n); i += 2
            case d if d >= '0' && d <= '7' =>
              val oct = s.substring(i + 1, math.min(i + 4, s.length)).takeWhile(ch => ch >= '0' && ch <= '7')
              b.append(Integer.parseInt(oct, 8).toChar); i += 1 + oct.length
            case '\n' => i += 2 // line continuation
            case _ => b.append(n); i += 2
          }
        } else if (c == '(') { depth += 1; b.append(c); i += 1 }
        else if (c == ')') { depth -= 1; if (depth > 0) b.append(c); i += 1 }
        else { b.append(c); i += 1 }
      }
      b.toString
    }
  }

  private def interpret(stream: String, fonts: Map[String, FontInfo] = Map.empty): Seq[Ch] = {
    val chars = Seq.newBuilder[Ch]
    var fontSize = 12.0
    var font = DefaultFont
    var leading = 0.0
    var lineX = 0.0; var lineY = 0.0 // line-start (Td/Tm/T* target)
    var curX = 0.0; var textY = 0.0
    val stack = scala.collection.mutable.ArrayBuffer.empty[Tok]
    var arr: scala.collection.mutable.ArrayBuffer[Tok] = null

    def nums(n: Int): Seq[Double] = {
      val vs = stack.takeRight(n).collect { case Num(v) => v }.toSeq
      stack.clear()
      vs
    }
    def show(str: String): Unit =
      if (font.composite) {
        // Type0/Identity-H: 2 bytes per glyph — code = CID; advance from
        // the /W table (else /DW); unicode from the /ToUnicode CMap (a
        // multi-char target, e.g. a ligature, splits the glyph advance)
        var k = 0
        while (k + 1 < str.length) {
          val code = ((str.charAt(k) & 0xff) << 8) | (str.charAt(k + 1) & 0xff)
          // embedded-CMap /Encoding remaps code → CID; Identity-H (empty
          // map) keeps code = CID. /W is CID-keyed, /ToUnicode CODE-keyed.
          val cid = font.codeToCid.getOrElse(code, code)
          val w = font.cidWidths.getOrElse(cid, font.defaultWEm) * fontSize
          val uni = font.toUnicode.getOrElse(code, code.toChar.toString)
          if (uni.nonEmpty) {
            val cw = w / uni.length
            uni.foreach { c =>
              chars += Ch(c, curX, textY + fontSize * 0.8, curX + cw, textY - fontSize * 0.2,
                fontSize, font.weight)
              curX += cw
            }
          } else curX += w // mapped to nothing: advance without a glyph
          k += 2
        }
        // a trailing odd byte (malformed/truncated Identity-H string) has
        // no code to decode — advance by the default width so any text
        // that follows in the same line isn't visually glued to it
        if (k < str.length) curX += font.defaultWEm * fontSize
      } else str.foreach { c =>
        // per-char advance from the font's /Widths table when present
        // (glyph space × widthScale: 1/1000, or Type3's /FontMatrix),
        // else the fixed-pitch approximation
        val em = font.widths match {
          case Some(ws) if c.toInt >= font.firstChar && c.toInt - font.firstChar < ws.length =>
            ws(c.toInt - font.firstChar) * font.widthScale
          case _ => defaultWidthEm
        }
        val w = em * fontSize
        // /Differences + /ToUnicode remap (Type3 and re-encoded simple
        // fonts); a multi-char target (ligature) splits the advance, same
        // as the composite branch
        val uni = font.codeToUnicode.getOrElse(c.toInt, c.toString)
        if (uni.nonEmpty) {
          val cw = w / uni.length
          uni.foreach { u =>
            chars += Ch(u, curX, textY + fontSize * 0.8, curX + cw, textY - fontSize * 0.2,
              fontSize, font.weight)
            curX += cw
          }
        } else curX += w // mapped to nothing: advance without a glyph
      }

    tokenize(stream).foreach {
      case ArrStart => arr = scala.collection.mutable.ArrayBuffer.empty[Tok]
      case ArrEnd => () // the collected array stays in `arr` for TJ
      case t: Num if arr != null => arr += t
      case t: Str if arr != null => arr += t
      case op: Op =>
        op.s match {
          case "BT" => lineX = 0; lineY = 0; curX = 0; textY = 0; stack.clear()
          case "ET" => stack.clear()
          case "Tf" =>
            stack.collectFirst { case Name(n) => n }.foreach { n =>
              font = fonts.getOrElse(n, FontInfo(
                if (n.toLowerCase.contains("bold")) 700 else 400, 0, None))
            }
            fontSize = nums(1).headOption.getOrElse(fontSize)
          case "Tm" =>
            val v = nums(6)
            if (v.size == 6) { lineX = v(4); lineY = v(5); curX = lineX; textY = lineY }
          case "Td" =>
            val v = nums(2)
            if (v.size == 2) { lineX += v(0); lineY += v(1); curX = lineX; textY = lineY }
          case "TD" =>
            val v = nums(2)
            if (v.size == 2) {
              leading = -v(1); lineX += v(0); lineY += v(1); curX = lineX; textY = lineY
            }
          case "TL" => leading = nums(1).headOption.getOrElse(leading)
          case "T*" => lineY -= leading; curX = lineX; textY = lineY; stack.clear()
          case "Tj" =>
            stack.collectFirst { case Str(s) => s }.foreach(show); stack.clear()
          case "'" =>
            lineY -= leading; curX = lineX; textY = lineY
            stack.collectFirst { case Str(s) => s }.foreach(show); stack.clear()
          case "TJ" =>
            if (arr != null) arr.foreach {
              case Str(s) => show(s)
              case Num(k) => curX -= k / 1000.0 * fontSize // kerning adjustment
              case _ =>
            }
            arr = null; stack.clear()
          case _ => stack.clear() // unsupported operator: drop its operands
        }
      case t => stack += t
    }
    chars.result()
  }

  // ---- char → line assembly (pdf_processor.cpp:97-151) ----

  /** Glyph-tuple entry point for the B2 oracle replay
    * (`b2_b6_line_assembly`): (char, left, top, right, bottom, size,
    * weight) in PDF coords (y up), same contract as the interpreter's
    * per-char boxes. Runs the REAL [[assembleLines]] fold — the 5 pt row
    * tolerance, 4 pt space-gap inference and per-line char-averaged
    * font metrics the DuckDB window SQL replays independently. */
  private[graft] def assembleGlyphs(
      glyphs: Seq[(Char, Double, Double, Double, Double, Double, Int)],
      pageHeight: Double): Seq[LayoutChunker.Line] =
    assembleLines(
      glyphs.map(g => Ch(g._1, g._2, g._3, g._4, g._5, g._6, g._7)), pageHeight)

  private def assembleLines(chars: Seq[Ch], pageHeight: Double): Seq[LayoutChunker.Line] = {
    if (chars.isEmpty) return Seq.empty
    // reference sort: rows top-down (PDF y desc) with 5 pt tolerance,
    // left→right within a row
    val sorted = chars.sortWith { (a, b) =>
      if (math.abs(a.top - b.top) > 5.0) a.top > b.top else a.left < b.left
    }
    final case class Acc(var text: StringBuilder, var top: Double, var bottom: Double,
                         var left: Double, var right: Double,
                         var sizeSum: Double, var weightSum: Double, var n: Int)
    val lines = Seq.newBuilder[LayoutChunker.Line]
    def emit(a: Acc): Unit = lines += LayoutChunker.Line(
      a.text.toString,
      a.left, pageHeight - a.top, a.right, pageHeight - a.bottom,
      a.sizeSum / a.n, (a.weightSum / a.n).round.toInt)
    val h = sorted.head
    var acc = Acc(new StringBuilder(h.c.toString), h.top, h.bottom, h.left, h.right, h.size, h.weight, 1)
    sorted.drop(1).foreach { ch =>
      if (math.abs(ch.top - acc.top) > 5.0) {
        emit(acc)
        acc = Acc(new StringBuilder(ch.c.toString), ch.top, ch.bottom, ch.left, ch.right,
          ch.size, ch.weight, 1)
      } else {
        // space-gap inference: > 4 pt between consecutive boxes
        if (ch.left - acc.right > 4.0) acc.text.append(' ')
        acc.text.append(ch.c)
        acc.right = math.max(acc.right, ch.right)
        acc.top = math.max(acc.top, ch.top)
        acc.bottom = math.min(acc.bottom, ch.bottom)
        acc.sizeSum += ch.size; acc.weightSum += ch.weight; acc.n += 1
      }
    }
    emit(acc)
    lines.result()
  }
}

/** Adobe Glyph List resolution for /Encoding /Differences names — the
  * printable-ASCII subset (AGL 2.0's names for U+0020–U+007E) plus the
  * algorithmic `uniXXXX[YYYY…]` / `uXXXX[XX]` forms. Enough for byte
  * parity on latin text; names outside the subset fall through to the
  * caller's /ToUnicode overlay (see simpleCodeMap). */
private[graft] object AdobeGlyphs {

  /** code point → AGL name for printable ASCII (the encode side, used by
    * the Type3 fixture twin to emit a /Differences array). */
  val asciiNames: Map[Int, String] = {
    val syms = Map(
      32 -> "space", 33 -> "exclam", 34 -> "quotedbl", 35 -> "numbersign",
      36 -> "dollar", 37 -> "percent", 38 -> "ampersand", 39 -> "quotesingle",
      40 -> "parenleft", 41 -> "parenright", 42 -> "asterisk", 43 -> "plus",
      44 -> "comma", 45 -> "hyphen", 46 -> "period", 47 -> "slash",
      58 -> "colon", 59 -> "semicolon", 60 -> "less", 61 -> "equal",
      62 -> "greater", 63 -> "question", 64 -> "at",
      91 -> "bracketleft", 92 -> "backslash", 93 -> "bracketright",
      94 -> "asciicircum", 95 -> "underscore", 96 -> "grave",
      123 -> "braceleft", 124 -> "bar", 125 -> "braceright", 126 -> "asciitilde")
    val digits = Seq("zero", "one", "two", "three", "four", "five", "six",
      "seven", "eight", "nine").zipWithIndex.map { case (n, i) => (48 + i) -> n }
    val letters = (('A' to 'Z') ++ ('a' to 'z')).map(c => c.toInt -> c.toString)
    syms ++ digits ++ letters
  }

  private val byName: Map[String, String] =
    asciiNames.map { case (cp, n) => n -> cp.toChar.toString }

  /** AGL name → unicode string, or None for names outside the subset. */
  def unicode(name: String): Option[String] =
    if (name.startsWith("uni") && name.length >= 7 && (name.length - 3) % 4 == 0 &&
        name.drop(3).forall(c => Character.digit(c, 16) >= 0))
      // uniXXXX[YYYY…]: each 4-hex group is one UTF-16 unit
      Some(name.drop(3).grouped(4).map(h => Integer.parseInt(h, 16).toChar).mkString)
    else if (name.startsWith("u") && name.length >= 5 && name.length <= 7 &&
        name.drop(1).forall(c => Character.digit(c, 16) >= 0))
      // uXXXX–uXXXXXX: one code point, possibly astral
      scala.util.Try(new String(Character.toChars(Integer.parseInt(name.drop(1), 16)))).toOption
    else byName.get(name)
}

/** Format-sniffing default extractor: real PDFs (%PDF- magic) go through
  * [[CharPdfExtractor]]; anything else through [[TextPageExtractor]] —
  * one `binaryFile` scan ingests a mixed directory. */
final case class SniffingExtractor(pdf: CharPdfExtractor = CharPdfExtractor(),
                                   text: TextPageExtractor = TextPageExtractor())
    extends PageExtractor {
  override def extract(path: String, content: Array[Byte]): Seq[LayoutChunker.Page] =
    if (content.length >= 5 &&
        new String(content, 0, 5, java.nio.charset.StandardCharsets.ISO_8859_1) == "%PDF-")
      pdf.extract(path, content)
    else text.extract(path, content)
}
