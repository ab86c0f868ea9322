package graft.ingest

/** Layout-aware document-structure pipeline (SURVEY §2 B1–B8): the phases
  * the reference runs inside PDF extraction (pdf_processor.cpp:23-407),
  * re-expressed as pure functions over an extracted page model so they are
  * testable without a PDF runtime and distributable as a per-document
  * `flatMap` (document granularity is the parallel unit; everything below
  * is deliberately sequential, SURVEY §7.4 risk 2).
  *
  * The corpus-level piece (B1 header/footer frequency) is a 2-phase
  * aggregate at scale: a lines DataFrame → groupBy(normalized).count() →
  * broadcast back. [[headerFooterFrequency]] implements the same
  * normalization so the distributed and single-doc paths agree.
  */
object LayoutChunker {

  /** One positioned text run (the reference assembles these from per-char
    * boxes; we take lines as the extraction contract). Coordinates are
    * top-left origin, y growing downward. */
  final case class Line(text: String, left: Double, top: Double,
                        right: Double, bottom: Double,
                        fontSize: Double, fontWeight: Int)

  final case class Page(pageNum: Int, width: Double, height: Double, lines: Seq[Line])

  final case class Block(lines: Seq[Line], pageNum: Int) {
    lazy val text: String = lines.map(_.text).mkString(" ")
    lazy val avgFontSize: Double =
      if (lines.isEmpty) 0.0 else lines.map(_.fontSize).sum / lines.size
    lazy val avgFontWeight: Double =
      if (lines.isEmpty) 0.0 else lines.map(_.fontWeight.toDouble).sum / lines.size
  }

  final case class TypedBlock(block: Block, chunkType: String,
                              listType: String, listLength: Int)

  final case class Heading(level: Int, title: String)

  final case class LayoutChunk(
      text: String, pageNum: Int, headingPath: String, headingLevel: Int,
      chunkType: String, sentenceCount: Int, listType: String, listLength: Int)

  // ---- B1: header/footer frequency pre-pass (pdf_processor.cpp:33-64)

  /** Normalize a line for frequency counting: lowercase, strip digits, trim. */
  def normalizeLine(s: String): String =
    s.toLowerCase.replaceAll("[0-9]+", "").trim

  /** Pass 1 over all pages: normalized-line → page frequency. */
  def headerFooterFrequency(pages: Seq[Page]): Map[String, Int] =
    pages.flatMap(p => p.lines.map(l => normalizeLine(l.text)).distinct)
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size).toMap

  // ---- B2: line ordering (the reference sorts chars into lines with 5pt
  // row tolerance; our contract takes lines, so ordering = top asc, left asc
  // with the same tolerance for same-row grouping)

  def orderLines(lines: Seq[Line], rowTolerance: Double = 5.0): Seq[Line] = {
    val sorted = lines.sortBy(l => (l.top, l.left))
    // stable re-sort within tolerance rows: group lines whose tops are
    // within tolerance, order each row left→right
    val out = Seq.newBuilder[Line]
    var row = List.empty[Line]
    var rowTop = Double.NaN
    def flush(): Unit = { out ++= row.sortBy(_.left); row = Nil }
    sorted.foreach { l =>
      if (row.isEmpty || math.abs(l.top - rowTop) <= rowTolerance) {
        if (row.isEmpty) rowTop = l.top
        row ::= l
      } else { flush(); row = List(l); rowTop = l.top }
    }
    flush()
    out.result()
  }

  // ---- B3: two-column reorder (pdf_processor.cpp:168-179)

  /** If the page is two-column (no line crosses the midline and both halves
    * are populated), emit column 1 fully, then column 2. */
  def reorderColumns(page: Page): Seq[Line] = {
    val mid = page.width / 2.0
    val leftCol = page.lines.filter(_.right <= mid)
    val rightCol = page.lines.filter(_.left >= mid)
    val crossing = page.lines.size - leftCol.size - rightCol.size
    if (crossing == 0 && leftCol.nonEmpty && rightCol.nonEmpty)
      orderLines(leftCol) ++ orderLines(rightCol)
    else orderLines(page.lines)
  }

  // ---- B4: noise filter (pdf_processor.cpp:186-201)

  /** Drop repeated header/footer lines (freq > 5 pages AND within the
    * top/bottom 15% margins) and bare page numbers. */
  def isNoise(line: Line, page: Page, freq: Map[String, Int],
              freqThreshold: Int = 5, marginRatio: Double = 0.15): Boolean = {
    val inMargin = line.top <= page.height * marginRatio ||
      line.bottom >= page.height * (1.0 - marginRatio)
    val repeated = freq.getOrElse(normalizeLine(line.text), 0) > freqThreshold
    val barePageNum = line.text.trim.matches("\\d{1,4}")
    (repeated && inMargin) || barePageNum
  }

  // ---- B5: block reassembly (pdf_processor.cpp:181-240)

  /** New block when the vertical gap between consecutive lines exceeds 15pt. */
  def assembleBlocks(lines: Seq[Line], pageNum: Int, gapThreshold: Double = 15.0): Seq[Block] = {
    if (lines.isEmpty) return Seq.empty
    val blocks = Seq.newBuilder[Block]
    var current = List(lines.head)
    lines.sliding(2).foreach {
      case Seq(prev, next) =>
        if (next.top - prev.bottom > gapThreshold) {
          blocks += Block(current.reverse, pageNum)
          current = List(next)
        } else current ::= next
      case _ =>
    }
    blocks += Block(current.reverse, pageNum)
    blocks.result()
  }

  // ---- B6: baseline font estimation (pdf_processor.cpp:242-251)

  /** Mode of integer font sizes across blocks (ties → smaller size). */
  def baselineFontSize(blocks: Seq[Block]): Int = {
    val sizes = blocks.flatMap(_.lines).map(_.fontSize.round.toInt)
    if (sizes.isEmpty) 12
    else sizes.groupBy(identity).view.mapValues(_.size).toSeq
      .maxBy { case (sz, n) => (n, -sz) }._1
  }

  // ---- B7: heading detection + breadcrumb (pdf_processor.cpp:253-296)

  private val chapterRe = "^(Chapter|CHAPTER|PART|Part)\\s+\\d+.*".r
  private val subsectionRe = "^\\d+\\.\\d+\\.\\d+\\s+.*".r
  private val sectionRe = "^\\d+\\.\\d+\\s+.*".r

  /** Detect a heading level for a block: numbering patterns first, then
    * layout heuristics (font ≥ baseline+6 → level 1, ≥ baseline+3 or bold →
    * level 2; only for short blocks ≤ 3 lines). */
  def detectHeading(block: Block, baseline: Int): Option[Heading] = {
    val t = block.text.trim
    if (t.isEmpty) return None
    if (chapterRe.matches(t)) return Some(Heading(1, t))
    if (subsectionRe.matches(t)) return Some(Heading(3, t))
    if (sectionRe.matches(t)) return Some(Heading(2, t))
    val short = block.lines.size <= 3 && t.length <= 120
    if (short && block.avgFontSize >= baseline + 6) Some(Heading(1, t))
    else if (short && (block.avgFontSize >= baseline + 3 || block.avgFontWeight > 600))
      Some(Heading(2, t))
    else None
  }

  /** Stateful Chapter > Section > Subsection tracker: a level-n heading
    * resets all deeper levels (pdf_processor.cpp:66-69, :269-296). */
  final class BreadcrumbTracker {
    private val parts = Array("", "", "")
    def update(h: Heading): Unit = {
      val lvl = math.min(math.max(h.level, 1), 3) - 1
      parts(lvl) = h.title
      ((lvl + 1) until 3).foreach(parts(_) = "")
    }
    def path: String = parts.filter(_.nonEmpty).mkString(" > ")
    def level: Int = parts.lastIndexWhere(_.nonEmpty) + 1
  }

  // ---- B8: chunk-type classifier (pdf_processor.cpp:298-333)

  private val codeKeywordRe =
    ".*\\b(def|class|return|import|void|int|for|while|function|var|let|const)\\b.*"
  private val definitionRe = "^(Definition|DEFINITION)[:.\\s].*"
  private val theoremRe = "^(Theorem|Lemma|Corollary|Proof|THEOREM)[:.\\s].*"
  private val genericTypeRe =
    "^(Definition|Example|Theorem|Summary|Exercise|Corollary|Lemma|Proof)\\b.*"
  private val bulletRe = "^\\s*[-•*]\\s+.*"
  private val numberedRe = "^\\s*\\d+[.)]\\s+.*"

  def classifyBlock(block: Block): TypedBlock = {
    val t = block.text
    val lines = block.lines.map(_.text)
    val nLines = math.max(lines.size, 1)
    val symbols = t.count(c => "{}()[];=<>+-*/&|".indexOf(c.toInt) >= 0)
    val digits = t.count(_.isDigit)
    val periods = t.count(_ == '.')
    val indented = lines.count(_.startsWith("  "))

    var codeScore = 0
    if (symbols > 2 * nLines) codeScore += 4
    if (t.matches(codeKeywordRe)) codeScore += 3
    if (indented * 2 >= nLines) codeScore += 3

    val bullets = lines.count(_.matches(bulletRe))
    val numbered = lines.count(_.matches(numberedRe))
    val trimmed = t.trim

    if (codeScore >= 5)
      TypedBlock(block, "code", "", 0)
    else if (digits > 3 * nLines && periods < nLines)
      TypedBlock(block, "table", "", 0)
    else if (bullets * 2 >= nLines && bullets >= 2)
      TypedBlock(block, "list", "bullet", bullets)
    else if (numbered * 2 >= nLines && numbered >= 2)
      TypedBlock(block, "list", "numbered", numbered)
    else if (trimmed.matches(definitionRe)) TypedBlock(block, "definition", "", 0)
    else if (trimmed.matches(theoremRe)) TypedBlock(block, "theorem", "", 0)
    else if (trimmed.matches(genericTypeRe)) {
      val kind = trimmed.takeWhile(_.isLetter).toLowerCase
      TypedBlock(block, kind, "", 0)
    } else TypedBlock(block, "text", "", 0)
  }

  // ---- full pipeline: B1–B9 per document

  def chunkDocument(pages: Seq[Page], params: TextChunker.Params = TextChunker.Params()): Seq[LayoutChunk] = {
    val freq = headerFooterFrequency(pages)
    val crumbs = new BreadcrumbTracker
    val out = Seq.newBuilder[LayoutChunk]
    val prose = new StringBuilder
    var proseStartPage = 0
    var proseSentences = 0

    def flushProse(): Unit = {
      val text = prose.toString
      if (text.trim.length > 3) {
        TextChunker.chunk(text, params).foreach { c =>
          out += LayoutChunk(c.text, proseStartPage, crumbs.path, crumbs.level,
            "text", c.sentenceCount, "", 0)
        }
      }
      prose.clear()
      proseSentences = 0
    }

    pages.foreach { page =>
      val ordered = reorderColumns(page)
      val clean = ordered.filterNot(l => isNoise(l, page, freq))
      val blocks = assembleBlocks(clean, page.pageNum)
      val baseline = baselineFontSize(blocks)
      blocks.foreach { block =>
        detectHeading(block, baseline) match {
          case Some(h) =>
            flushProse()
            crumbs.update(h)
          case None =>
            val typed = classifyBlock(block)
            if (typed.chunkType == "text") {
              if (prose.isEmpty) proseStartPage = page.pageNum
              if (prose.nonEmpty) prose.append(' ')
              prose.append(block.text)
            } else {
              // code/table/list/definition blocks flush prose and emit
              // standalone (pdf_processor.cpp:336-345)
              flushProse()
              val sentences = block.text.split("(?<=[.?!])\\s+").count(_.nonEmpty)
              out += LayoutChunk(block.text, page.pageNum, crumbs.path, crumbs.level,
                typed.chunkType, math.max(sentences, 1), typed.listType, typed.listLength)
            }
        }
      }
    }
    flushProse()
    out.result()
  }
}
