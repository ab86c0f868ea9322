package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.LayoutChunker
import graft.ingest.LayoutChunker._

/** Fixtures per FIXTURES.md §2.2 — each case pins one heuristic of the
  * layout pipeline (pdf_processor.cpp citations in LayoutChunker). */
class LayoutChunkerSpec extends AnyFunSuite {

  private def line(text: String, top: Double, left: Double = 50, width: Double = 300,
                   size: Double = 12, weight: Int = 400): Line =
    Line(text, left, top, left + width, top + size, size, weight)

  private def page(num: Int, lines: Seq[Line], w: Double = 600, h: Double = 800): Page =
    Page(num, w, h, lines)

  test("B1+B4: repeated margin header on >5 pages is dropped; body text kept") {
    val pages = (1 to 7).map { i =>
      page(i, Seq(
        line("Annual Report 2024", top = 20),                   // header, in top 15%
        line(s"Body content of page $i with enough words.", top = 400)))
    }
    val freq = headerFooterFrequency(pages)
    assert(freq(normalizeLine("Annual Report 2024")) == 7)
    val chunks = chunkDocument(pages)
    assert(!chunks.exists(_.text.contains("Annual Report")))
    assert(chunks.exists(_.text.contains("Body content of page 3")))
  }

  test("B4: repeated line OUTSIDE the margins survives (frequency alone is not noise)") {
    val pages = (1 to 7).map { i =>
      page(i, Seq(line("Repeated mid-page callout text.", top = 400),
        line(s"Unique body $i.", top = 500)))
    }
    val chunks = chunkDocument(pages)
    assert(chunks.exists(_.text.contains("Repeated mid-page callout")))
  }

  test("B4: bare page-number line dropped") {
    val p = page(1, Seq(line("42", top = 780), line("Real content sentence here.", top = 400)))
    val chunks = chunkDocument(Seq(p))
    assert(!chunks.exists(_.text.trim == "42"))
  }

  test("B3: two-column page emits left column before right column") {
    val p = page(1, Seq(
      Line("RIGHT-1", 320, 100, 560, 112, 12, 400),
      Line("LEFT-1", 40, 100, 280, 112, 12, 400),
      Line("RIGHT-2", 320, 130, 560, 142, 12, 400),
      Line("LEFT-2", 40, 130, 280, 142, 12, 400)))
    val ordered = reorderColumns(p)
    assert(ordered.map(_.text) == Seq("LEFT-1", "LEFT-2", "RIGHT-1", "RIGHT-2"))
  }

  test("B2: same-row lines within 5pt tolerance are ordered left-to-right") {
    val ls = Seq(
      Line("B", 200, 100, 300, 112, 12, 400),
      Line("A", 50, 103, 150, 115, 12, 400), // 3pt lower: same row
      Line("C", 50, 200, 150, 212, 12, 400))
    assert(orderLines(ls).map(_.text) == Seq("A", "B", "C"))
  }

  test("B5: vertical gap > 15pt splits blocks") {
    val ls = Seq(line("First block line one.", 100), line("First block line two.", 114),
      line("Second block after big gap.", 200))
    val blocks = assembleBlocks(ls, 1)
    assert(blocks.size == 2)
    assert(blocks(0).text.contains("line two") && blocks(1).text.contains("big gap"))
  }

  test("B6: baseline font = mode of sizes") {
    val blocks = Seq(Block(Seq(line("a", 1, size = 12), line("b", 2, size = 12),
      line("c", 3, size = 18)), 1))
    assert(baselineFontSize(blocks) == 12)
  }

  test("B7: numbered headings produce levels 1-3 and breadcrumb resets") {
    val pages = Seq(page(1, Seq(
      line("Chapter 3 Banking", 40, size = 12),
      line("Intro prose for the chapter, long enough to keep.", 100),
      line("3.1 Reserve Ratios", 200, size = 12),
      line("Section prose about reserve ratios and more.", 260),
      line("3.1.2 CRR Details", 340, size = 12),
      line("Subsection prose goes here with details.", 400),
      line("Chapter 4 Insurance", 500, size = 12),
      line("New chapter prose: breadcrumb must have reset.", 560))))
    val chunks = chunkDocument(pages)
    val intro = chunks.find(_.text.contains("Intro prose")).get
    assert(intro.headingPath == "Chapter 3 Banking" && intro.headingLevel == 1)
    val sec = chunks.find(_.text.contains("Section prose")).get
    assert(sec.headingPath == "Chapter 3 Banking > 3.1 Reserve Ratios" && sec.headingLevel == 2)
    val sub = chunks.find(_.text.contains("Subsection prose")).get
    assert(sub.headingPath == "Chapter 3 Banking > 3.1 Reserve Ratios > 3.1.2 CRR Details")
    assert(sub.headingLevel == 3)
    val ch4 = chunks.find(_.text.contains("New chapter prose")).get
    assert(ch4.headingPath == "Chapter 4 Insurance" && ch4.headingLevel == 1)
  }

  test("B7: oversized-font short block detected as heading by layout") {
    val pages = Seq(page(1, Seq(
      line("Big Title Here", 40, size = 20),             // baseline+6 → level 1
      line("Body prose at baseline size for context.", 100, size = 12),
      line("Bold Subhead", 200, size = 12, weight = 700), // bold → level 2
      line("More body prose after the bold subhead.", 260, size = 12))))
    val chunks = chunkDocument(pages)
    val afterSub = chunks.find(_.text.contains("More body prose")).get
    assert(afterSub.headingPath == "Big Title Here > Bold Subhead")
  }

  test("B8: symbol-dense keyword-bearing indented block classified code and emitted standalone") {
    val codeLines = Seq(
      line("  def f(x) { return (x*x) + [1,2]; }", 100),
      line("  var y = f(2); // <calls>", 114))
    val p = page(1, Seq(line("Prose before the code block to flush.", 40)) ++ codeLines)
    val chunks = chunkDocument(Seq(p))
    val code = chunks.filter(_.chunkType == "code")
    assert(code.size == 1 && code.head.text.contains("def f(x)"))
    assert(chunks.exists(c => c.chunkType == "text" && c.text.contains("Prose before")))
  }

  test("B8: digit-dense block classified table") {
    val b = Block(Seq(line("12 45 78 901 234", 1), line("56 78 90 123 456", 2)), 1)
    assert(classifyBlock(b).chunkType == "table")
  }

  test("B8: bullet and numbered lists typed with list_length") {
    val bullets = Block(Seq(line("- first item", 1), line("- second item", 2),
      line("- third item", 3)), 1)
    val tb = classifyBlock(bullets)
    assert(tb.chunkType == "list" && tb.listType == "bullet" && tb.listLength == 3)
    val numbered = Block(Seq(line("1. step one", 1), line("2. step two", 2)), 1)
    val tn = classifyBlock(numbered)
    assert(tn.chunkType == "list" && tn.listType == "numbered" && tn.listLength == 2)
  }

  test("B8: Definition/Theorem blocks near start typed") {
    assert(classifyBlock(Block(Seq(line("Definition: a repo rate is...", 1)), 1)).chunkType == "definition")
    assert(classifyBlock(Block(Seq(line("Theorem: for every x...", 1)), 1)).chunkType == "theorem")
    assert(classifyBlock(Block(Seq(line("Example 3 shows the payout...", 1)), 1)).chunkType == "example")
  }

  test("B9 integration: long prose under one heading splits with overlap") {
    val longProse = (1 to 60).map(i => line(s"Sentence $i of the long section text goes on.", 100 + i * 14))
    val pages = Seq(page(1, line("Chapter 1 Long", 40) +: longProse, h = 2000))
    val chunks = chunkDocument(pages)
    val texts = chunks.filter(_.chunkType == "text")
    assert(texts.size > 1)
    assert(texts.forall(_.headingPath == "Chapter 1 Long"))
    assert(texts.forall(_.text.length <= 1500))
  }
}
