package graft.ingest

/** Structural chunk accumulator (SURVEY §2 B9), text-mode.
  *
  * Re-implements the reference's chunk sizing semantics
  * (pdf_processor.cpp:259-389) as a pure per-document function: target 800
  * chars, hard max 1500, 160-char overlap carried between chunks, splits at
  * the last sentence boundary `(?<=[.?!])\s+` once past the target, trailing
  * chunk kept only if > 20 chars. Per-document sequential by design
  * (SURVEY §7.4 risk 2) — parallelism is across documents, via `flatMap`.
  */
object TextChunker {

  final case class Params(target: Int = 800, hardMax: Int = 1500,
                          overlap: Int = 160, minTail: Int = 20)

  final case class TextChunk(chunkIdx: Int, text: String, sentenceCount: Int)

  private val sentenceSplit = "(?<=[.?!])\\s+"

  def chunk(text: String, p: Params = Params()): Seq[TextChunk] = {
    if (text == null || text.trim.isEmpty) return Seq.empty
    val sentences = text.split(sentenceSplit).filter(_.nonEmpty)
    val out = Seq.newBuilder[TextChunk]
    var idx = 0
    val acc = new StringBuilder
    var accSentences = 0
    // acc content beyond pure overlap-carry: an overlap tail alone must
    // never be emitted as its own chunk (it would duplicate content)
    var freshContent = false

    def emit(): Unit = {
      val t = acc.toString
      if (t.trim.length > p.minTail || (idx == 0 && t.trim.nonEmpty)) {
        out += TextChunk(idx, t, math.max(accSentences, 1))
        idx += 1
      }
      // carry tail overlap into the next chunk (pdf_processor.cpp:375-377)
      val tail = if (t.length > p.overlap) t.substring(t.length - p.overlap) else ""
      acc.clear()
      acc.append(tail)
      accSentences = 0
      freshContent = false
    }

    sentences.foreach { s =>
      var sent = s
      // a single sentence longer than hardMax is split unconditionally
      while (acc.length + 1 + sent.length > p.hardMax) {
        val room = math.max(p.hardMax - acc.length - 1, 1)
        if (acc.nonEmpty) acc.append(' ')
        acc.append(sent.substring(0, math.min(room, sent.length)))
        accSentences += 1
        freshContent = true
        sent = sent.substring(math.min(room, sent.length))
        emit()
      }
      if (sent.nonEmpty) {
        if (acc.nonEmpty) acc.append(' ')
        acc.append(sent)
        accSentences += 1
        freshContent = true
      }
      if (acc.length >= p.target) emit()
    }
    // trailing chunk: only if it holds fresh content (not bare overlap),
    // kept if > minTail chars — or unconditionally when the whole document
    // produced nothing yet (never drop a document entirely)
    if (freshContent &&
        (acc.toString.trim.length > p.minTail || (idx == 0 && acc.toString.trim.nonEmpty))) emit()
    out.result()
  }
}
