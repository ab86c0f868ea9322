package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.embed.HashNgramEmbedder
import graft.ingest.TextChunker
import graft.model.Intent
import graft.post.{Calibration, Synthesis}
import graft.search.{Mmr, QueryCache}
import graft.model.ScoredChunk

/** Unit + property tests for the pure-Scala operator implementations. */
class PureOpsSpec extends AnyFunSuite {

  private val embedder = HashNgramEmbedder(dim = 64)

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // ---- embedder (C1)

  test("embedder is deterministic, unit-norm, fixed-dim") {
    val a = embedder.embed("the merge window hash")
    val b = embedder.embed("the merge window hash")
    assert(a.sameElements(b))
    assert(a.length == 64)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("embedder: similar texts closer than dissimilar") {
    val q = embedder.embed("merge window hash join")
    val near = embedder.embed("merge window hash joins")
    val far = embedder.embed("zq xv qqq unrelated blorp")
    assert(cosine(q, near) > cosine(q, far))
  }

  test("embedder: empty text gives zero vector, not NaN") {
    val z = embedder.embed("")
    assert(z.forall(_ == 0.0f))
  }

  // ---- chunker (B9)

  test("chunker: short text is a single chunk") {
    val cs = TextChunker.chunk("A tiny sentence.")
    assert(cs.size == 1 && cs.head.chunkIdx == 0)
  }

  test("chunker: long prose splits at sentence boundaries with bounded size") {
    val text = (1 to 120).map(i => s"Sentence number $i is here.").mkString(" ")
    val cs = TextChunker.chunk(text)
    assert(cs.size > 1)
    // hard bound: no chunk exceeds hardMax
    assert(cs.forall(_.text.length <= 1500))
    // overlap: every chunk after the first starts with the previous tail
    cs.sliding(2).foreach {
      case Seq(p, n) =>
        val tail = p.text.takeRight(math.min(160, p.text.length))
        assert(n.text.startsWith(tail.take(40)) || n.text.length < 200)
      case _ =>
    }
    // indexes are consecutive
    assert(cs.map(_.chunkIdx) == cs.indices)
  }

  test("chunker: content is preserved (every sentence appears in some chunk)") {
    val sentences = (1 to 50).map(i => s"Alpha beta $i gamma.")
    val cs = TextChunker.chunk(sentences.mkString(" "))
    val joined = cs.map(_.text).mkString(" ")
    sentences.foreach(s => assert(joined.contains(s)))
  }

  test("chunker: oversentence longer than hardMax is hard-split") {
    val cs = TextChunker.chunk("x" * 4000)
    assert(cs.nonEmpty && cs.forall(_.text.length <= 1500))
  }

  test("chunker: trailing fragment ≤ 20 chars is dropped") {
    val text = (1 to 40).map(i => s"Sentence number $i is long enough here.").mkString(" ") + " End."
    val cs = TextChunker.chunk(text)
    assert(cs.last.text.trim.length > 20)
  }

  // ---- intent (D5/D6)

  test("intent detection matches the reference cascade") {
    assert(Intent.detect("What is a repo rate?") == Intent.Definition)
    assert(Intent.detect("How to compute CRR: steps") == Intent.Procedure)
    assert(Intent.detect("Summarize chapter on RBI objectives") == Intent.Summary)
    assert(Intent.detect("Example of deposit insurance payout") == Intent.Example)
    assert(Intent.detect("banking regulation india") == Intent.General)
    // order: Definition checked before Procedure
    assert(Intent.detect("what is the process") == Intent.Definition)
  }

  test("intent weights follow vector_store.cpp:306-319") {
    assert(Intent.weights(Intent.Definition) == ((0.35, 0.65, 3)))
    assert(Intent.weights(Intent.Summary) == ((0.7, 0.3, 6)))
    assert(Intent.weights(Intent.General) == ((0.5, 0.5, 4)))
  }

  // ---- MMR (D10) + exploration (D11)

  private def sc(id: Long, doc: String, score: Double, heading: String = null,
                 trust: Double = 1.0, semScore: Double = 0.9): ScoredChunk =
    ScoredChunk(id, doc, heading, "text", s"t$id", score, semScore, 0, 0, trust,
      isExploration = false)

  test("mmr lambda: clamped to [0.2, 0.8], rises with complexity") {
    val short = Mmr.lambda("hi", Intent.General)
    val long = Mmr.lambda(("word " * 20).trim, Intent.General)
    assert(short >= 0.2 && long <= 0.8 && long > short)
    // Summary adds +0.5 complexity
    assert(Mmr.lambda("hi", Intent.Summary) > Mmr.lambda("hi", Intent.General))
  }

  test("mmr entropy: 0 for single doc, raw log2(n) bits for uniform distinct docs") {
    assert(Mmr.docEntropy(Seq(sc(1, "a", 1), sc(2, "a", 1))) == 0.0)
    val uniform = Seq(sc(1, "a", 1), sc(2, "b", 1), sc(3, "c", 1), sc(4, "d", 1))
    // RAW bits, not normalized — the reference feeds this straight into
    // 0.15*(1.1 - H) (vector_store.cpp:507)
    assert(math.abs(Mmr.docEntropy(uniform) - 2.0) < 1e-9)
  }

  test("mmr greedy: flat repeated-doc membership penalty promotes diversity") {
    val cands = Seq(
      sc(1, "docA", 0.90), sc(2, "docA", 0.89), sc(3, "docA", 0.88),
      sc(4, "docB", 0.72))
    // low entropy → repeat penalty 0.15*1.1 = 0.165 on docA membership; λ=0.5
    // round 3: docA id=3 → 0.44 - 0.0825 = 0.3575 < docB 0.36 → docB promoted
    val out = Mmr.select(cands, 3, lam = 0.5, entropy = 0.0).selected
    assert(out.head.id == 1)
    assert(out.map(_.docId).contains("docB")) // docB promoted over 3rd docA
    // penalty is boolean membership (vector_store.cpp:507): second docA pick
    // carries the same 0.165, so id=2 (0.3625) still beats docB (0.36)
    assert(out.map(_.id) == Seq(1, 2, 4))
  }

  test("mmr entropy EMA: seeded at 0.0, alpha 0.3 early / 0.1 late") {
    assert(math.abs(Mmr.smoothEntropy(None, 2.0, 0) - 0.6) < 1e-9)
    assert(math.abs(Mmr.smoothEntropy(Some(1.0), 2.0, 20) - 1.1) < 1e-9)
  }

  test("mmr select: deterministic tie-break (score desc, id asc)") {
    val cands = Seq(sc(2, "a", 0.5), sc(1, "b", 0.5), sc(3, "c", 0.5))
    val out = Mmr.select(cands, 3, lam = 0.8, entropy = 1.0).selected
    assert(out.map(_.id) == Seq(1, 2, 3))
  }

  test("exploration injection: gated by stability and intent, inserts at rank 2") {
    val ranked = Seq(sc(1, "a", 1.0), sc(2, "b", 0.9), sc(3, "c", 0.8))
    val below = Seq(sc(9, "x", 0.7, trust = 0.9))
    // gate: low stability → no injection
    assert(Mmr.injectExploration(ranked, below, 0.5, Intent.General) == ranked)
    // gate: Definition intent → no injection
    assert(Mmr.injectExploration(ranked, below, 0.9, Intent.Definition) == ranked)
    val out = Mmr.injectExploration(ranked, below, 0.9, Intent.General)
    assert(out(1).id == 9 && out(1).isExploration)
    assert(out(1).score == 1.0 * 0.95)
    // trust > 1.0 (already clicked) is never probed
    val clicked = Seq(sc(9, "x", 0.7, trust = 1.5))
    assert(Mmr.injectExploration(ranked, clicked, 0.9, Intent.General) == ranked)
    // gate is on RAW COSINE (vector_store.cpp:546), not the fused score
    val lowCosine = Seq(sc(9, "x", 0.7, trust = 0.9, semScore = 0.5))
    assert(Mmr.injectExploration(ranked, lowCosine, 0.9, Intent.General) == ranked)
  }

  // ---- query cache (D15/D16)

  test("query cache: exact hit is canonicalized, LRU evicts beyond capacity") {
    val c = new QueryCache[Int](capacity = 2)
    c.put("Query One", embedder.embed("query one"), 1)
    assert(c.getExact("  query ONE ").contains(1))
    c.put("query two", embedder.embed("query two"), 2)
    c.put("query three", embedder.embed("query three"), 3)
    assert(c.size == 2)
    assert(c.getExact("query one").isEmpty) // evicted (LRU)
  }

  test("query cache: semantic hit above threshold only") {
    val c = new QueryCache[Int](capacity = 10, semanticThreshold = 0.95)
    c.put("merge window hash", embedder.embed("merge window hash"), 42)
    assert(c.getSemantic(embedder.embed("merge window hash")).contains(42))
    assert(c.getSemantic(embedder.embed("totally different stuff")).isEmpty)
  }

  test("query cache: disabled mode never hits (benchmark determinism D19)") {
    val c = new QueryCache[Int](capacity = 10, enabled = false)
    c.put("q", embedder.embed("q"), 1)
    assert(c.getExact("q").isEmpty && c.size == 0)
  }

  // ---- calibration (E2/E3)

  test("calibration: cold start adopts batch stats; EMA thereafter") {
    val b1 = Seq(0.2, 0.4, 0.6, 0.8)
    val s1 = Calibration.update(Calibration.initial, b1)
    assert(math.abs(s1.mean - 0.5) < 1e-9)
    val b2 = Seq(0.3, 0.5, 0.7, 0.5)
    val s2 = Calibration.update(s1, b2)
    assert(math.abs(s2.mean - (0.85 * s1.mean + 0.15 * 0.5)) < 1e-9)
  }

  test("calibration: drift > 0.4 resets to batch") {
    val s1 = Calibration.update(Calibration.initial, Seq(0.1, 0.2, 0.1, 0.2))
    val s2 = Calibration.update(s1, Seq(0.9, 0.95, 0.85, 0.9))
    assert(math.abs(s2.mean - 0.9) < 1e-2 && s2.n == 1)
  }

  test("calibration: frozen batch (variance<0.001 around 0.5) skipped") {
    val s1 = Calibration.update(Calibration.initial, Seq(0.2, 0.4, 0.6, 0.8))
    val s2 = Calibration.update(s1, Seq(0.5, 0.5001, 0.4999, 0.5))
    assert(s2 == s1)
    assert(Calibration.isFrozen(Seq(0.5, 0.5, 0.5)))
    assert(!Calibration.isFrozen(Seq(0.1, 0.9)))
  }

  test("calibration: |z|>5 rejected, outputs in [0,1]") {
    val stats = Calibration.Stats(0.5, 0.1, 5)
    assert(Calibration.normalize(stats, 99.0).isEmpty)
    val Some(v) = Calibration.normalize(stats, 0.7)
    assert(v > 0.5 && v < 1.0)
    // clamp: far-but-accepted z maps near sigmoid(±3)
    val Some(hi) = Calibration.normalize(stats, 0.9)
    assert(hi <= 1.0 / (1.0 + math.exp(-3.0)) + 1e-12)
  }

  // ---- synthesis (E5/E7)

  test("clustering: near-identical texts merge, unrelated stay apart") {
    val texts = Seq("the merge window hash", "the merge window hash!",
      "unrelated xyzzy payload entirely")
    val cl = Synthesis.clusterContexts(texts.map(embedder.embed), 0.85)
    assert(cl(0) == cl(1) && cl(0) != cl(2))
  }

  test("claim confidence: mean of valid cited scores; uncited → top×0.5") {
    val scores = Seq(0.8, 0.6, 0.4)
    assert(math.abs(Synthesis.confidence(Seq(0, 1), scores) - 0.7) < 1e-9)
    assert(math.abs(Synthesis.confidence(Seq.empty, scores) - 0.4) < 1e-9)
    assert(math.abs(Synthesis.confidence(Seq(7), scores) - 0.4) < 1e-9) // invalid index
  }

  test("brace balance check") {
    assert(Synthesis.braceBalanced("""{"a": {"b": 1}}"""))
    assert(!Synthesis.braceBalanced("""{"a": {"b": 1}"""))
    assert(!Synthesis.braceBalanced("""}{"""))
  }

  test("raw LLM reply parse path (E7, gemini_api.cpp:496-563): validation + confidence") {
    val ctxs = Seq(0 -> 0.8, 1 -> 0.6, 2 -> 0.4)
    // prose around the JSON wrapper is stripped; source id 9 is invalid and
    // dropped; confidence = mean of the valid cited scores
    val good =
      """Here is the answer you asked for:
        |{"answer": [
        |  {"statement": "Claim A.", "sources": [0, 1, 9]},
        |  {"statement": "Claim B.", "sources": []},
        |  {"statement": "", "sources": [2]}
        |]}
        |Hope this helps!""".stripMargin
    val claims = Synthesis.parseClaims(good, ctxs)
    assert(claims.size == 2) // empty statement dropped
    assert(claims(0).statement == "Claim A." && claims(0).sourceIndices == Seq(0, 1))
    assert(math.abs(claims(0).confidence - 0.7) < 1e-9)
    // uncited claim: fallback = top context score × 0.5
    assert(claims(1).sourceIndices.isEmpty && math.abs(claims(1).confidence - 0.4) < 1e-9)

    // refusal marker short-circuits
    assert(Synthesis.parseClaims("No grounded answer found in context.", ctxs).isEmpty)
    // no JSON wrapper at all
    assert(Synthesis.parseClaims("just prose, no json here", ctxs).isEmpty)
    // unbalanced braces rejected before parsing
    assert(Synthesis.parseClaims("""{"answer": [{"statement": "x"}""" + "]", ctxs).isEmpty)
    // balanced but malformed JSON → parse failure → zero claims, no throw
    assert(Synthesis.parseClaims("""{"answer": [statement-not-json}]{""" + "}", ctxs).isEmpty)
    // answer is not an array
    assert(Synthesis.parseClaims("""{"answer": "scalar"}""", ctxs).isEmpty)
  }

  test("RawJsonReplySynthesis adapter: claims flow through the same validation") {
    val model = graft.post.RawJsonReplySynthesis(_ =>
      """{"answer": [{"statement": "From cluster.", "sources": [1, 42]}]}""")
    val out = model.synthesize(Seq(Seq((0, "text a")), Seq((1, "text b"))))
    assert(out == Seq(("From cluster.", Seq(1)))) // 42 is not a member id
  }

  // ---- property-based (seeded-random): cosine on the driver-side implementation

  test("cosine properties: symmetry, range, self-similarity (200 random vectors)") {
    val rnd = new scala.util.Random(42)
    def vec(): Array[Float] = Array.fill(8)((rnd.nextFloat() - 0.5f) * 10f)
    (1 to 200).foreach { _ =>
      val a = vec(); val b = vec()
      val ab = cosine(a, b)
      assert(math.abs(ab - cosine(b, a)) < 1e-12)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
      if (a.exists(_ != 0.0f)) assert(math.abs(cosine(a, a) - 1.0) < 1e-9)
    }
  }
}
