package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.embed.{HashNgramEmbedder, HttpEmbedder, ProviderFormats}
import graft.embed.ProviderFormats._

/** Provider-format parity (the reference's three response shapes) with a
  * fake transport — no network. */
class HttpEmbedderSpec extends AnyFunSuite {

  test("parses all three provider response shapes") {
    val gem = """{"embedding": {"values": [0.1, 0.2, -0.3]}}"""
    val oll = """{"embedding": [1, 2.5, 3]}"""
    val oai = """{"data": [{"embedding": [0.5, -0.5], "index": 0}], "model": "m"}"""
    assert(parseEmbedding(gem).get.toSeq == Seq(0.1f, 0.2f, -0.3f))
    assert(parseEmbedding(oll).get.toSeq == Seq(1f, 2.5f, 3f))
    assert(parseEmbedding(oai).get.toSeq == Seq(0.5f, -0.5f))
  }

  test("malformed / mismatched responses → None, never a crash") {
    assert(parseEmbedding("""{"error": "quota"}""").isEmpty)
    assert(parseEmbedding("""not json at all""").isEmpty)
    assert(parseEmbedding("""{"embedding": {"values": ["x"]}}""").isEmpty)
    assert(parseEmbedding("""{"data": []}""").isEmpty)
  }

  test("request bodies escape control characters and quotes") {
    val req = buildRequest(Gemini, "m", "line1\nwith \"quotes\"\tandctl")
    // must remain valid JSON
    assert(parseEmbedding(req).isEmpty) // not an embedding, but parseable json path:
    assert(org.json4s.jackson.JsonMethods.parse(req) != org.json4s.JNothing)
    assert(req.contains("\\n") && req.contains("\\\"") && req.contains("\\u0001"))
  }

  test("HttpEmbedder round-trip through a fake transport, dim guardrail enforced") {
    val backing = HashNgramEmbedder(dim = 8)
    // fake Ollama: embeds the prompt text deterministically
    val transport: String => String = { req =>
      val text = org.json4s.jackson.JsonMethods.parse(req) \ "prompt" match {
        case org.json4s.JString(s) => s
        case _ => ""
      }
      backing.embed(text).mkString("""{"embedding": [""", ", ", "]}")
    }
    val e = HttpEmbedder(Ollama, "fake-model", dim = 8, transport)
    val v = e.embed("merge window hash")
    assert(v.length == 8)
    assert(v.zip(backing.embed("merge window hash")).forall { case (a, b) => math.abs(a - b) < 1e-6 })
    assert(e.modelSig == "ollama:fake-model")
    val wrongDim = HttpEmbedder(Ollama, "fake-model", dim = 16, transport)
    intercept[IllegalStateException](wrongDim.embed("text"))
  }

  // --- round 11: the REAL transport layer over 127.0.0.1 (the loopback
  // provider server behind the graduated c1_embed_docs / e1_rerank gates)

  test("loopback server: all three provider formats round-trip bit-exact over real HTTP") {
    import graft.embed.{LoopbackProviderServer, LoopbackTransport}
    val backing = HashNgramEmbedder(dim = 64)
    val transport = LoopbackTransport(LoopbackProviderServer.url("/embed"))
    val text = "merge window hash partition \"quoted\"\nline2\ttabbed"
    for (p <- Seq(Gemini, Ollama, OpenAiStyle)) {
      val e = HttpEmbedder(p, "loopback", dim = 64, transport)
      val got = e.embed(text)
      val want = backing.embed(text)
      assert(got.toSeq == want.toSeq,
        s"provider ${p.name}: HTTP hop must be float32-bit-exact")
    }
  }

  test("loopback rerank: HttpRerankModel scores == in-process LexicalOverlapModel over real HTTP") {
    import graft.embed.{LoopbackProviderServer, LoopbackTransport}
    import graft.post.{HttpRerankModel, LexicalOverlapModel}
    val http = HttpRerankModel(LoopbackTransport(LoopbackProviderServer.url("/rerank")))
    val local = LexicalOverlapModel()
    val q = "merge window hash"
    val texts = Seq(
      "the merge window opens on tuesday",
      "hash partitioning beats range here",
      "unrelated text about \"geese\"\nand rivers",
      "")
    assert(http.score(q, texts) == local.score(q, texts),
      "scores must survive the generateContent-style JSON hop exactly")
    // score count contract: reply array length must match the batch
    intercept[IllegalStateException] {
      // a transport that always answers with a 2-score array
      HttpRerankModel(_ =>
        """{"candidates":[{"content":{"parts":[{"text":"[0.1,0.2]"}]}}]}""")
        .score(q, texts)
    }
  }
}
