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
}
