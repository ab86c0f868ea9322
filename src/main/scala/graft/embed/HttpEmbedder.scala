package graft.embed

import org.json4s._
import org.json4s.jackson.JsonMethods

/** HTTP embedding provider path (SURVEY §2 C1), shape-compatible with the
  * reference's three engines (gemini_api.cpp:238-273, reply parsing
  * :570-623):
  *
  *   - Gemini `embedContent`:  {"embedding": {"values": [..]}}
  *   - Ollama `/api/embeddings`: {"embedding": [..]}
  *   - OpenAI-style `/v1/embeddings` (LM Studio): {"data":[{"embedding":[..]}]}
  *
  * The transport is injected (`String => String`: request body in, response
  * body out) so the pipeline is testable offline and the deployment swaps
  * in a pooled HTTP client inside the same `mapPartitions` boundary the
  * deterministic embedder uses.
  */
object ProviderFormats {

  sealed trait Provider { def name: String }
  case object Gemini extends Provider { val name = "gemini" }
  case object Ollama extends Provider { val name = "ollama" }
  case object OpenAiStyle extends Provider { val name = "openai" }

  def buildRequest(provider: Provider, model: String, text: String): String = {
    val esc = escape(text)
    provider match {
      case Gemini =>
        s"""{"model": "$model", "content": {"parts": [{"text": "$esc"}]}, "task_type": "RETRIEVAL_DOCUMENT"}"""
      case Ollama =>
        s"""{"model": "$model", "prompt": "$esc"}"""
      case OpenAiStyle =>
        s"""{"model": "$model", "input": "$esc"}"""
    }
  }

  /** Parse any of the three response shapes — tried in the reference's
    * order, falling through on shape mismatch. Returns None on no match
    * (the reference surfaces this as an engine error, not a crash). */
  def parseEmbedding(json: String): Option[Array[Float]] = {
    val parsed =
      try JsonMethods.parse(json)
      catch { case _: Throwable => return None }

    def values(v: JValue): Option[Array[Float]] = v match {
      case JArray(xs) =>
        val out = new Array[Float](xs.size)
        var i = 0
        xs.foreach {
          case JDouble(d)  => out(i) = d.toFloat; i += 1
          case JInt(n)     => out(i) = n.toFloat; i += 1
          case JDecimal(d) => out(i) = d.toFloat; i += 1
          case JLong(n)    => out(i) = n.toFloat; i += 1
          case _           => return None
        }
        Some(out)
      case _ => None
    }

    (parsed \ "embedding" \ "values") match {
      case v @ JArray(_) => return values(v) // Gemini
      case _ =>
    }
    (parsed \ "embedding") match {
      case v @ JArray(_) => return values(v) // Ollama
      case _ =>
    }
    (parsed \ "data") match {
      case JArray(first :: _) =>
        (first \ "embedding") match {
          case v @ JArray(_) => return values(v) // OpenAI-style
          case _ =>
        }
      case _ =>
    }
    None
  }

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}

/** Embedder over an injected transport. Per-partition construction happens
  * at the `mapPartitions` boundary (Embedder is Serializable; the transport
  * must be too — in deployment a lazy pooled client). */
final case class HttpEmbedder(
    provider: ProviderFormats.Provider,
    model: String,
    dim: Int,
    transport: String => String) extends Embedder {

  override def modelSig: String = s"${provider.name}:$model"

  override def embed(text: String): Array[Float] = {
    val resp = transport(ProviderFormats.buildRequest(provider, model, text))
    ProviderFormats.parseEmbedding(resp) match {
      case Some(v) if v.length == dim => v
      case Some(v) =>
        throw new IllegalStateException(
          s"dimension guardrail: got ${v.length}, workspace registered $dim")
      case None =>
        throw new IllegalStateException(s"unparseable embedding response: ${resp.take(200)}")
    }
  }
}
