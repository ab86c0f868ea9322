package graft.post

import org.json4s._
import org.json4s.jackson.JsonMethods

/** HTTP cross-encoder rerank client (SURVEY §2 E1's model boundary).
  *
  * Mirrors the reference's rerank call shape: a generateContent-style POST
  * whose single part carries the query + candidate passages, answered by a
  * model reply whose candidate text IS a JSON score array — which the
  * client must parse exactly as the reference parses its model reply
  * (gemini_api.cpp:79-178: extract candidates[0].content.parts[0].text,
  * then parse the JSON array of numbers, one score per passage, order
  * preserved). The transport is injected (`String => String`) like the
  * embedder's, so the same client runs against the in-process loopback
  * server offline and a pooled HTTP client in deployment.
  */
final case class HttpRerankModel(transport: String => String) extends RerankModel {

  override def score(query: String, texts: Seq[String]): Seq[Double] = {
    val payload = JsonMethods.compact(JsonMethods.render(JObject(
      "query" -> JString(query),
      "passages" -> JArray(texts.map(JString(_)).toList))))
    val req = JsonMethods.compact(JsonMethods.render(JObject(
      "contents" -> JArray(List(JObject(
        "parts" -> JArray(List(JObject("text" -> JString(payload))))))))))
    val resp = JsonMethods.parse(transport(req))
    val text = (resp \ "candidates") match {
      case JArray(first :: _) =>
        (first \ "content" \ "parts") match {
          case JArray(p :: _) => (p \ "text") match {
            case JString(s) => s
            case _          => fail(resp)
          }
          case _ => fail(resp)
        }
      case _ => fail(resp)
    }
    JsonMethods.parse(text) match {
      case JArray(xs) if xs.length == texts.length =>
        xs.map {
          case JDouble(d)  => d
          case JInt(n)     => n.toDouble
          case JDecimal(d) => d.toDouble
          case JLong(n)    => n.toDouble
          case other       => throw new IllegalStateException(
            s"non-numeric rerank score: $other")
        }
      case other => throw new IllegalStateException(
        s"rerank reply is not a ${texts.length}-element score array: " +
          s"${text.take(200)} ($other)")
    }
  }

  private def fail(resp: JValue): Nothing =
    throw new IllegalStateException(
      s"unparseable rerank response: ${JsonMethods.compact(JsonMethods.render(resp)).take(200)}")
}
