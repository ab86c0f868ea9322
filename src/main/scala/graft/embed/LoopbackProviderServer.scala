package graft.embed

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** In-process loopback HTTP provider stand-in (round-11 graduation of the
  * C1/E1 transport layer).
  *
  * The reference talks to its embedding / rerank models over HTTP
  * (gemini_api.cpp:238-273 request shapes, :570-623 the three reply
  * parsers, :79-178 the rerank score-array parse). The repo's provider
  * clients parse all three formats, but until round 11 nothing drove them
  * through a real HTTP hop — the sandbox has no egress, so the model
  * BEHAVIOR stays a deterministic stand-in while this server closes the
  * remaining untested layer: socket transport, request serialization and
  * response parsing, end to end on 127.0.0.1.
  *
  * Endpoints:
  *   - POST /embed  — detects the provider from the REQUEST shape (Gemini
  *     `content.parts`, Ollama `prompt`, OpenAI-style `input`), embeds the
  *     text server-side with the deterministic hash-ngram embedder, and
  *     replies in the MATCHING provider response shape.
  *   - POST /rerank — Gemini-generateContent shape in, the part text
  *     carrying a JSON {query, passages[]} payload; scores with the
  *     deterministic lexical-overlap model and replies generateContent-
  *     style with the JSON score array as the candidate text, which the
  *     client must parse exactly as the reference parses its model reply.
  *
  * Singleton on a daemon thread pool, lazily started on first use and
  * alive for the JVM (bench re-invokes the queries; the gate runs them
  * thousands of rows at a time — start-once is the only sane lifecycle).
  */
object LoopbackProviderServer {

  private val embedder = HashNgramEmbedder(dim = 64)
  private val rerankModel = graft.post.LexicalOverlapModel()

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      8,
      (r: Runnable) => {
        val t = new Thread(r, "graft-loopback-provider")
        t.setDaemon(true)
        t
      })
    s.setExecutor(pool)
    s.createContext("/embed", handler(embedResponse))
    s.createContext("/rerank", handler(rerankResponse))
    s.createContext("/ocr", handler(ocrResponse))
    // start() from a short-lived DAEMON thread: the JDK's HTTP-Dispatcher
    // thread inherits daemon status from its creator, and a non-daemon
    // dispatcher would pin the JVM open after Verify/Bench mains return
    // (observed: graft.Verify hung at exit until killed).
    val starter = new Thread(() => s.start(), "graft-loopback-starter")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    s
  }

  /** http://127.0.0.1:<allocated-port><path> */
  def url(path: String): String =
    s"http://127.0.0.1:${server.getAddress.getPort}$path"

  private def handler(f: String => String): HttpHandler = new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val resp =
        try f(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
        catch {
          case scala.util.control.NonFatal(e) =>
            s"""{"error": "${e.getClass.getSimpleName}"}"""
        }
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length.toLong)
      val os = ex.getResponseBody
      os.write(bytes)
      os.close()
    }
  }

  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _          => None
  }

  /** Float32 values serialize via Float.toString (shortest round-tripping
    * decimal), so the client's parse-as-double-then-toFloat recovers the
    * exact same float32 the hermetic embedder produces — the oracle can
    * stay coordinate-exact across the HTTP hop. */
  private def floats(v: Array[Float]): String =
    v.map(_.toString).mkString("[", ",", "]")

  private def embedResponse(body: String): String = {
    val j = JsonMethods.parse(body)
    // provider detection mirrors the request shapes the clients build
    val gemini = (j \ "content" \ "parts") match {
      case JArray(p :: _) => str(p \ "text")
      case _              => None
    }
    val ollama = str(j \ "prompt")
    val openai = str(j \ "input")
    (gemini, ollama, openai) match {
      case (Some(t), _, _) =>
        s"""{"embedding": {"values": ${floats(embedder.embed(t))}}}"""
      case (_, Some(t), _) =>
        s"""{"embedding": ${floats(embedder.embed(t))}}"""
      case (_, _, Some(t)) =>
        s"""{"object": "list", "data": [{"object": "embedding", "index": 0, "embedding": ${floats(
            embedder.embed(t))}}]}"""
      case _ =>
        """{"error": "unrecognized embed request shape"}"""
    }
  }

  /** Cloud-OCR stand-in (A2, round-14 graduation of the last untested
    * transport path): accepts the reference's EXACT PDF-extraction request
    * — generateContent with an `inline_data` part (base64 payload +
    * mime_type) followed by the extraction-prompt text part
    * (gemini_api.cpp:281-307) — and replies generateContent-style with
    * the "extracted" text (parsed by the client exactly as
    * gemini_api.cpp:637-648 parses it). Model behavior is the
    * deterministic stand-in (no egress): the text is derived from the
    * DECODED payload's md5 + length, so a green oracle row proves the
    * base64 round trip preserved every byte and both JSON shapes match
    * the reference's. Form-feed separates pages, mirroring how a
    * multi-page extraction reads back through TextPageExtractor. */
  private def ocrResponse(body: String): String = {
    val j = JsonMethods.parse(body)
    val parts = (j \ "contents") match {
      case JArray(first :: _) =>
        (first \ "parts") match { case JArray(ps) => ps; case _ => Nil }
      case _ => Nil
    }
    val b64 = parts.flatMap(p => str(p \ "inline_data" \ "data")).headOption
    val mime = parts.flatMap(p => str(p \ "inline_data" \ "mime_type")).headOption
    val prompt = parts.flatMap(p => str(p \ "text")).headOption
    (b64, mime, prompt) match {
      case (Some(data), Some("application/pdf"), Some(p)) if p.nonEmpty =>
        val bytes = java.util.Base64.getDecoder.decode(data)
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(bytes).map("%02x".format(_)).mkString
        val text =
          s"1 Scan Digest\nThe scanned payload decodes to ${bytes.length} bytes. " +
            s"Its md5 digest is $md5. Every byte survived the base64 round trip.\f" +
            "2 Scan Verification\nA second page confirms pagination. " +
            "The extraction prompt and mime type matched the reference shapes."
        JsonMethods.compact(JsonMethods.render(
          JObject("candidates" -> JArray(List(JObject("content" ->
            JObject("parts" -> JArray(List(JObject("text" -> JString(text)))))))))))
      case _ => """{"error": "unrecognized ocr request shape"}"""
    }
  }

  private def rerankResponse(body: String): String = {
    val j = JsonMethods.parse(body)
    val partText = (j \ "contents") match {
      case JArray(first :: _) =>
        (first \ "parts") match {
          case JArray(p :: _) => str(p \ "text")
          case _              => None
        }
      case _ => None
    }
    val payload = partText.map(JsonMethods.parse(_))
      .getOrElse(return """{"error": "no part text"}""")
    val query = str(payload \ "query").getOrElse("")
    val texts = (payload \ "passages") match {
      case JArray(xs) => xs.flatMap(str)
      case _          => Nil
    }
    val scores = rerankModel.score(query, texts)
    val arr = scores.map(_.toString).mkString("[", ",", "]")
    val reply = JsonMethods.compact(JsonMethods.render(
      JObject("candidates" -> JArray(List(JObject("content" ->
        JObject("parts" -> JArray(List(JObject("text" -> JString(arr)))))))))))
    reply
  }
}

/** Minimal blocking HTTP POST transport for the loopback server. Plain
  * HttpURLConnection per call — the loopback hop is microseconds and the
  * call sites are bounded (≤10-candidate rerank batches, striped embed
  * fixtures); a deployment swaps in a pooled client behind the same
  * `String => String` boundary. Serializable so executors in local mode
  * can carry it through the embed UDF. */
final case class LoopbackTransport(url: String) extends (String => String) with Serializable {
  override def apply(body: String): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/json")
    val os = conn.getOutputStream
    try os.write(body.getBytes(StandardCharsets.UTF_8))
    finally os.close()
    val is = if (conn.getResponseCode >= 400) conn.getErrorStream else conn.getInputStream
    try new String(is.readAllBytes(), StandardCharsets.UTF_8)
    finally { is.close(); conn.disconnect() }
  }
}
