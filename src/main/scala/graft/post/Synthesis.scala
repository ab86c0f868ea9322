package graft.post

/** Claim synthesis support ops (SURVEY §2 E5–E7), minus the LLM call itself
  * (which is a pluggable boundary like the embedder).
  *
  * Driver-side: the reference runs these on ≤5 retrieved contexts
  * (gemini_api.cpp:391-409, :496-563). At corpus scale the same clustering
  * is a similarity self-join + connected components — covered by the
  * dedup_embedding_cosine query family.
  */
object Synthesis {

  /** Greedy single-link clustering: seed each unassigned context, absorb
    * all others with cosine > threshold (gemini_api.cpp:391-409). Returns
    * cluster index per input position. */
  def clusterContexts(embeddings: Seq[Array[Float]], threshold: Double = 0.85): Seq[Int] = {
    val n = embeddings.size
    val cluster = Array.fill(n)(-1)
    var next = 0
    var i = 0
    while (i < n) {
      if (cluster(i) < 0) {
        cluster(i) = next
        var j = i + 1
        while (j < n) {
          if (cluster(j) < 0 && cosine(embeddings(i), embeddings(j)) > threshold)
            cluster(j) = next
          j += 1
        }
        next += 1
      }
      i += 1
    }
    cluster.toSeq
  }

  final case class Claim(statement: String, sourceIndices: Seq[Int], confidence: Double)

  /** Claim confidence: mean finalScore of the validly-cited sources;
    * uncited claims fall back to top×0.5 (gemini_api.cpp:529-563). */
  def confidence(cited: Seq[Int], sourceScores: Seq[Double]): Double = {
    val valid = cited.filter(i => i >= 0 && i < sourceScores.size)
    if (valid.nonEmpty) valid.map(sourceScores).sum / valid.size
    else if (sourceScores.nonEmpty) sourceScores.max * 0.5
    else 0.0
  }

  /** Parse a raw LLM reply into validated claims — the reference's exact
    * response path (gemini_api.cpp:496-563): "No grounded answer"
    * short-circuit, outermost {...} span extraction, brace-balance
    * validation, "answer" array extraction, per-claim source-id validation
    * against the prompt-indexed contexts, mean confidence over the validly
    * cited sources with a top×0.5 fallback for uncited claims, empty
    * statements dropped. Jackson (shipped with Spark) stands in for Qt's
    * QJsonDocument; any parse failure yields zero claims, never a throw.
    *
    * @param contexts (promptIndex, finalScore) of the retrieved contexts,
    *                 in rank order (head = top result, the fallback base).
    */
  def parseClaims(report: String, contexts: Seq[(Int, Double)]): Seq[Claim] = {
    if (report.toLowerCase.contains("no grounded answer found")) return Nil
    val start = report.indexOf('{')
    val end = report.lastIndexOf('}')
    if (start < 0 || end <= start) return Nil // no JSON structural wrapper
    val jsonStr = report.substring(start, end + 1)
    if (!braceBalanced(jsonStr)) return Nil
    val scoreOf = contexts.toMap
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val arr = mapper.readTree(jsonStr).path("answer")
      if (!arr.isArray) return Nil
      (0 until arr.size).flatMap { i =>
        val item = arr.get(i)
        val statement = item.path("statement").asText("")
        val cited =
          if (item.path("sources").isArray)
            (0 until item.path("sources").size).map(j => item.path("sources").get(j).asInt)
          else Seq.empty[Int]
        val valid = cited.filter(scoreOf.contains)
        val conf =
          if (valid.nonEmpty) valid.map(scoreOf).sum / valid.size
          else if (contexts.nonEmpty) contexts.head._2 * 0.5
          else 0.0
        if (statement.isEmpty) None else Some(Claim(statement, valid, conf))
      }
    } catch { case _: Exception => Nil }
  }

  /** Brace-balance sanity check used before JSON claim parsing
    * (gemini_api.cpp:510-516). */
  def braceBalanced(s: String): Boolean = {
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '{') depth += 1
      else if (c == '}') { depth -= 1; if (depth < 0) return false }
      i += 1
    }
    depth == 0
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    if (a.length == 0 || a.length != b.length) return 0.0
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
