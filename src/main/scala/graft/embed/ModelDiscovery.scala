package graft.embed

/** Model discovery + capability inference (SURVEY §2 A9).
  *
  * The reference GETs Ollama `/api/tags` and LM Studio `/v1/models` and
  * infers capabilities from name substrings (gemini_api.cpp:664-737). The
  * HTTP fetch is a driver-side utility outside the data plane; the
  * capability inference is the testable logic and is reproduced here.
  */
object ModelDiscovery {

  sealed trait Capability
  case object Embedding extends Capability
  case object Chat extends Capability
  case object Rerank extends Capability
  case object Summary extends Capability

  final case class ModelInfo(name: String, provider: String, capabilities: Set[Capability])

  /** Name-substring capability inference (gemini_api.cpp:700-724):
    * "embed"/"nomic"/"minilm" → Embedding; "rerank"/"bge" → Rerank;
    * anything else → Chat+Summary+Rerank (general instruct models can do
    * all three via prompting). */
  def inferCapabilities(name: String): Set[Capability] = {
    val n = name.toLowerCase
    if (n.contains("embed") || n.contains("nomic") || n.contains("minilm"))
      Set(Embedding)
    else if (n.contains("rerank") || n.contains("bge"))
      Set(Rerank)
    else
      Set(Chat, Summary, Rerank)
  }

  def classify(names: Seq[(String, String)]): Seq[ModelInfo] =
    names.map { case (name, provider) => ModelInfo(name, provider, inferCapabilities(name)) }

  /** First model able to serve the capability, by provider preference order. */
  def pick(models: Seq[ModelInfo], cap: Capability,
           providerOrder: Seq[String] = Seq("ollama", "lmstudio", "gemini")): Option[ModelInfo] = {
    val ranked = models.filter(_.capabilities.contains(cap))
      .sortBy(m => {
        val i = providerOrder.indexOf(m.provider)
        (if (i < 0) providerOrder.size else i, m.name)
      })
    ranked.headOption
  }
}
