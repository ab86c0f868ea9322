package graft.post

import graft.embed.Embedder
import graft.search.HybridEngine

/** Deep-dive synthesis orchestration (SURVEY §2 E5–E8, §3.3).
  *
  * Pipeline: top-5 results → context expansion (±2 chunks) → greedy
  * semantic clustering (cosine > 0.85) → claim synthesis → source
  * validation + confidence. The LLM is a pluggable boundary
  * ([[SynthesisModel]]); the hermetic default emits one claim per cluster
  * (lead sentence of its best source), keeping the pipeline deterministic.
  */
trait SynthesisModel extends Serializable {
  /** Produce (statement, citedClusterMembers) claims from clustered facts. */
  def synthesize(clusters: Seq[Seq[(Int, String)]]): Seq[(String, Seq[Int])]
}

final case class LeadSentenceSynthesis() extends SynthesisModel {
  override def synthesize(clusters: Seq[Seq[(Int, String)]]): Seq[(String, Seq[Int])] =
    clusters.map { members =>
      val lead = members.head._2.split("(?<=[.?!])\\s+").headOption.getOrElse(members.head._2)
      (lead.take(300), members.map(_._1))
    }
}

/** Adapter for a REAL deployment's LLM boundary: the model returns the raw
  * reply string (prose + embedded JSON), which flows through the
  * reference's full validation path (brace balance, answer-array parse,
  * source-id membership — [[Synthesis.parseClaims]], gemini_api.cpp:496-563)
  * before any claim reaches the pipeline. */
final case class RawJsonReplySynthesis(model: Seq[Seq[(Int, String)]] => String)
    extends SynthesisModel {
  override def synthesize(clusters: Seq[Seq[(Int, String)]]): Seq[(String, Seq[Int])] = {
    val memberIds = clusters.flatten.map(_._1).distinct.sorted
    Synthesis.parseClaims(model(clusters), memberIds.map(i => i -> 0.0))
      .map(c => (c.statement, c.sourceIndices))
  }
}

object DeepDive {

  final case class DeepDiveClaim(statement: String, sources: Seq[Int], confidence: Double)

  def run(engine: HybridEngine, query: String, embedder: Embedder,
          model: SynthesisModel = LeadSentenceSynthesis(),
          topN: Int = 5, contextOffset: Int = 2): Seq[DeepDiveClaim] = {
    val top = engine.search(query, embedder, topN)
    if (top.isEmpty) return Seq.empty
    // context expansion per hit (D13/D14): widened chunk text
    val contexts = top.map { hit =>
      val ctx = engine.context(hit.id, contextOffset)
        .collect().map(_.getAs[String]("text_chunk")).mkString(" ")
      hit -> (if (ctx.nonEmpty) ctx else hit.text)
    }
    // E5: greedy single-link clustering of the expanded contexts
    val embs = contexts.map { case (_, text) => embedder.embed(text) }
    val clusterIdx = Synthesis.clusterContexts(embs, threshold = 0.85)
    val clusters = clusterIdx.zipWithIndex.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, members) => members.map { case (_, i) => (i, contexts(i)._2) } }
    // E6/E7: synthesize + validate + confidence
    val scores = top.map(_.score)
    model.synthesize(clusters).map { case (statement, cited) =>
      DeepDiveClaim(statement, cited.filter(i => i >= 0 && i < topN),
        Synthesis.confidence(cited, scores))
    }
  }
}
