package graft.post

import graft.model.ScoredChunk

/** Cross-encoder reranking (SURVEY §2 E1) behind a pluggable model trait.
  *
  * The reference prompts an LLM with ≤10 candidates (text truncated to 500
  * chars) and parses a JSON score array (gemini_api.cpp:79-178); the model
  * call is a black-box boundary exactly like the embedder. For hermetic
  * tests we ship a deterministic lexical-overlap scorer with the same
  * contract. Scores run through [[Calibration]] before use.
  */
trait RerankModel extends Serializable {
  /** One score per candidate text, same order. */
  def score(query: String, texts: Seq[String]): Seq[Double]
}

/** Deterministic stand-in: Jaccard overlap of token sets (a real deployment
  * swaps in an HTTP cross-encoder; the pipeline shape is identical). */
final case class LexicalOverlapModel() extends RerankModel {
  private def toks(s: String): Set[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
  override def score(query: String, texts: Seq[String]): Seq[Double] = {
    val q = toks(query)
    texts.map { t =>
      val tt = toks(t)
      if (q.isEmpty || tt.isEmpty) 0.0
      else (q & tt).size.toDouble / (q | tt).size
    }
  }
}

object Reranker {

  val BatchCap = 10      // mainwindow.cpp:566
  val TextCap = 500      // gemini_api.cpp:85

  final case class Result(reranked: Seq[ScoredChunk], stats: Calibration.Stats,
                          modelFrozen: Boolean)

  /** Rerank the top candidates: cap at 10, truncate texts to 500 chars,
    * score, calibrate, sort desc (stable on prior order for ties), keep k.
    * A frozen model (E3) skips calibration update AND leaves the input
    * order unchanged — an anomaly signal, not a reorder. */
  def rerank(query: String, candidates: Seq[ScoredChunk], k: Int,
             model: RerankModel, stats: Calibration.Stats): Result = {
    val batch = candidates.take(BatchCap)
    val raw = model.score(query, batch.map(_.text.take(TextCap)))
    if (Calibration.isFrozen(raw))
      return Result(candidates.take(k), stats, modelFrozen = true)
    val (nextStats, calibrated) = Calibration.calibrate(stats, raw)
    val reranked = batch.zip(calibrated)
      .sortBy { case (c, s) => (-s, c.id) }
      .map { case (c, s) => c.copy(score = s) }
    Result((reranked ++ candidates.drop(BatchCap)).take(k), nextStats, modelFrozen = false)
  }
}
