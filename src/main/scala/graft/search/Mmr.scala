package graft.search

import graft.model.{Intent, ScoredChunk}

/** Adaptive MMR diversification + exploration injection (SURVEY §2 D10/D11).
  *
  * Deliberately driver-side: the greedy selection is sequential over the
  * collected top-N (N ≤ ~30), exactly where the reference also collapses to
  * in-memory vectors (vector_store.cpp:460-554). Tie-breaks are pinned
  * (score desc, id asc) per SURVEY §7.4 risk 3.
  */
object Mmr {

  /** λ from query complexity: sigmoid(5·(complexity−0.5)) clamped [0.2,0.8];
    * complexity = words/10 (+0.5 for Summary/Procedure)
    * (vector_store.cpp:463-468). */
  def lambda(query: String, intent: Intent): Double = {
    val words = query.trim.split("\\s+").count(_.nonEmpty)
    val complexity = words / 10.0 +
      (if (intent == Intent.Summary || intent == Intent.Procedure) 0.5 else 0.0)
    val l = 1.0 / (1.0 + math.exp(-5.0 * (complexity - 0.5)))
    math.max(0.2, math.min(0.8, l))
  }

  /** Shannon entropy in raw bits (NOT normalized) of the candidates' doc
    * distribution — the reference feeds the unnormalized value straight into
    * the 0.15·(1.1−H) penalty (vector_store.cpp:470-483, :507). */
  def docEntropy(candidates: Seq[ScoredChunk]): Double = {
    if (candidates.isEmpty) return 0.0
    val n = candidates.size.toDouble
    val counts = candidates.groupBy(_.docId).values.map(_.size.toDouble)
    -counts.map { c => val p = c / n; p * (math.log(p) / math.log(2.0)) }.sum
  }

  /** EMA smoothing of the entropy signal: α=0.3 for the first 10 searches,
    * 0.1 after; the EMA state starts at 0.0, so the first search already
    * blends toward zero (vector_store.h:150, vector_store.cpp:478-483). */
  def smoothEntropy(prev: Option[Double], current: Double, searchCount: Long): Double = {
    val alpha = if (searchCount < 10) 0.3 else 0.1
    alpha * current + (1 - alpha) * prev.getOrElse(0.0)
  }

  /** MMR result: the diversified list plus the total diversity penalty
    * spent — the reference accumulates `mmrPenaltyTotal` and logs it
    * (vector_store.cpp:461, :527, :570). */
  final case class Selection(selected: Seq[ScoredChunk], penaltyTotal: Double)

  /** Greedy MMR selection: mmr = λ·score − (1−λ)·penalty, with a FLAT
    * 0.15·(1.1−entropy) penalty on repeated-doc membership (not scaled by
    * repeat count) + 0.1 per repeated heading path (vector_store.cpp:485-530:
    * `selectedDocs.contains(candidate.docId)` is a boolean gate). */
  def select(candidates: Seq[ScoredChunk], k: Int, lam: Double, entropy: Double): Selection = {
    val pool = scala.collection.mutable.ArrayBuffer.from(
      candidates.sortBy(c => (-c.score, c.id)))
    val selected = scala.collection.mutable.ArrayBuffer.empty[ScoredChunk]
    val seenDocs = scala.collection.mutable.Set.empty[String]
    val seenHeadings = scala.collection.mutable.Set.empty[String]
    var penaltyTotal = 0.0
    while (selected.size < k && pool.nonEmpty) {
      var bestIdx = 0
      var bestMmr = Double.NegativeInfinity
      var bestPenalty = 0.0
      var i = 0
      while (i < pool.size) {
        val c = pool(i)
        val docPenalty = if (seenDocs.contains(c.docId)) 0.15 * (1.1 - entropy) else 0.0
        val headPenalty = if (c.headingPath != null && seenHeadings.contains(c.headingPath)) 0.1 else 0.0
        val mmr = lam * c.score - (1 - lam) * (docPenalty + headPenalty)
        // strict > keeps the earlier (higher score, lower id) element on ties
        if (mmr > bestMmr) { bestMmr = mmr; bestIdx = i; bestPenalty = docPenalty + headPenalty }
        i += 1
      }
      val chosen = pool.remove(bestIdx)
      penaltyTotal += bestPenalty
      selected += chosen
      seenDocs += chosen.docId
      if (chosen.headingPath != null) seenHeadings += chosen.headingPath
    }
    Selection(selected.toSeq, penaltyTotal)
  }

  /** Exploration injection (vector_store.cpp:533-554): if stability ≥ 0.6 and
    * intent ∉ {Definition, Procedure}, promote the first below-cutoff
    * candidate that was never clicked (trust ≤ 1.0) and whose RAW COSINE
    * exceeds 0.65 (the reference gates on semantic similarity, not the
    * fused score — vector_store.cpp:546), to rank 2 with
    * score = top×0.95, flagged isExploration. */
  def injectExploration(
      ranked: Seq[ScoredChunk],
      belowCutoff: Seq[ScoredChunk],
      stability: Double,
      intent: Intent): Seq[ScoredChunk] = {
    if (stability < 0.6 || intent == Intent.Definition || intent == Intent.Procedure || ranked.isEmpty)
      return ranked
    belowCutoff.find(c => c.trustScore <= 1.0 && c.semScore > 0.65) match {
      case None => ranked
      case Some(probe) =>
        val top = ranked.head.score
        val marked = probe.copy(score = top * 0.95, isExploration = true)
        (ranked.take(1) :+ marked) ++ ranked.drop(1)
    }
  }
}
