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

  /** Shannon entropy (base 2, normalized to [0,1]) of the candidates' doc
    * distribution (vector_store.cpp:470-483). */
  def docEntropy(candidates: Seq[ScoredChunk]): Double = {
    if (candidates.isEmpty) return 0.0
    val n = candidates.size.toDouble
    val counts = candidates.groupBy(_.docId).values.map(_.size.toDouble)
    val h = -counts.map { c => val p = c / n; p * (math.log(p) / math.log(2.0)) }.sum
    val hMax = math.log(counts.size.toDouble) / math.log(2.0)
    if (hMax == 0.0) 0.0 else h / hMax
  }

  /** EMA smoothing of the entropy signal: α=0.3 for the first 10 searches,
    * 0.1 after (vector_store.cpp:478-483). */
  def smoothEntropy(prev: Option[Double], current: Double, searchCount: Long): Double = {
    val alpha = if (searchCount < 10) 0.3 else 0.1
    prev.fold(current)(p => (1 - alpha) * p + alpha * current)
  }

  /** Greedy MMR selection: mmr = λ·score − (1−λ)·penalty, with penalty
    * 0.15·(1.1−entropy) per repeated doc + 0.1 per repeated heading path
    * (vector_store.cpp:485-530). */
  def select(candidates: Seq[ScoredChunk], k: Int, lam: Double, entropy: Double): Seq[ScoredChunk] = {
    val pool = scala.collection.mutable.ArrayBuffer.from(
      candidates.sortBy(c => (-c.score, c.id)))
    val selected = scala.collection.mutable.ArrayBuffer.empty[ScoredChunk]
    val seenDocs = scala.collection.mutable.Map.empty[String, Int]
    val seenHeadings = scala.collection.mutable.Set.empty[String]
    while (selected.size < k && pool.nonEmpty) {
      var bestIdx = 0
      var bestMmr = Double.NegativeInfinity
      var i = 0
      while (i < pool.size) {
        val c = pool(i)
        val docPenalty = seenDocs.getOrElse(c.docId, 0) * 0.15 * (1.1 - entropy)
        val headPenalty = if (c.headingPath != null && seenHeadings.contains(c.headingPath)) 0.1 else 0.0
        val mmr = lam * c.score - (1 - lam) * (docPenalty + headPenalty)
        // strict > keeps the earlier (higher score, lower id) element on ties
        if (mmr > bestMmr) { bestMmr = mmr; bestIdx = i }
        i += 1
      }
      val chosen = pool.remove(bestIdx)
      selected += chosen
      seenDocs.update(chosen.docId, seenDocs.getOrElse(chosen.docId, 0) + 1)
      if (chosen.headingPath != null) seenHeadings += chosen.headingPath
    }
    selected.toSeq
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
