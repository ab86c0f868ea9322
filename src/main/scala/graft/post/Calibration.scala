package graft.post

/** Reranker score calibration + consistency checks (SURVEY §2 E2/E3).
  *
  * Pure Scala over the small rerank batch (the reference computes this on
  * ≤10 scores per query, gemini_api.cpp:22-69): rolling mean/std EMA with
  * α=0.15, drift reset when |batchMean − mean| > 0.4, z-score normalization
  * rejecting |z| > 5, clamping to ±3, sigmoid to [0,1]; plus the
  * frozen-model variance check (gemini_api.cpp:202-208).
  */
object Calibration {

  final case class Stats(mean: Double, std: Double, n: Long) {
    def isWarm: Boolean = n > 0
  }
  val initial: Stats = Stats(0.5, 0.2, 0)

  val Alpha = 0.15
  val DriftThreshold = 0.4
  val ZReject = 5.0
  val ZClamp = 3.0
  val FrozenVarianceThreshold = 0.001

  /** Variance-around-0.5 consistency check: a batch of near-constant ~0.5
    * scores signals a frozen model; calibration must not learn from it. */
  def isFrozen(batch: Seq[Double]): Boolean = {
    if (batch.isEmpty) return false
    val dev = batch.map(s => (s - 0.5) * (s - 0.5)).sum / batch.size
    dev < FrozenVarianceThreshold
  }

  /** EMA update with drift detection: a batch whose mean jumped > 0.4 from
    * the rolling mean resets the stats to the batch (gemini_api.cpp:29-36). */
  def update(prev: Stats, batch: Seq[Double]): Stats = {
    if (batch.isEmpty || isFrozen(batch)) return prev
    val bMean = batch.sum / batch.size
    val bVar = batch.map(s => (s - bMean) * (s - bMean)).sum / batch.size
    val bStd = math.max(math.sqrt(bVar), 1e-6)
    if (!prev.isWarm || math.abs(bMean - prev.mean) > DriftThreshold)
      Stats(bMean, bStd, 1)
    else
      Stats(
        (1 - Alpha) * prev.mean + Alpha * bMean,
        math.max((1 - Alpha) * prev.std + Alpha * bStd, 1e-6),
        prev.n + 1)
  }

  /** Normalize one raw score: z-score, reject |z|>5 (None), clamp ±3,
    * sigmoid → [0,1] (gemini_api.cpp:59-69). */
  def normalize(stats: Stats, raw: Double): Option[Double] = {
    val z = (raw - stats.mean) / math.max(stats.std, 1e-6)
    if (math.abs(z) > ZReject) None
    else {
      val c = math.max(-ZClamp, math.min(ZClamp, z))
      Some(1.0 / (1.0 + math.exp(-c)))
    }
  }

  /** Calibrate a batch: update stats, normalize each score (rejected
    * outliers fall back to 0.5 neutral). */
  def calibrate(prev: Stats, batch: Seq[Double]): (Stats, Seq[Double]) = {
    val next = update(prev, batch)
    (next, batch.map(s => normalize(next, s).getOrElse(0.5)))
  }
}
