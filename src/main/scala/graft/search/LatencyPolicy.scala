package graft.search

/** Latency-adaptive degradation policy (SURVEY §2 D17).
  *
  * EMA of search latency (seed 100ms, new = 0.8·old + 0.2·measured,
  * vector_store.cpp:322, :388); above 1500ms the candidate depth shrinks to
  * 3×limit; above 4000ms (unless the intent is Summary) the vector branch
  * is bypassed entirely — FTS-only with flat 0.5 scores
  * (vector_store.cpp:321-337). Deterministic, config-driven; disabled by
  * default in benchmarks (the engine is already deterministic, D19).
  */
final class LatencyPolicy(seedMs: Double = 100.0) {

  val HighMs = 1500.0
  val CriticalMs = 4000.0

  // @volatile: readers (emaMs, decide) are lock-free — without it a
  // non-volatile Double can be read torn/stale under the JMM when a
  // streaming-ingest thread records while a search thread decides
  @volatile private var ema = seedMs

  def record(measuredMs: Double): Unit = synchronized { ema = 0.8 * ema + 0.2 * measuredMs }
  def emaMs: Double = ema

  sealed trait Decision
  case object Normal extends Decision
  /** depth shrinks to 3×limit */
  case object Degraded extends Decision
  /** keyword-only, flat 0.5 scores */
  case object KeywordOnly extends Decision

  def decide(isSummaryIntent: Boolean): Decision =
    if (ema > CriticalMs && !isSummaryIntent) KeywordOnly
    else if (ema > HighMs) Degraded
    else Normal

  /** Overfetch factor under the current policy (vector_store.cpp:334-337). */
  def depthFactor(intentFactor: Int): Int =
    decide(isSummaryIntent = false) match {
      case Degraded | KeywordOnly => math.min(intentFactor, 3)
      case Normal                 => intentFactor
    }
}
