package graft.util

/** Bounded, race-safe memo cache for per-(session, corpus) derived
  * artifacts — embedded chunk tables, posting indexes, warm ANN engines,
  * trained codebooks, table statistics.
  *
  * Two failure modes of a bare `TrieMap.getOrElseUpdate` this fixes
  * (round-12 advice):
  *
  *  - **racing first builds**: `getOrElseUpdate` evaluates its default
  *    outside any lock, so two concurrent first calls both run the build
  *    — for a warm-engine cache that is a full ingest + IVF train whose
  *    loser is dropped but whose workspace and cached blocks leak. Here
  *    the map stores lazy HOLDERS: losers of the map race get the
  *    winning holder back and block on its single evaluation; a losing
  *    holder's build never runs.
  *  - **unbounded growth**: entries accumulated per corpus for the whole
  *    session lifetime. The map is LRU-bounded; eviction hands the built
  *    value to `onEvict` (unpersist / release). A still-mid-build holder
  *    is never evicted (its caller is attached); with the caps used here
  *    (≥ 8, vs ≤ 3 corpora in any gate/bench lifecycle) eviction is a
  *    long-lived-embedding safety valve, not a hot path.
  *
  * See docs/PLANS.md "Session caches" for the policy.
  */
final class SessionCache[K, V](maxEntries: Int, onEvict: V => Unit = (_: V) => ()) {
  require(maxEntries > 0)

  private final class Memo(build: () => V) {
    @volatile private var built: Option[V] = None
    lazy val value: V = { val v = build(); built = Some(v); v }
    def evaluated: Option[V] = built
  }

  // access-order LinkedHashMap = LRU; structural access synchronized
  private val map = new java.util.LinkedHashMap[K, Memo](16, 0.75f, true)

  def getOrBuild(key: K)(build: => V): V = {
    var evicted = List.empty[V]
    val memo = map.synchronized {
      Option(map.get(key)).getOrElse {
        val m = new Memo(() => build)
        map.put(key, m)
        var over = map.size - maxEntries
        val it = map.entrySet().iterator()
        while (it.hasNext && over > 0) {
          val e = it.next()
          // evict only EVALUATED entries (a mid-build holder has a caller
          // attached; evicting it would orphan the build)
          if ((e.getValue ne m) && e.getValue.evaluated.isDefined) {
            it.remove()
            e.getValue.evaluated.foreach(v => evicted ::= v)
            over -= 1
          }
        }
        m
      }
    }
    // release hooks run OUTSIDE the map lock — an onEvict that closes a
    // warm engine (flush + unpersist) runs Spark jobs
    evicted.foreach(onEvict)
    try memo.value // evaluated OUTSIDE the map lock (may run Spark jobs)
    catch {
      case t: Throwable =>
        // a failed build must not squat in the map: the dead memo would
        // occupy an LRU slot, never fire onEvict, and retry the FIRST
        // caller's captured closure forever. Remove it (the `eq` check
        // guards a concurrent re-insert) so the next caller builds fresh
        // with its OWN closure.
        map.synchronized { if (map.get(key) eq memo) map.remove(key) }
        throw t
    }
  }
}
