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
    @volatile private var done: Option[scala.util.Try[V]] = None
    // memoized as a Try: a bare `lazy val v: V` whose initializer throws
    // RE-RUNS the initializer on the next access (Scala lazy-val retry
    // semantics) — so a second caller blocked on a failed first build
    // would re-run the FIRST caller's closure after the failure, and a
    // late success would live outside the map (its slot already vacated)
    // and never reach onEvict. Try(…) never throws in the initializer,
    // so evaluation happens exactly once and every holder of a failed
    // memo rethrows the ORIGINAL failure instead of rebuilding.
    lazy val result: scala.util.Try[V] = {
      val r = scala.util.Try(build()); done = Some(r); r
    }
    def evaluated: Option[V] = done.flatMap(_.toOption) // non-forcing
    def failed: Boolean = done.exists(_.isFailure)      // non-forcing
  }

  // access-order LinkedHashMap = LRU; structural access synchronized
  private val map = new java.util.LinkedHashMap[K, Memo](16, 0.75f, true)

  def getOrBuild(key: K)(build: => V): V = {
    var evicted = List.empty[V]
    val memo = map.synchronized {
      // a terminally-failed memo found in the map (failure recorded but
      // not yet removed by its builder's catch, or re-observed by a
      // caller that raced the removal) is replaced under the lock with a
      // fresh memo built from THIS caller's closure
      Option(map.get(key)).filterNot(_.failed).getOrElse {
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
    // evaluated OUTSIDE the map lock (may run Spark jobs)
    memo.result match {
      case scala.util.Success(v) => v
      case scala.util.Failure(t) =>
        // a failed build must not squat in the map: the dead memo would
        // occupy an LRU slot and never fire onEvict. Remove it (the `eq`
        // check guards a concurrent re-insert) so the next caller builds
        // fresh with its OWN closure; concurrent holders of THIS memo
        // rethrow the memoized failure (never re-running the closure —
        // see Memo.result).
        map.synchronized { if (map.get(key) eq memo) map.remove(key) }
        throw t
    }
  }
}
