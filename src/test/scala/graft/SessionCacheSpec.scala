package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.SessionCache

/** Lifecycle contract of the bounded session memo cache: single build under
  * races, LRU eviction with release hook, and — the round-13 fix — a FAILED
  * build must vacate its slot (retry builds fresh; the dead entry neither
  * occupies LRU capacity nor silently replays the first caller's closure). */
class SessionCacheSpec extends AnyFunSuite {

  test("failed build is evicted: retry runs the NEW caller's closure") {
    val cache = new SessionCache[String, Int](4)
    val ex = intercept[RuntimeException] {
      cache.getOrBuild("k") { throw new RuntimeException("boom") }
    }
    assert(ex.getMessage == "boom")
    // the throwing memo must be gone: this closure (not the first one)
    // runs, so a transient failure doesn't poison the key
    var builds = 0
    val v = cache.getOrBuild("k") { builds += 1; 42 }
    assert(v == 42 && builds == 1)
    // and the healthy entry memoizes as usual
    assert(cache.getOrBuild("k") { builds += 1; -1 } == 42)
    assert(builds == 1)
  }

  test("failed build never occupies an LRU slot or fires onEvict") {
    var evicted = List.empty[Int]
    val cache = new SessionCache[String, Int](2, v => evicted ::= v)
    intercept[RuntimeException] {
      cache.getOrBuild("dead") { throw new RuntimeException("boom") }
    }
    assert(cache.getOrBuild("a") { 1 } == 1)
    assert(cache.getOrBuild("b") { 2 } == 2)
    // cap 2 and "dead" vacated → no eviction yet; "dead" never reaches onEvict
    assert(evicted.isEmpty)
    assert(cache.getOrBuild("c") { 3 } == 3) // evicts the LRU evaluated entry
    assert(evicted == List(1))
  }

  test("onEvict fires for an entry that failed once then succeeded") {
    var evicted = List.empty[Int]
    val cache = new SessionCache[String, Int](1, v => evicted ::= v)
    intercept[RuntimeException] {
      cache.getOrBuild("k") { throw new RuntimeException("first try") }
    }
    assert(cache.getOrBuild("k") { 7 } == 7) // retry succeeds
    assert(cache.getOrBuild("other") { 8 } == 8) // cap 1 → evicts k's 7
    assert(evicted == List(7))
  }

  test("concurrent first calls share one build (holders, not values)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val cache = new SessionCache[String, Int](4)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val results = Await.result(
      Future.sequence((1 to 8).map(_ => Future {
        cache.getOrBuild("k") { Thread.sleep(20); builds.incrementAndGet(); 5 }
      })), 30.seconds)
    assert(results.forall(_ == 5))
    assert(builds.get == 1)
  }

  test("concurrent holders of a FAILED build rethrow the original failure; the closure never re-runs") {
    // round-14 advice: a bare lazy val retries a thrown initializer, so a
    // second caller blocked on the same memo would RE-RUN the first
    // caller's closure — and a late success would live outside the map,
    // never reaching onEvict. The Try-memoized result pins: one run, all
    // holders of THAT memo see the same failure. (A caller arriving AFTER
    // the failure vacated the slot legitimately builds fresh — the first
    // test above — so this one latches both holders onto the memo BEFORE
    // letting it fail, making the run count deterministic.)
    var evicted = List.empty[Int]
    val cache = new SessionCache[String, Int](4, v => evicted ::= v)
    val runs = new java.util.concurrent.atomic.AtomicInteger(0)
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val build: () => Int = () => {
      runs.incrementAndGet()
      started.countDown()
      release.await()
      throw new RuntimeException("boom")
    }
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[scala.util.Try[Int]]
    val a = new Thread(() => outcomes.add(scala.util.Try(cache.getOrBuild("k")(build()))))
    a.start()
    started.await() // A is inside the build: the memo is in the map, un-failed
    val b = new Thread(() => outcomes.add(scala.util.Try(cache.getOrBuild("k")(build()))))
    b.start()
    // B must fetch A's memo (it is present and not failed) and block on
    // its single evaluation (the memo's lazy-val monitor, held by A for
    // as long as `release` stays closed). Require the blocked state to
    // PERSIST across consecutive samples: a transient block on the
    // (uncontended, instantly-released) map lock cannot, so a stable
    // block proves B is parked on the memo itself.
    var stable = 0
    while (stable < 5) {
      val s = b.getState
      if (s == Thread.State.BLOCKED || s == Thread.State.WAITING) stable += 1
      else stable = 0
      Thread.sleep(2)
    }
    release.countDown()
    a.join(30000); b.join(30000)
    assert(outcomes.size == 2)
    assert(outcomes.stream.allMatch(o => o.isFailure && o.failed.get.getMessage == "boom"))
    assert(runs.get == 1, "the failed closure must evaluate exactly once")
    assert(evicted.isEmpty, "no value ever existed, so onEvict must not fire")
    // the key is vacated: a fresh caller's own closure builds clean
    assert(cache.getOrBuild("k") { 9 } == 9)
  }
}
