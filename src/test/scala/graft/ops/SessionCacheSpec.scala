package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The unified session-cache registry (verdict r9 task #4). */
class SessionCacheSpec extends AnyFunSuite {

  test("getOrElseUpdate memoizes, LRU-evicts at the bound") {
    val c = new SessionCache[Int, String](2)
    var builds = 0
    def get(k: Int) = c.getOrElseUpdate(k) { builds += 1; s"v$k" }
    assert(get(1) === "v1" && get(1) === "v1")
    assert(builds === 1)
    get(2); get(1) // touch 1 so 2 is eldest
    get(3) // evicts 2
    assert(builds === 3)
    get(1)
    assert(builds === 3, "1 must still be cached")
    get(2)
    assert(builds === 4, "2 must have been evicted")
  }

  test("clearAll reaches every registered cache, including new ones") {
    val before = SessionCache.registeredCount
    val a = new SessionCache[Int, Int](4)
    val b = new SessionCache[String, String](4)
    assert(SessionCache.registeredCount === before + 2,
      "construction must register — the whole point of the registry")
    a.getOrElseUpdate(1)(10); b.getOrElseUpdate("x")("y")
    assert(a.size === 1 && b.size === 1)
    SessionCache.clearAll()
    assert(a.size === 0 && b.size === 0)
    // production caches (shingle/pairs/IVF/eval/interval-drive) are
    // object vals: the registry must already know at least those five
    // once their owners are loaded
    graft.ops.EvalCache.clear() // force EvalCache object init
    assert(SessionCache.registeredCount >= 3)
  }
}
