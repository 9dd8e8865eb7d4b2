package graft.ops

/** THE session-cache implementation — one bounded LRU keyed by
  * (session identity + semantic hash + params), shared by every
  * family that memoizes expensive intermediates within a Bench pass
  * (shingle/verified-pair tables in [[Dedup]], the IVF posting index
  * in [[IvfIndex]], the eval-family memo [[EvalCache]], the streaming
  * interval drive in [[graft.queries.TemporalQueries]]).
  *
  * Why one registry: the caches carry an identical contract (amortize
  * WITHIN a benchmark pass, cleared at pass/stress boundaries so
  * min-of-two still prices one cold build), but each used to hold its
  * own map and appear on Bench's clear list by hand. Twice in two
  * rounds a cache missing from that list produced phantom benchmark
  * readings (round-8 shingle warm-hit, round-9's 40-68x stress
  * "suspects" from a stale [[EvalCache]]). Construction-time
  * registration removes the class: a new cache is on the
  * [[SessionCache.clearAll]] path the moment it exists, and Bench
  * clears exactly one thing.
  */
final class SessionCache[K, V](maxEntries: Int) {
  require(maxEntries >= 1, "maxEntries must be >= 1")

  private val m = new java.util.LinkedHashMap[K, V](
      math.max(16, maxEntries * 2), 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      this.size() > maxEntries
  }

  SessionCache.register(this)

  /** Memoized build. `build` runs under the cache lock — the memoized
    * builds here are driver-side plan construction plus a lazy
    * localCheckpoint, and serializing them is the point (two gate rows
    * racing the same k-means build should share one). */
  def getOrElseUpdate(k: K)(build: => V): V = m.synchronized {
    val hit = m.get(k)
    if (hit != null) hit
    else {
      val v = build
      m.put(k, v)
      v
    }
  }

  def clear(): Unit = m.synchronized { m.clear() }

  private[graft] def size: Int = m.synchronized { m.size() }
}

object SessionCache {
  private val registry =
    new scala.collection.mutable.ArrayBuffer[SessionCache[_, _]]

  private def register(c: SessionCache[_, _]): Unit =
    registry.synchronized { registry += c }

  /** Clear EVERY session cache in the process — the single hook Bench
    * calls at pass and stress boundaries. */
  def clearAll(): Unit =
    registry.synchronized { registry.foreach(_.clear()) }

  private[graft] def registeredCount: Int =
    registry.synchronized { registry.size }
}
