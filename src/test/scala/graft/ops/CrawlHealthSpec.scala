package graft.ops

import graft.SparkSpec

/** [[CrawlHealth]] mechanics at unit scale (q421/q422/q424 gate the
  * corpus-scale constructions): mirror arithmetic + the size prune,
  * breaker run detection, probe-based soft-404 semantics. */
class CrawlHealthSpec extends SparkSpec {
  import spark.implicits._

  test("hostMirrors: full mirror, partial containments, size prune") {
    val crawl = Seq(
      // a = {1,2,3,4}; b = full mirror; c = {1,2} (J=0.5, contained)
      ("a", "1"), ("a", "2"), ("a", "3"), ("a", "4"),
      ("b", "1"), ("b", "2"), ("b", "3"), ("b", "4"),
      ("c", "1"), ("c", "2"),
      // d shares 1 hash with a -> J=1/5 < 0.5: filtered
      ("d", "1"), ("d", "9"),
      // e is tiny vs a (1 of 4): size ratio 0.25 < 0.5 prunes the
      // pair before any Jaccard is computed
      ("e", "1")
    ).toDF("host", "hash")
    val got = CrawlHealth.hostMirrors(crawl, "host", "hash", 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7)))).toMap
    assert(got(("a", "b")) === ((4L, 4L, 4L, 1.0, 1.0, 1.0)))
    assert(got(("a", "c")) === ((4L, 2L, 2L, 0.5, 0.5, 1.0)),
      "partial mirror: containment_b = 1 flags c as contained in a")
    assert(got(("b", "c")) === ((4L, 2L, 2L, 0.5, 0.5, 1.0)))
    assert(!got.contains(("a", "d")), "J below threshold filtered")
    assert(!got.contains(("a", "e")), "size-ratio prune")
    assert(!got.contains(("c", "d")), "J = 1/3 filtered")
    // the tiny e ({1}) legitimately pairs with the 2-element hosts:
    // J(c,e) = J(d,e) = 1/2 at size ratio exactly 0.5
    assert(got(("c", "e")) === ((2L, 1L, 1L, 0.5, 0.5, 1.0)))
    assert(got(("d", "e")) === ((2L, 1L, 1L, 0.5, 0.5, 1.0)))
    assert(got.size === 5)
  }

  test("circuitBreakers: runs, trailing open run, trip threshold") {
    val events = Seq(
      // h: ok F F F ok F  -> max run 3 (tripped), open run 1
      ("h", 1L, true), ("h", 2L, false), ("h", 3L, false),
      ("h", 4L, false), ("h", 5L, true), ("h", 6L, false),
      // g: F ok -> max 1, open 0, not tripped
      ("g", 1L, false), ("g", 2L, true),
      // k: all ok -> zeros
      ("k", 1L, true), ("k", 2L, true)
    ).toDF("host", "ord", "ok")
    val got = CrawlHealth.circuitBreakers(events, "host", "ord", "ok",
        tripAt = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(got("h") === ((6L, 4L, 3L, 1L, true)))
    assert(got("g") === ((2L, 1L, 1L, 0L, false)))
    assert(got("k") === ((2L, 0L, 0L, 0L, false)))
  }

  test("soft404: fingerprint match flags, probeless hosts never flag") {
    val pages = Seq(
      ("a", "/1", "x"), ("a", "/2", "err-a"), ("a", "/3", "y"),
      ("b", "/1", "err-b")  // b has no probe row
    ).toDF("host", "url", "hash")
    val probes = Seq(("a", "err-a")).toDF("host", "fp")
    val got = CrawlHealth.soft404(pages, "host", "url", "hash",
        probes, "host", "fp")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getBoolean(3)).toMap
    assert(got(("a", "/2")) === true)
    assert(got(("a", "/1")) === false)
    assert(got(("b", "/1")) === false,
      "no probe -> no fingerprint -> never flagged")
  }
}
