package graft.ops

import graft.SparkSpec

class GraphStatsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(edges: Seq[(String, String)]) =
    GraphStats.triangleStats(edges.toDF("a", "b"), "a", "b")
      .collect()(0)

  test("triangle, path, and closed-star hand-checks") {
    val tri = stats(Seq(("a", "b"), ("b", "c"), ("a", "c")))
    assert((tri.getLong(0), tri.getLong(1), tri.getLong(2),
      tri.getLong(3), tri.getDouble(4)) == ((3L, 3L, 3L, 1L, 1.0)))
    val path = stats(Seq(("a", "b"), ("b", "c")))
    assert(path.getLong(3) == 0L && path.getDouble(4) == 0.0)
    // star a-{b,c,d} plus b-c: wedges = 3 (at a) + 1 (at b) + 1 (at c),
    // one triangle
    val star = stats(Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c")))
    assert((star.getLong(0), star.getLong(1), star.getLong(2),
      star.getLong(3)) == ((4L, 4L, 5L, 1L)))
    assert(star.getDouble(4) == 0.6)
  }

  test("self-loops, duplicates, and reverse edges canonicalize away") {
    val messy = stats(Seq(("a", "a"), ("a", "b"), ("b", "a"), ("a", "b"),
      ("b", "c"), ("c", "a")))
    assert((messy.getLong(0), messy.getLong(1), messy.getLong(3)) ==
      ((3L, 3L, 1L)))
  }

  test("degree-ordered count equals brute force on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 120).map(_ =>
      (s"n${rnd.nextInt(18)}", s"n${rnd.nextInt(18)}"))
    val canon = edges.filter { case (u, v) => u != v }
      .map { case (u, v) => if (u < v) (u, v) else (v, u) }.distinct
    val es = canon.toSet
    val nodes = canon.flatMap { case (u, v) => Seq(u, v) }.distinct.sorted
    var brute = 0L
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      if es((nodes(i), nodes(j))) && es((nodes(j), nodes(k))) &&
        es((nodes(i), nodes(k)))
    } brute += 1
    val got = stats(edges)
    assert(got.getLong(1) == canon.size.toLong)
    assert(got.getLong(3) == brute)
  }

  test("wedge-free graph reports null clustering coefficient") {
    val iso = stats(Seq(("a", "b"), ("c", "d")))
    assert(iso.getLong(2) == 0L && iso.isNullAt(4))
  }

  private def ranks(edges: Seq[(Long, Long)], nodes: Seq[Long],
      iters: Int = 5): Map[Long, Long] =
    GraphStats.pageRank(edges.toDF("s", "d"), "s", "d",
        nodes.toDF("id"), "id", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pageRank: hub of a star in-graph outranks its spokes") {
    // 1,2,3 all point at 0; 0 is dangling
    val r = ranks(Seq((1L, 0L), (2L, 0L), (3L, 0L)), Seq(0L, 1L, 2L, 3L))
    assert(r(0L) > r(1L))
    assert(r(1L) == r(2L) && r(2L) == r(3L))
  }

  test("pageRank: integer quanta match the hand-rolled recurrence") {
    // two nodes, 0 -> 1, node 1 dangling; replicate the exact integer
    // arithmetic: base + 85*(dangling/N + incoming q div outdeg) div 100
    val scale = 1000000000000L
    val n = 2L
    val base = (scale - scale * 85 / 100) / n
    var q0 = scale / n; var q1 = scale / n
    for (_ <- 1 to 5) {
      val dShare = q1 / n // node 1 is dangling
      val n0 = base + (85L * (dShare + 0L)) / 100
      val n1 = base + (85L * (dShare + q0 / 1L)) / 100
      q0 = n0; q1 = n1
    }
    val r = ranks(Seq((0L, 1L)), Seq(0L, 1L))
    assert(r == Map(0L -> q0, 1L -> q1))
  }

  test("pageRank: total mass stays within truncation loss of scale") {
    val r = ranks(Seq((1L, 0L), (2L, 0L), (0L, 2L), (3L, 1L)),
      Seq(0L, 1L, 2L, 3L, 4L))
    val total = r.values.sum
    // every division truncates, so mass only leaks DOWN, and by less
    // than a few quanta per node per iteration
    assert(total <= 1000000000000L)
    assert(total > 999999990000L)
    assert(r.keySet == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("pageRank: duplicate and reversed edges are collapsed, not double-counted") {
    val once = ranks(Seq((0L, 1L)), Seq(0L, 1L))
    val dup = ranks(Seq((0L, 1L), (0L, 1L)), Seq(0L, 1L))
    assert(once == dup)
  }

  test("kCore: cascading peel, whole-graph dissolution, maxIter guard") {
    // triangle a-b-c with a pendant chain c-d-e: e (deg 1) peels
    // first, which drops d to deg 1 -> second round peels d; the
    // triangle is the 2-core.
    val g = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"),
      ("d", "e")).toDF("x", "y")
    val core2 = GraphStats.kCore(g, "x", "y", k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core2 == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // k=3: the triangle's degree-2 vertices peel too -> empty core
    assert(GraphStats.kCore(g, "x", "y", k = 3).isEmpty)
    // the cascade needs 2 peel rounds + 1 fixpoint check; maxIter=2
    // must throw rather than return a non-fixpoint
    intercept[IllegalArgumentException] {
      GraphStats.kCore(g, "x", "y", k = 2, maxIter = 2)
    }
    // duplicate/reversed edges collapse before degrees are counted
    val dup = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"),
      ("a", "c")).toDF("x", "y")
    val c = GraphStats.kCore(dup, "x", "y", k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }

  test("hits: hubs and authorities separate; max-normalization " +
    "yields exact integer scores") {
    // two hubs point at one shared authority; hub 1 also points at a
    // second, weaker authority. After one iteration:
    //   rawA: a10 <- h1+h2 = 2e6 (max), a11 <- 1e6 -> auth 1e6 / 5e5
    //   rawH: h1 <- a10+a11 = 1.5e6 (max) -> 1e6; h2 <- a10 -> 666666
    val edges = Seq((1L, 10L), (2L, 10L), (1L, 11L))
      .toDF("src", "dst")
    val got = GraphStats.hits(edges, "src", "dst", iterations = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(10L) === ((1000000L, 0L)))
    assert(got(11L) === ((500000L, 0L)))
    assert(got(1L) === ((0L, 1000000L)), "the two-authority hub wins")
    assert(got(2L) === ((0L, 666666L)), "floor division, exact")
  }

  test("hits: a pure-sink graph converges without dividing by zero") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = GraphStats.hits(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(2L) === ((1000000L, 0L)))
    assert(got(1L) === ((0L, 1000000L)))
  }
}
