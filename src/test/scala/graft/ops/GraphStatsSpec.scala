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
}
