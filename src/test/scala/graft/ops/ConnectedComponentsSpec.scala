package graft.ops

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  /** Driver-side union-find reference. */
  private def ref(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      // register both endpoints — self-loop-only nodes get a row too
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain collapses to the minimum id despite O(n) diameter") {
    val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = cc(chain)
    assert(got.size == 40)
    assert(got.values.toSet == Set(0L))
  }

  test("two components plus reversed/duplicate edges and self-loops") {
    val got = cc(Seq((5L, 3L), (3L, 5L), (3L, 9L), (9L, 9L),
      (20L, 21L), (21L, 20L)))
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
      20L -> 20L, 21L -> 20L))
    // a node appearing ONLY in self-loop pairs still gets a row
    assert(cc(Seq((7L, 7L))) == Map(7L -> 7L))
  }

  test("random graphs match a union-find reference") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val edges = Seq.fill(70)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      assert(cc(edges) == ref(edges), s"seed=$seed")
    }
  }

  test("string node ids order lexicographically") {
    val got = ConnectedComponents
      .run(Seq(("b", "c"), ("c", "aa")).toDF("x", "y"), "x", "y")
      .as[(String, String)].collect().toMap
    assert(got == Map("b" -> "aa", "c" -> "aa", "aa" -> "aa"))
  }

  test("empty edge list converges to an empty labeling") {
    assert(cc(Nil).isEmpty)
  }

  test("labelAll: unpaired rows become singletons; collision guarded") {
    val docs = Seq(1L, 2L, 3L, 4L).toDF("id")
    val pairs = Seq((4L, 2L)).toDF("i", "j")
    val got = ConnectedComponents.labelAll(docs, "id", pairs, "i", "j")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 2L))
    intercept[IllegalArgumentException] {
      ConnectedComponents.labelAll(
        docs.withColumnRenamed("id", "component"), "component",
        pairs, "i", "j")
    }
  }
}
