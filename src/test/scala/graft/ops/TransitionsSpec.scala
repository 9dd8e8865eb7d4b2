package graft.ops

import graft.SparkSpec

class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  test("per-key sequences yield exact bigram counts and row-sums of 1") {
    // user 1: a b a b ; user 2: a a c  -> transitions:
    //   u1: a->b, b->a, a->b ; u2: a->a, a->c
    val df = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "a"), (1L, 40L, "b"),
      (2L, 10L, "a"), (2L, 20L, "a"), (2L, 30L, "c")
    ).toDF("k", "ts", "st")
    val m = Transitions.matrix(df, "k", "ts", "st")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(m(("a", "b"))._1 == 2 && m(("b", "a"))._1 == 1)
    assert(m(("a", "a"))._1 == 1 && m(("a", "c"))._1 == 1)
    assert(m.size == 4)
    // from 'a': 4 transitions total -> p(a->b)=0.5, p(a->a)=p(a->c)=0.25
    assert(m(("a", "b"))._2 == 0.5)
    assert(m(("a", "a"))._2 == 0.25 && m(("a", "c"))._2 == 0.25)
    assert(m(("b", "a"))._2 == 1.0)
  }

  test("no cross-key transitions; last event emits none") {
    val df = Seq((1L, 1L, "x"), (2L, 2L, "y")).toDF("k", "ts", "st")
    assert(Transitions.matrix(df, "k", "ts", "st").count() == 0)
  }

  test("timestamp ties broken deterministically by tieBreak column") {
    val df = Seq(
      (1L, 5L, 100L, "a"), (1L, 5L, 200L, "b"), (1L, 5L, 300L, "c")
    ).toDF("k", "ts", "id", "st")
    val seq1 = Transitions.matrix(df, "k", "ts", "st", Seq("id"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(seq1 == Set(("a", "b"), ("b", "c")))
  }

  test("null state is a level both directions; end-of-seq emits none") {
    val df = Seq((1L, 1L, Some("a")), (1L, 2L, None), (1L, 3L, Some("b")))
      .toDF("k", "ts", "st")
    val m = Transitions.matrix(df, "k", "ts", "st").collect()
    assert(m.length == 2, m.mkString(";")) // a->null, null->b
    val fromA = m.find(r => !r.isNullAt(0) && r.getString(0) == "a").get
    assert(fromA.isNullAt(1)) // a -> null counted
    val toB = m.find(r => r.isNullAt(0)).get
    assert(toB.getString(1) == "b") // null -> b counted
  }

  test("plan: no single-partition exchange (both windows are keyed)") {
    val df = Seq((1L, 1L, "x")).toDF("k", "ts", "st")
    val plan = Transitions.matrix(df, "k", "ts", "st")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("skipGram: all gaps from one pass, ends emit nothing") {
    // u1: a b c d -> gap1: ab bc cd; gap2: ac bd; gap3: ad
    val df = Seq(("u1", 1L, "a"), ("u1", 2L, "b"), ("u1", 3L, "c"),
      ("u1", 4L, "d")).toDF("k", "ts", "st")
    val got = Transitions.skipGram(df, "k", "ts", "st", maxGap = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        r.getLong(3)).toMap
    assert(got == Map(
      ("a", "b", 1) -> 1L, ("b", "c", 1) -> 1L, ("c", "d", 1) -> 1L,
      ("a", "c", 2) -> 1L, ("b", "d", 2) -> 1L, ("a", "d", 3) -> 1L))
  }

  test("skipGram: null state is a level, not an end marker") {
    val df = Seq(("u", 1L, Option("a")), ("u", 2L, None: Option[String]),
      ("u", 3L, Option("b"))).toDF("k", "ts", "st")
    val got = Transitions.skipGram(df, "k", "ts", "st", maxGap = 2)
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getInt(2)) -> r.getLong(3)).toMap
    assert(got == Map(
      (Some("a"), None, 1) -> 1L, (None, Some("b"), 1) -> 1L,
      (Some("a"), Some("b"), 2) -> 1L))
  }
}
