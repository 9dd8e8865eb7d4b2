package graft.ops

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, String)],
      window: Option[Long] = None) =
    Funnel.funnel(
      rows.toDF("k", "t", "typ"), "k", "t", "typ",
      steps = Seq("A", "B", "C"), window = window)
      .select("k", "t1", "t2", "t3", "level")
      .as[(String, Option[Long], Option[Long], Option[Long], Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("funnel takes first qualifying time per step, in order") {
    val out = run(Seq(
      // u1: B before A must not count; the B after A does
      ("u1", 10L, "B"), ("u1", 20L, "A"), ("u1", 30L, "B"), ("u1", 40L, "C"),
      // u2: completes in strict order, extra repeats ignored
      ("u2", 1L, "A"), ("u2", 2L, "B"), ("u2", 3L, "B"), ("u2", 4L, "C"),
      // u3: never reaches C
      ("u3", 5L, "A"), ("u3", 6L, "B"),
      // u4: only noise
      ("u4", 7L, "X")))
    assert(out("u1") == ((Some(20L), Some(30L), Some(40L), 3L)))
    assert(out("u2") == ((Some(1L), Some(2L), Some(4L), 3L)))
    assert(out("u3") == ((Some(5L), Some(6L), None, 2L)))
    assert(out("u4") == ((None, None, None, 0L)))
  }

  test("equal timestamps: earlier step at same instant counts as preceding") {
    val out = run(Seq(("u", 10L, "A"), ("u", 10L, "B"), ("u", 10L, "C")))
    assert(out("u") == ((Some(10L), Some(10L), Some(10L), 3L)))
  }

  test("C before B blocks even when both after A") {
    val out = run(Seq(("u", 1L, "A"), ("u", 2L, "C"), ("u", 3L, "B")))
    // the only C is before the first qualifying B -> level 2
    assert(out("u") == ((Some(1L), Some(3L), None, 2L)))
  }

  test("window bounds the funnel relative to first step-1 time") {
    val rows = Seq(
      ("u", 0L, "A"), ("u", 5L, "B"), ("u", 20L, "C"),
      // v finishes fast
      ("v", 0L, "A"), ("v", 1L, "B"), ("v", 2L, "C"))
    val bounded = run(rows, window = Some(10L))
    assert(bounded("u") == ((Some(0L), Some(5L), None, 2L))) // C at 20 > 10
    assert(bounded("v") == ((Some(0L), Some(1L), Some(2L), 3L)))
    val unbounded = run(rows)
    assert(unbounded("u") == ((Some(0L), Some(5L), Some(20L), 3L)))
  }

  test("plan: single hash exchange feeds the window chain") {
    val df = Seq(("u", 1L, "A"), ("u", 2L, "B")).toDF("k", "t", "typ")
    val plan = Funnel.funnel(df, "k", "t", "typ", Seq("A", "B"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"funnel must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    // one for the window partitioning; the groupBy reuses it (same key),
    // so at most one more partial-agg exchange is tolerable
    assert(exchanges <= 2, s"too many shuffles ($exchanges):\n$plan")
  }

  test("rejects duplicate steps and reserved columns") {
    val df = Seq(("u", 1L, "A")).toDF("k", "t", "typ")
    intercept[IllegalArgumentException] {
      Funnel.funnel(df, "k", "t", "typ", Seq("A", "A"))
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(df.withColumn("level",
        org.apache.spark.sql.functions.lit(1)), "k", "t", "typ", Seq("A"))
    }
  }
}
