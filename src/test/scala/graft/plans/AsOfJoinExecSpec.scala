package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinExecSpec extends SparkSpec {
  import spark.implicits._

  private def run(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame) =
    AsOfJoinPhysical.asofBackward(left, right,
      "k", "rk", "t", "rt", rightTie = "rid")

  test("backward as-of semantics: inclusive, tie to greatest id, null pad") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "early"),
      (2L, 10L, "c"), (3L, 10L, "lonely")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, 100L, "r10"), (1L, 10L, 101L, "r10b"), // tie at t=10
      (1L, 15L, 102L, "r15"),
      (2L, 1L, 200L, "r1")).toDF("rk", "rt", "rid", "rv")
    val got = run(left, right)
      .select(col("k"), col("t"), col("rid"), col("rv"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        Option(r.getString(3)).orNull)).toSet
    assert(got === Set(
      (1L, 10L, 101L, "r10b"), // inclusive match, tie -> greater rid
      (1L, 20L, 102L, "r15"),
      (1L, 5L, -1L, null), // before every right row
      (2L, 10L, 200L, "r1"),
      (3L, 10L, -1L, null))) // key absent on the right
  }

  test("plan: AsOfJoinExec node, both sides key-partitioned, no BNLJ") {
    val left = spark.range(0, 1000)
      .select((col("id") % 50).as("k"), col("id").as("t"))
    val right = spark.range(0, 200)
      .select((col("id") % 50).as("rk"), (col("id") * 3).as("rt"),
        col("id").as("rid"))
    val df = run(left, right)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // nodeName strips "Exec"
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct") && !plan.contains("Window"), plan)
    assert("hashpartitioning\\(k#".r.findFirstIn(plan).isDefined, plan)
    assert("hashpartitioning\\(rk#".r.findFirstIn(plan).isDefined, plan)
  }

  test("forward via negated times: least rt >= t, least id tie, tolerance nulls") {
    val left = Seq((1L, 10L), (1L, 16L), (2L, 5L)).toDF("k", "t")
    val right = Seq(
      (1L, 12L, 100L, "a"), (1L, 12L, 101L, "b"), // tie -> LEAST id
      (1L, 40L, 102L, "far"),
      (2L, 3L, 200L, "past")).toDF("rk", "rt", "rid", "rv")
    val got = AsOfJoinPhysical.asofForward(left, right,
        "k", "rk", "t", "rt", rightTie = "rid", toleranceUs = Some(10L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(got === Map(
      (1L, 10L) -> 100L, // forward match at 12, tie to least id
      (1L, 16L) -> -1L,  // nearest forward is 40: beyond tolerance 10
      (2L, 5L) -> -1L))  // only a PAST right row: no forward match
  }

  test("agrees with the union+window AsofJoin formulation on a fuzz slice") {
    val n = 2000
    val left = spark.range(0, n).select(
      (col("id") % 37).as("k"),
      pmod(col("id") * 2654435761L, lit(10000L)).as("t"),
      col("id").as("lid"))
    val right = spark.range(0, 500).select(
      (col("id") % 37).as("rk"),
      pmod(col("id") * 40503L, lit(10000L)).as("rt"),
      col("id").as("rid"))
    val viaExec = run(left, right)
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val viaWindow = graft.ops.AsofJoin.asof(
        left, right, "k", "rk", "t", "rt",
        rightCols = Seq("rt", "rid"), rightTieBreak = Some("rid"))
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(viaExec === viaWindow)
  }
}
