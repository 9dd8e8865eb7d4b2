package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinBinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, -25L), (2L, -3L), (3L, 0L), (4L, 7L), (5L, 19L), (6L, 42L),
    (7L, 100L)).toDF("pid", "t")
  // includes a degenerate lo > hi interval (matches nothing) and
  // negative bounds (exercises floor-division binning)
  private def intervals = Seq(
    (10L, -30L, -20L), (11L, -5L, 5L), (12L, 5L, 20L), (13L, 30L, 10L),
    (14L, 95L, 120L)).toDF("iid", "lo", "hi")

  private def naive = points.join(intervals,
    col("t") >= col("lo") && col("t") <= col("hi"))

  private val expected = Set(
    (1L, 10L), (2L, 11L), (3L, 11L), (4L, 12L), (5L, 12L), (7L, 14L))

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("pid", "iid").as[(Long, Long)].collect().toSet

  test("rewrites the naive range join: same rows, no nested-loop join") {
    RangeJoinBinRule.register(spark)
    spark.conf.set(RangeJoinBinRule.BinSizeKey, "10")
    try {
      val df = naive
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin") &&
        !phys.contains("CartesianProduct"), phys)
      assert(phys.contains("Generate"), phys) // the bin explode
      assert(pairs(df) === expected)
    } finally spark.conf.unset(RangeJoinBinRule.BinSizeKey)
  }

  test("without a bin size the rule stands down (nested loop remains)") {
    RangeJoinBinRule.register(spark)
    val phys = naive.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastNestedLoopJoin") ||
      phys.contains("CartesianProduct"), phys)
    assert(pairs(naive) === expected)
  }

  test("stands down when a cross-side equality key exists") {
    RangeJoinBinRule.register(spark)
    spark.conf.set(RangeJoinBinRule.BinSizeKey, "10")
    try {
      val p2 = points.withColumn("k", col("pid") % 2)
      val i2 = intervals.withColumn("k2", col("iid") % 2)
      val df = p2.join(i2, col("k") === col("k2") &&
        col("t") >= col("lo") && col("t") <= col("hi"))
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("Generate"), phys)
      val want = expected.filter { case (p, i) => p % 2 == i % 2 }
      assert(pairs(df) === want)
    } finally spark.conf.unset(RangeJoinBinRule.BinSizeKey)
  }

  test("extra one-sided predicates survive the rewrite") {
    RangeJoinBinRule.register(spark)
    spark.conf.set(RangeJoinBinRule.BinSizeKey, "7")
    try {
      val df = points.join(intervals,
          col("t") >= col("lo") && col("t") <= col("hi"))
        .where(col("pid") =!= 4L)
      assert(pairs(df) === expected.filterNot(_._1 == 4L))
    } finally spark.conf.unset(RangeJoinBinRule.BinSizeKey)
  }
}
