package graft.ops

import graft.SparkSpec

class CompletenessSpec extends SparkSpec {
  import spark.implicits._

  test("joint patterns counted; NaN is missing for doubles") {
    val df = Seq[(Option[Double], Option[String])](
      (Some(1.0), Some("x")), // neither missing
      (Some(1.0), Some("x")),
      (None, Some("y")), // a missing
      (Some(Double.NaN), Some("y")), // a missing (NaN)
      (None, None), // both missing
      (Some(2.0), None) // b missing
    ).toDF("a", "b")
    val r = Completeness.nullPatterns(df, Seq("a", "b"))
      .collect()
      .map(x => (x.getBoolean(0), x.getBoolean(1)) ->
        (x.getLong(2), x.getDouble(3))).toMap
    assert(r((false, false))._1 == 2)
    assert(r((true, false))._1 == 2) // null + NaN
    assert(r((true, true))._1 == 1)
    assert(r((false, true))._1 == 1)
    assert(r.values.map(_._1).sum == 6)
    assert(r((false, false))._2 == 0.33333333) // 2/6 rounded
  }

  test("one scan, map-side combinable groupBy; at most 2^k rows") {
    val df = (1 to 100).map(i =>
      (if (i % 3 == 0) None else Some(i), i)).toDF("a", "b")
    val out = Completeness.nullPatterns(df, Seq("a", "b"))
    assert(out.count() <= 4)
    val plan = out.queryExecution.executedPlan.toString
    // the pct total rides a broadcast 1-row aggregate over the
    // checkpointed <=2^k grid — never a cartesian product, never a
    // partition-less window, and the SOURCE is scanned at most once
    // (the grid checkpoint feeds both join sides)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Window"), plan)
    assert(
      "LocalTableScan".r.findAllMatchIn(plan).size <= 1, plan)
  }
}
