package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  test("counts violations per rule; null predicate = violation") {
    val df = Seq(
      (Some(5), Some("ok")),
      (Some(-1), Some("ok")), // violates positive
      (Some(3), None), // null s -> nonempty check can't pass
      (None, Some("")), // null v -> positive check can't pass; empty s
      (Some(7), Some("x"))
    ).toDF("v", "s")
    val r = Validate.check(df, Seq(
      Validate.Rule("v_positive", col("v") > 0),
      Validate.Rule("s_nonempty", length(col("s")) > 0)))
      .collect().map(x => x.getString(0) -> x).toMap

    val vp = r("v_positive")
    assert(vp.getLong(1) == 2, s"v_positive: $vp") // -1 and null
    assert(vp.getLong(2) == 5)
    assert(vp.getDouble(3) == 0.6)
    val sn = r("s_nonempty")
    assert(sn.getLong(1) == 2, s"s_nonempty: $sn") // null and ""
  }

  test("all rules evaluate in one aggregate over one scan") {
    val df = Seq((1, 2), (3, 4)).toDF("a", "b")
    val plan = Validate.check(df, Seq(
      Validate.Rule("r1", col("a") > 0),
      Validate.Rule("r2", col("b") > 0),
      Validate.Rule("r3", col("a") < col("b"))))
      .queryExecution.executedPlan.toString
    // one scalar aggregate pair (partial+final), no join, no generate
    assert(!plan.contains("Join"), plan)
    val aggs = "HashAggregate".r.findAllIn(plan).size
    assert(aggs <= 2, s"expected one partial+final aggregate pair:\n$plan")
  }

  test("duplicate or unsafe rule names rejected") {
    val df = Seq(1).toDF("a")
    intercept[IllegalArgumentException] {
      Validate.check(df, Seq(
        Validate.Rule("r", col("a") > 0), Validate.Rule("r", col("a") < 9)))
    }
    intercept[IllegalArgumentException] {
      Validate.check(df, Seq(Validate.Rule("bad name'", col("a") > 0)))
    }
  }
}
