package graft.ops

import graft.SparkSpec

/** [[LabelQc]] + [[Preference]] at unit scale (q430–q434 gate the
  * corpus-scale constructions): hand-computed kappa/calibration
  * values and the Bradley–Terry recovery of a planted order. */
class LabelQcSpec extends SparkSpec {
  import spark.implicits._

  test("calibrationBins: top-edge score lands in the last bin; " +
    "gaps are signed") {
    val df = Seq((0.05, 0.0), (0.05, 1.0), (1.0, 1.0), (0.95, 0.0))
      .toDF("s", "y")
    val got = LabelQc.calibrationBins(df, "s", "y", bins = 10)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4)))).toMap
    assert(got(0) === ((2L, 0.05, 0.5, 0.45)), "under-confident bin")
    assert(got(9) === ((2L, 0.975, 0.5, -0.475)),
      "score 1.0 clamps into bin 9; over-confident bin")
  }

  test("calibrationSummary: perfect predictions give zero everywhere") {
    val df = Seq((1.0, 1.0), (0.0, 0.0), (1.0, 1.0)).toDF("s", "y")
    val r = LabelQc.calibrationSummary(df, "s", "y", 10).collect().head
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2),
      r.getLong(3)) === ((0.0, 0.0, 0.0, 3L)))
  }

  test("cohenKappa: textbook two-rater table") {
    // 35 agree of 50; marginals A-yes 30, B-yes 25:
    // pe = (30*25 + 20*25)/2500 = 0.5 -> kappa = (0.7-0.5)/0.5 = 0.4
    val df = (Seq.fill(20)(("yes", "yes")) ++
      Seq.fill(15)(("no", "no")) ++
      Seq.fill(10)(("yes", "no")) ++
      Seq.fill(5)(("no", "yes"))).toDF("a", "b")
    val r = LabelQc.cohenKappa(df, "a", "b").collect().head
    assert(r.getLong(0) === 50L)
    assert(r.getDouble(1) === 0.7)
    // pe = (30*25 + 20*25)/2500 = 0.5 -> kappa = 0.4
    assert(r.getDouble(2) === 0.5)
    assert(r.getDouble(3) === 0.4)
  }

  test("cohenKappa: both raters constant -> kappa null, not 1") {
    val df = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val r = LabelQc.cohenKappa(df, "a", "b").collect().head
    assert(r.getDouble(1) === 1.0 && r.isNullAt(3))
  }

  test("fleissKappa: unanimous panels give kappa 1; variable panel " +
    "sizes reject loudly") {
    val rows = Seq((1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "b"), (2L, "b"), (2L, "b")).toDF("item", "label")
    val r = LabelQc.fleissKappa(rows, "item", "label", 3)
      .collect().head
    assert(r.getDouble(1) === 1.0 && r.getDouble(3) === 1.0)
    val bad = Seq((1L, "a"), (1L, "a")).toDF("item", "label")
    val e = intercept[IllegalArgumentException] {
      LabelQc.fleissKappa(bad, "item", "label", 3)
    }
    assert(e.getMessage.contains("exactly 3"))
  }

  test("bradleyTerry: a dominance chain recovers the planted order " +
    "and self-pairs drop") {
    val pairs = (Seq.fill(9)(("a", "b")) ++ Seq.fill(1)(("b", "a")) ++
      Seq.fill(9)(("b", "c")) ++ Seq.fill(1)(("c", "b")) ++
      Seq.fill(9)(("a", "c")) ++ Seq.fill(1)(("c", "a")) ++
      Seq(("a", "a"))).toDF("w", "l")
    val got = Preference.bradleyTerry(pairs, "w", "l", iterations = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))))
      .toMap
    assert(got("a")._4 === 1 && got("b")._4 === 2 && got("c")._4 === 3)
    assert(got("a")._1 === 18L && got("a")._2 === 20L,
      "the self-pair contributed nothing")
    assert(got("a")._3 > got("b")._3 && got("b")._3 > got("c")._3)
  }
}
