package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** [[LabelQc]] + [[Preference]] at unit scale (q430–q436 gate the
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

  test("rankingMetrics: perfect separation gives AUC 1; ties take " +
    "average ranks; degenerate labels go null") {
    val perfect = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0))
      .toDF("s", "y")
    val p = LabelQc.rankingMetrics(perfect, "s", "y").collect().head
    assert((p.getDouble(2), p.getDouble(3), p.getDouble(4)) ===
      ((1.0, 1.0, 1.0)))
    // one positive and one negative share score 0.5 -> that pair
    // contributes 0.5: AUC = (1*1 + 0.5)/2... hand: pos ranks avg
    val tied = Seq((0.9, 1.0), (0.5, 1.0), (0.5, 0.0), (0.1, 0.0))
      .toDF("s", "y")
    val t = LabelQc.rankingMetrics(tied, "s", "y").collect().head
    assert(t.getDouble(2) === 0.875, "tie counts half")
    val allPos = Seq((0.9, 1.0), (0.1, 1.0)).toDF("s", "y")
    val a = LabelQc.rankingMetrics(allPos, "s", "y").collect().head
    assert(a.isNullAt(2) && a.isNullAt(3), "AUC undefined one-class")
  }

  test("prCurve: thresholds descend, tp/fp accumulate, precision " +
    "and recall agree with hand counts") {
    val df = Seq((0.9, 1.0), (0.7, 0.0), (0.5, 1.0)).toDF("s", "y")
    val rows = LabelQc.prCurve(df, "s", "y")
      .orderBy(col("threshold").desc).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows(0) === ((0.9, 1L, 0L, 1.0, 0.5)))
    assert(rows(1) === ((0.7, 1L, 1L, 0.5, 0.5)))
    assert(rows(2) === ((0.5, 2L, 1L, round8(2.0 / 3), 1.0)))
  }

  private def round8(x: Double): Double =
    BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("krippendorffAlpha: hand case with a ragged panel; " +
    "single-rating units drop; unanimity gives null") {
    // unit 1: a,a (agree); unit 2: a,b (disagree); unit 3: single ->
    // dropped. n=4, num = (4-4)/1 + (4-2)/1 = 2; marginals over
    // pairable: a=3, b=1 -> sum_nc2 = 10; den = 16-10 = 6
    // alpha = 1 - 3*2/6 = 0
    val rows = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "a")).toDF("item", "label")
    val r = LabelQc.krippendorffAlpha(rows, "item", "label")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((2L, 1L, 4L)))
    assert(r.getDouble(3) === 0.0)
    // perfect agreement on two categories: alpha 1
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("item", "label")
    val p = LabelQc.krippendorffAlpha(perfect, "item", "label")
      .collect().head
    assert(p.getDouble(3) === 1.0)
    // everything one category: undefined, not perfect
    val uni = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"))
      .toDF("item", "label")
    assert(LabelQc.krippendorffAlpha(uni, "item", "label")
      .collect().head.isNullAt(3))
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
