package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-sample hypothesis tests — the statistical layer over the drift
  * screens (q83/q84/q87): KS/PSI say "the distributions differ", these
  * say whether the difference clears significance at the observed n.
  *
  * Reference scope: the profiler fork reports descriptive stats only
  * (model/summary.py); these tests are the natural extension a
  * monitoring deployment bolts on top, computed with the same
  * exactness discipline as the rest of the engine:
  *
  *   - Mann-Whitney U rides [[Ranking.avgRanksFromCounts]] — the
  *     range-partitioned prefix-sum ranking, no global window — and
  *     keeps every accumulated quantity EXACT (rank sums carried as
  *     2×-scaled decimal(38,0) integers, tie terms as decimal(38,0)),
  *     so the statistic is reproducible bit-for-bit at any scale.
  *   - Welch's t uses the winsorized-stats trick (Outliers.scala:126):
  *     values quantized to 10^-scale units, Σc and Σc² summed as
  *     decimal(38,0) — float-summation order can never move the
  *     result, the one-ulp hazard that breaks cross-engine equality.
  */
object Hypothesis {

  /** Mann-Whitney U (two-sided, normal approximation, tie-corrected,
    * no continuity correction) comparing `vCol` between rows where
    * `groupA` is true vs false. Null/NaN values and null group flags
    * are dropped.
    *
    * One groupBy(value) shuffle builds the per-value (total, group-A)
    * count table; ranks come from the prefix-sum ranking (no global
    * window); one final single-row agg. The group-A rank sum is
    * accumulated as 2·avgrank·cnt_a in decimal(38,0) — avgranks are
    * half-integers, so the doubled sum is an exact integer no matter
    * the partition order — and the tie term Σ(t³−t) likewise, since
    * t³ overflows LongType already at t ≈ 2.1e6 duplicates.
    *
    * Returns one row: (n1, n2, u1, z) where u1 is group A's U
    * statistic (exact, possibly half-integer) and z its tie-corrected
    * normal score, 6dp-rounded; z is null when either group is empty
    * or the variance degenerates (all values tied). */
  def mannWhitneyU(df: DataFrame, vCol: String, groupA: Column): DataFrame = {
    val v = col(vCol).cast("double")
    val live = df
      .where(v.isNotNull && !v.isNaN && groupA.isNotNull)
      .select(v.as("__v"), groupA.as("__a"))
    val counts = live.groupBy("__v").agg(
      count(lit(1)).as("cnt"),
      count(when(col("__a"), 1)).as("ca"))
    val ranks = Ranking.avgRanksFromCounts(
      counts.select(lit("_").as("__k"), col("__v"), col("cnt")),
      "__k", "__v")
    val joined = counts.join(ranks.select(col("__v"), col("avgrank")), "__v")
    val dec = "decimal(38,0)"
    val agg = joined.agg(
      sum(col("ca")).as("n1"),
      sum(col("cnt")).as("n"),
      // 2·avgrank·ca is an exact integer (avgrank is a half-integer);
      // decimal accumulation keeps it exact past 2^52
      sum((col("avgrank") * 2 * col("ca")).cast(dec)).as("r2"),
      sum(col("cnt").cast(dec) * col("cnt") * col("cnt") - col("cnt"))
        .as("tt"))
    val n1 = col("n1").cast("double")
    val n2 = (col("n") - col("n1")).cast("double")
    val nd = col("n").cast("double")
    val u1 = col("r2").cast("double") / 2.0 - n1 * (n1 + 1.0) / 2.0
    val sig2 = n1 * n2 / 12.0 *
      ((nd + 1.0) - col("tt").cast("double") / (nd * (nd - 1.0)))
    agg.select(
      col("n1"),
      (col("n") - col("n1")).as("n2"),
      u1.as("u1"),
      when(col("n1") > 0 && col("n") > col("n1") && sig2 > 0.0,
        round((u1 - n1 * n2 / 2.0) / sqrt(sig2), 6)).as("z"))
  }

  /** Welch's unequal-variance t-test comparing `vCol` between rows
    * where `groupA` is true vs false, with values quantized to
    * 10^-scale units (scale=2 ⇒ cents — exact for currency columns).
    * Null/NaN values and null group flags are dropped.
    *
    * ONE fused single-row aggregate: per-group n, Σc, Σc² with the
    * quantized units accumulated in decimal(38,0) (exact at any data
    * scale, any partition order). Means/variances/t/df derive from
    * those exact integers in a deterministic double expression — the
    * same arithmetic an oracle engine can reproduce verbatim.
    *
    * Returns one row: (n1, n2, mean1, mean2, t, df) — means
    * 6dp-rounded, t 6dp, Welch–Satterthwaite df 4dp; t/df null when
    * either group has < 2 rows or both variances are zero. */
  def welchT(
      df: DataFrame, vCol: String, groupA: Column,
      scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 9, "scale must be in [0,9]")
    val unit = math.pow(10.0, scale)
    val v = col(vCol).cast("double")
    val live = df
      .where(v.isNotNull && !v.isNaN && groupA.isNotNull)
      .select(v.as("__v"), groupA.as("__a"))
    val c = round(col("__v") * unit, 0).cast("long").cast("decimal(38,0)")
    def side(a: Boolean, e: Column) = when(col("__a") === a, e)
    val agg = live.agg(
      count(side(true, lit(1))).as("n1"),
      count(side(false, lit(1))).as("n2"),
      sum(side(true, c)).as("s1"),
      sum(side(false, c)).as("s2"),
      sum(side(true, c * c)).as("q1"),
      sum(side(false, c * c)).as("q2"))
    def m(s: Column, n: Column) = s.cast("double") / n / unit
    // var_samp from exact sums, in value units
    def va(s: Column, q: Column, n: Column) =
      (q.cast("double") -
        s.cast("double") * s.cast("double") / n) /
        (n - 1.0) / (unit * unit)
    val (n1, n2) = (col("n1").cast("double"), col("n2").cast("double"))
    val (m1, m2) = (m(col("s1"), n1), m(col("s2"), n2))
    val (v1, v2) = (va(col("s1"), col("q1"), n1), va(col("s2"), col("q2"), n2))
    val se2 = v1 / n1 + v2 / n2
    val ok = col("n1") > 1 && col("n2") > 1 && se2 > 0.0
    agg.select(
      col("n1"), col("n2"),
      round(m1, 6).as("mean1"), round(m2, 6).as("mean2"),
      when(ok, round((m1 - m2) / sqrt(se2), 6)).as("t"),
      when(ok, round(
        se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1.0) +
          (v2 / n2) * (v2 / n2) / (n2 - 1.0)), 4)).as("df"))
  }
}
