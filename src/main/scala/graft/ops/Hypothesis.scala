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
  /** Shared two-sample rank machinery: one row with (n1, n, r2, tt)
    * where r2 is TWICE group A's rank sum (exact integer in
    * decimal(38,0)) and tt the tie term Σ(t³−t). */
  private def rankSumAgg(
      df: DataFrame, vCol: String, groupA: Column): DataFrame = {
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
    joined.agg(
      sum(col("ca")).as("n1"),
      sum(col("cnt")).as("n"),
      // 2·avgrank·ca is an exact integer (avgrank is a half-integer);
      // decimal accumulation keeps it exact past 2^52
      sum((col("avgrank") * 2 * col("ca")).cast(dec)).as("r2"),
      sum(col("cnt").cast(dec) * col("cnt") * col("cnt") - col("cnt"))
        .as("tt"))
  }

  def mannWhitneyU(df: DataFrame, vCol: String, groupA: Column): DataFrame = {
    val agg = rankSumAgg(df, vCol, groupA)
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

  /** Area under the ROC curve, exactly, via the rank-sum identity
    * AUC = U₁/(n₁·n₂) — ties contribute ½ through the averaged ranks,
    * no threshold sweep, no curve discretization. Same single
    * groupBy(score) + prefix-sum ranking as [[mannWhitneyU]]; the
    * numerator is exact to any scale. Returns one row:
    * (n_pos, n_neg, auc 6dp); auc null when either class is empty. */
  def auc(df: DataFrame, scoreCol: String, positive: Column): DataFrame = {
    val agg = rankSumAgg(df, scoreCol, positive)
    val n1 = col("n1").cast("double")
    val n2 = (col("n") - col("n1")).cast("double")
    val u1 = col("r2").cast("double") / 2.0 - n1 * (n1 + 1.0) / 2.0
    agg.select(
      col("n1").as("n_pos"),
      (col("n") - col("n1")).as("n_neg"),
      when(col("n1") > 0 && col("n") > col("n1"),
        round(u1 / (n1 * n2), 6)).as("auc"))
  }

  /** Kruskal-Wallis H (k-sample rank test, tie-corrected): do any of
    * the `groupCol` populations stochastically dominate? H =
    * 12/(n(n+1)) · Σ R_g²/n_g − 3(n+1), divided by the tie factor
    * 1 − Σ(t³−t)/(n³−n). Per-(value, group) counts join the global
    * prefix-sum ranks, so each group's rank sum R_g accumulates as an
    * exact doubled integer in decimal(38,0) — the k-sample
    * generalization of [[mannWhitneyU]]'s discipline. Null group rows
    * are dropped. Returns one row: (n_groups, n, h 6dp); h null when
    * everything is tied (tie factor 0) or fewer than 2 groups. */
  def kruskalWallis(
      df: DataFrame, vCol: String, groupCol: String): DataFrame = {
    val v = col(vCol).cast("double")
    val live = df
      .where(v.isNotNull && !v.isNaN && col(groupCol).isNotNull)
      .select(v.as("__v"), col(groupCol).as("__g"))
    val counts = live.groupBy("__v", "__g").agg(count(lit(1)).as("cg"))
    val vCounts = counts.groupBy("__v").agg(sum(col("cg")).as("cnt"))
    val ranks = Ranking.avgRanksFromCounts(
      vCounts.select(lit("_").as("__k"), col("__v"), col("cnt")),
      "__k", "__v")
    val dec = "decimal(38,0)"
    val perGroup = counts
      .join(ranks.select(col("__v"), col("avgrank")), "__v")
      .groupBy("__g")
      .agg(sum(col("cg")).as("ng"),
        sum((col("avgrank") * 2 * col("cg")).cast(dec)).as("rg2"))
    val ties = vCounts.agg(
      sum(col("cnt").cast(dec) * col("cnt") * col("cnt") - col("cnt"))
        .as("tt"))
    val agg = perGroup
      .select(col("ng"), col("rg2"))
      .agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        // R_g²/n_g: R_g exact from the doubled decimal, per-group
        // division deterministic; the k-term sum rounds at 6dp
        sum((col("rg2").cast("double") / 2.0) *
          (col("rg2").cast("double") / 2.0) / col("ng")).as("s"))
      .crossJoin(ties)
    val nd = col("n").cast("double")
    val h = lit(12.0) / (nd * (nd + 1.0)) * col("s") -
      lit(3.0) * (nd + 1.0)
    val tieFactor =
      lit(1.0) - col("tt").cast("double") / (nd * nd * nd - nd)
    agg.select(col("k").as("n_groups"), col("n"),
      when(col("k") > 1 && tieFactor > 0.0,
        round(h / tieFactor, 6)).as("h"))
  }

  /** One-way ANOVA F on 10^-scale-quantized values: between-group over
    * within-group variance across ALL `groupCol` levels, from per-group
    * exact decimal(38,0) Σc and Σc² — the k-sample [[welchT]] (equal
    * variances assumed; for k = 2 prefer Welch). Also reports η²
    * (SSB/SST), the effect size. Returns one row: (n_groups, n, f 6dp,
    * eta2 6dp); f null when n ≤ k, k < 2, or SSW degenerates to 0. */
  def anovaF(
      df: DataFrame, vCol: String, groupCol: String,
      scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 9, "scale must be in [0,9]")
    val unit = math.pow(10.0, scale)
    val v = col(vCol).cast("double")
    val live = df
      .where(v.isNotNull && !v.isNaN && col(groupCol).isNotNull)
      .select(v.as("__v"), col(groupCol).as("__g"))
    val c = round(col("__v") * unit, 0).cast("long").cast("decimal(38,0)")
    val perGroup = live.groupBy("__g").agg(
      count(lit(1)).as("ng"), sum(c).as("sg"), sum(c * c).as("qg"))
    // group terms are exact rationals evaluated deterministically;
    // the k-term cross-group sums round at 6dp
    val agg = perGroup.agg(
      count(lit(1)).as("k"), sum(col("ng")).as("n"),
      sum(col("sg")).as("st"), sum(col("qg")).as("qt"),
      sum(col("sg").cast("double") * col("sg").cast("double") /
        col("ng")).as("sb"))
    val nd = col("n").cast("double")
    val kd = col("k").cast("double")
    val ssb = (col("sb") -
      col("st").cast("double") * col("st").cast("double") / nd) /
      (unit * unit)
    val sst = (col("qt").cast("double") -
      col("st").cast("double") * col("st").cast("double") / nd) /
      (unit * unit)
    val ssw = sst - ssb
    val ok = col("k") > 1 && col("n") > col("k") && ssw > 0.0
    agg.select(col("k").as("n_groups"), col("n"),
      when(ok, round((ssb / (kd - 1.0)) / (ssw / (nd - kd)), 6)).as("f"),
      when(ok && sst > 0.0, round(ssb / sst, 6)).as("eta2"))
  }

  /** Two-proportion z-test (pooled): success rate between group A and
    * group B rows. Pure counts — one fused single-row aggregate, no
    * float accumulation anywhere — then the pooled-variance z in one
    * deterministic double expression. Rows with a null group flag or
    * null outcome are dropped. Returns one row: (n1, n2, p1, p2, z) —
    * rates 6dp, z 6dp, null when a group is empty or the pooled rate
    * degenerates (0 or 1). */
  def propZTest(
      df: DataFrame, outcome: Column, groupA: Column): DataFrame = {
    val live = df
      .where(outcome.isNotNull && groupA.isNotNull)
      .select(outcome.as("__y"), groupA.as("__a"))
    val agg = live.agg(
      count(when(col("__a"), 1)).as("n1"),
      count(when(!col("__a"), 1)).as("n2"),
      count(when(col("__a") && col("__y"), 1)).as("s1"),
      count(when(!col("__a") && col("__y"), 1)).as("s2"))
    val (n1, n2) = (col("n1").cast("double"), col("n2").cast("double"))
    val (s1, s2) = (col("s1").cast("double"), col("s2").cast("double"))
    val p1 = s1 / n1
    val p2 = s2 / n2
    val p = (s1 + s2) / (n1 + n2)
    val se2 = p * (lit(1.0) - p) * (lit(1.0) / n1 + lit(1.0) / n2)
    val ok = col("n1") > 0 && col("n2") > 0 && se2 > 0.0
    agg.select(col("n1"), col("n2"),
      when(col("n1") > 0, round(p1, 6)).as("p1"),
      when(col("n2") > 0, round(p2, 6)).as("p2"),
      when(ok, round((p1 - p2) / sqrt(se2), 6)).as("z"))
  }

  /** Simple OLS regression y ~ x with BOTH variables quantized to
    * integer units (10^-scale) and every moment accumulated in
    * decimal(38,0) — the normal equations then evaluate from exact
    * integers, so slope/intercept/R² are bit-reproducible at any data
    * scale and partition order (stronger than float-sum OLS, which
    * drifts with aggregation order). One fused single-row aggregate.
    * Returns (n, slope, intercept, r2), 6dp; null when x is constant.
    * Slope/intercept are in ORIGINAL units (the quantization scales
    * cancel through the ratio). */
  def olsFit(
      df: DataFrame, xCol: String, yCol: String,
      xScale: Int = 2, yScale: Int = 2): DataFrame = {
    require(xScale >= 0 && xScale <= 9 && yScale >= 0 && yScale <= 9,
      "scales must be in [0,9]")
    val (ux, uy) = (math.pow(10.0, xScale), math.pow(10.0, yScale))
    val xv = col(xCol).cast("double")
    val yv = col(yCol).cast("double")
    val live = df
      .where(xv.isNotNull && !xv.isNaN && yv.isNotNull && !yv.isNaN)
      .select(round(xv * ux, 0).cast("long").cast("decimal(38,0)").as("x"),
        round(yv * uy, 0).cast("long").cast("decimal(38,0)").as("y"))
    val agg = live.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val nd = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = nd * d("sxy") - d("sx") * d("sy")
    val vx = nd * d("sxx") - d("sx") * d("sx")
    val vy = nd * d("syy") - d("sy") * d("sy")
    // quantized-unit slope is num/vx; original units multiply by ux/uy
    val slope = num / vx * lit(ux / uy)
    val intercept = (d("sy") / uy - slope * (d("sx") / ux)) / nd
    agg.select(col("n"),
      when(vx > 0, round(slope, 6)).as("slope"),
      when(vx > 0, round(intercept, 6)).as("intercept"),
      when(vx > 0 && vy > 0, round(num * num / (vx * vy), 6)).as("r2"))
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

  /** CUPED variance-reduced A/B comparison (Deng et al., WSDM 2013):
    * adjust each unit's experiment-period metric by its pre-period
    * metric, Y' = Y − θ·(X − X̄), θ = cov(X,Y)/var(X), then compare
    * group means of Y'. The pre-period covariate absorbs persistent
    * per-unit variance, shrinking the interval a drift/AB monitor
    * needs — the standard trick for metric sensitivity at scale.
    *
    * `units` must carry one row per experiment unit with `preCol` /
    * `postCol` metric columns (build it with a groupBy upstream;
    * missing pre-period activity should arrive as 0, not null).
    *
    * Exactness: both metrics are quantized to 10^-scale units and
    * accumulated as decimal(38,0) (n, Σx, Σy, Σxy, Σx², per-group Σx,
    * Σy, n) in ONE fused single-row aggregate; θ and every mean derive
    * from those exact integers in deterministic double arithmetic.
    * θ is pooled across groups (the standard formulation: under
    * randomization X ⊥ assignment, so pooling is unbiased).
    *
    * Returns one row: (n1, n2, theta, diff_raw, diff_cuped,
    * var_reduction) — 6dp; var_reduction = corr(X,Y)² = the fraction
    * of metric variance the covariate removed; null stats when either
    * group is empty or var(X) = 0. */
  def cuped(units: DataFrame, preCol: String, postCol: String,
      groupA: Column, scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 9, "scale must be in [0,9]")
    val unit = math.pow(10.0, scale)
    val xv = col(preCol).cast("double")
    val yv = col(postCol).cast("double")
    val live = units
      .where(xv.isNotNull && !xv.isNaN && yv.isNotNull && !yv.isNaN &&
        groupA.isNotNull)
      .select(
        round(xv * unit, 0).cast("long").cast("decimal(38,0)").as("x"),
        round(yv * unit, 0).cast("long").cast("decimal(38,0)").as("y"),
        groupA.as("__a"))
    def side(a: Boolean, e: Column) = when(col("__a") === a, e)
    val agg = live.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      count(side(true, lit(1))).as("n1"),
      count(side(false, lit(1))).as("n2"),
      sum(side(true, col("x"))).as("sx1"),
      sum(side(false, col("x"))).as("sx2"),
      sum(side(true, col("y"))).as("sy1"),
      sum(side(false, col("y"))).as("sy2"))
    def d(c: String) = col(c).cast("double")
    val nd = col("n").cast("double")
    val cxy = nd * d("sxy") - d("sx") * d("sy")
    val vx = nd * d("sxx") - d("sx") * d("sx")
    val vy = nd * d("syy") - d("sy") * d("sy")
    val theta = cxy / vx // quantization units cancel (same scale)
    val (n1, n2) = (col("n1").cast("double"), col("n2").cast("double"))
    val diffRaw = (d("sy1") / n1 - d("sy2") / n2) / unit
    // Y' group-mean difference: the −θX̄ re-centering term cancels
    val diffAdj = diffRaw - theta * ((d("sx1") / n1 - d("sx2") / n2) / unit)
    val ok = col("n1") > 0 && col("n2") > 0 && vx > 0.0
    agg.select(
      col("n1"), col("n2"),
      when(ok, round(theta, 6)).as("theta"),
      when(ok, round(diffRaw, 6)).as("diff_raw"),
      when(ok, round(diffAdj, 6)).as("diff_cuped"),
      when(ok && vy > 0.0, round(cxy * cxy / (vx * vy), 6))
        .as("var_reduction"))
  }

  /** Per-group OLS trend: [[olsFit]]'s exact-integer-sum normal
    * equations, one row PER GROUP — "is this segment's metric drifting
    * over time, and how fast?" across every segment in one pass.
    * One groupBy shuffle on the group key; the decimal(38,0) sums keep
    * each group's fit bit-reproducible at any scale/partition order.
    * Returns (group, n, slope, intercept, r2), 6dp; slope/intercept in
    * original units per unit of x; null when x is constant in-group. */
  def olsTrendBy(df: DataFrame, groupCol: String, xCol: String,
      yCol: String, xScale: Int = 2, yScale: Int = 2): DataFrame = {
    require(xScale >= 0 && xScale <= 9 && yScale >= 0 && yScale <= 9,
      "scales must be in [0,9]")
    val (ux, uy) = (math.pow(10.0, xScale), math.pow(10.0, yScale))
    val xv = col(xCol).cast("double")
    val yv = col(yCol).cast("double")
    val live = df
      .where(xv.isNotNull && !xv.isNaN && yv.isNotNull && !yv.isNaN)
      .select(col(groupCol),
        round(xv * ux, 0).cast("long").cast("decimal(38,0)").as("x"),
        round(yv * uy, 0).cast("long").cast("decimal(38,0)").as("y"))
    val agg = live.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val nd = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = nd * d("sxy") - d("sx") * d("sy")
    val vx = nd * d("sxx") - d("sx") * d("sx")
    val vy = nd * d("syy") - d("sy") * d("sy")
    val slope = num / vx * lit(ux / uy)
    val intercept = (d("sy") / uy - slope * (d("sx") / ux)) / nd
    agg.select(col(groupCol), col("n"),
      when(vx > 0, round(slope, 6)).as("slope"),
      when(vx > 0, round(intercept, 6)).as("intercept"),
      when(vx > 0 && vy > 0, round(num * num / (vx * vy), 6)).as("r2"))
  }

  /** Two-sample effect sizes — the "is it big?" companion to
    * [[mannWhitneyU]]/[[welchT]]'s "is it real?": Cliff's delta
    * (2·U₁/(n₁n₂) − 1, the rank-dominance effect, exact through the
    * doubled-rank-sum integers) and Cohen's d (standardized mean
    * difference on the pooled SD, from 10^-scale-quantized
    * decimal(38,0) moment sums — [[welchT]]'s exactness recipe).
    *
    * ONE pass: the per-value counts table feeds both the prefix-sum
    * ranking and the quantized moments, so the rank statistic and the
    * moment statistic come from the same single value-grid shuffle.
    * Returns one row: (n1, n2, cliffs_delta, cohens_d) — 6dp; delta
    * null when either group is empty, d additionally null when n ≤ 2
    * or the pooled variance is 0. */
  def effectSizes(df: DataFrame, vCol: String, groupA: Column,
      scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 9, "scale must be in [0,9]")
    val unit = math.pow(10.0, scale)
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
    val q = round(col("__v") * unit, 0).cast("long").cast(dec)
    val agg = joined.agg(
      sum(col("ca")).as("n1"),
      sum(col("cnt")).as("n"),
      sum((col("avgrank") * 2 * col("ca")).cast(dec)).as("r2"),
      sum(q * col("ca")).as("sxa"),
      sum(q * q * col("ca")).as("qqa"),
      sum(q * col("cnt")).as("sx"),
      sum(q * q * col("cnt")).as("qq"))
    def d(c: String) = col(c).cast("double")
    val n1 = d("n1")
    val n2 = (col("n") - col("n1")).cast("double")
    val u1 = d("r2") / 2.0 - n1 * (n1 + 1.0) / 2.0
    val sxb = d("sx") - d("sxa")
    val qqb = d("qq") - d("qqa")
    // pooled SS = Σ(x−m₁)² over A + Σ(x−m₂)² over B, in quantized units
    val ss = (d("qqa") - d("sxa") * d("sxa") / n1) +
      (qqb - sxb * sxb / n2)
    val sp = sqrt(ss / (d("n") - 2.0))
    val meanDiff = d("sxa") / n1 - sxb / n2 // unit cancels against sp
    val both = col("n1") > 0 && col("n") > col("n1")
    agg.select(
      col("n1"), (col("n") - col("n1")).as("n2"),
      when(both, round(lit(2.0) * u1 / (n1 * n2) - 1.0, 6))
        .as("cliffs_delta"),
      when(both && d("n") > 2.0 && ss > 0.0,
        round(meanDiff / sp, 6)).as("cohens_d"))
  }

  /** Two-feature ridge regression by the closed form
    * (X'X + λ·diag(0,1,1))·β = X'y, solved with Cramer's rule on the
    * 3×3 system — multiple regression's step past [[olsFit]], still
    * ONE fused single-row aggregate.
    *
    * All nine Gram/moment sums accumulate as decimal(38,0) quantized
    * integers (exact at any scale, any partition order); the Cramer
    * determinants are then fixed double expressions over those exact
    * sums, written with one agreed parenthesization so an oracle
    * engine reproduces them bit-for-bit. λ (raw units) regularizes the
    * two slope diagonal entries, never the intercept. Returns one row
    * (n, intercept, b1, b2), 6dp, null when the system is singular. */
  def ridgeFit2(
      df: DataFrame, x1Col: String, x2Col: String, yCol: String,
      lambda: Double = 1.0, x1Scale: Int = 2, x2Scale: Int = 2,
      yScale: Int = 2): DataFrame = {
    require(Seq(x1Scale, x2Scale, yScale).forall(s => s >= 0 && s <= 9),
      "scales must be in [0,9]")
    val (u1, u2, uy) = (math.pow(10.0, x1Scale), math.pow(10.0, x2Scale),
      math.pow(10.0, yScale))
    val x1v = col(x1Col).cast("double"); val x2v = col(x2Col).cast("double")
    val yv = col(yCol).cast("double")
    val live = df
      .where(x1v.isNotNull && !x1v.isNaN && x2v.isNotNull && !x2v.isNaN &&
        yv.isNotNull && !yv.isNaN)
      .select(
        round(x1v * u1, 0).cast("long").cast("decimal(38,0)").as("x1"),
        round(x2v * u2, 0).cast("long").cast("decimal(38,0)").as("x2"),
        round(yv * uy, 0).cast("long").cast("decimal(38,0)").as("y"))
    val agg = live.agg(count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"))
    // raw-unit doubles from the exact sums — identical divisions in the
    // oracle, so every later float op sees the same operands
    def d(c: String) = col(c).cast("double")
    val nD = d("n")
    val t1 = d("s1") / u1; val t2 = d("s2") / u2; val ty = d("sy") / uy
    val t11 = d("s11") / (u1 * u1); val t12 = d("s12") / (u1 * u2)
    val t22 = d("s22") / (u2 * u2)
    val t1y = d("s1y") / (u1 * uy); val t2y = d("s2y") / (u2 * uy)
    val a11 = t11 + lambda; val a22 = t22 + lambda
    val m00 = a11 * a22 - t12 * t12
    val m01 = t1 * a22 - t12 * t2
    val m02 = t1 * t12 - a11 * t2
    val det = nD * m00 - t1 * m01 + t2 * m02
    val det0 = ty * m00 - t1 * (t1y * a22 - t12 * t2y) +
      t2 * (t1y * t12 - a11 * t2y)
    val det1 = nD * (t1y * a22 - t12 * t2y) - ty * m01 +
      t2 * (t1 * t2y - t1y * t2)
    val det2 = nD * (a11 * t2y - t1y * t12) - t1 * (t1 * t2y - t1y * t2) +
      ty * m02
    val ok = abs(det) > 0.0
    agg.select(col("n"),
      when(ok, round(det0 / det, 6)).as("intercept"),
      when(ok, round(det1 / det, 6)).as("b1"),
      when(ok, round(det2 / det, 6)).as("b2"))
  }

  /** Distributed logistic-regression training on the exact gate:
    * `steps` full-batch gradient-descent steps for
    * P(y=1) = σ(b0 + b1·x1 + b2·x2), returning the final coefficients
    * and training log-loss. Iterative ML training is the op class
    * people assume can't be value-checked across engines because of
    * float-sum order and libm drift; the discipline that makes it
    * checkable is the repo's quantized-sum pattern applied per STEP:
    * every per-row gradient contribution is floor(t·10⁹ + 0.5)-
    * quantized before the sum (order-invariant), and the updated β is
    * re-quantized to 10⁻⁹ before the next step — so a last-ulp
    * disagreement in `exp` (measured ~0.3 % of calls vs another
    * libm) must land within one ulp of a quantization boundary AND
    * survive the β re-quantization to propagate; compounded odds are
    * negligible, and the oracle unrolls the identical iterations.
    *
    * Distributed shape: one localCheckpointed (x1, x2, y) projection;
    * each step is ONE fused map-side-combined aggregate (4 sums), one
    * driver row per step — the textbook full-batch GD loop on a
    * cluster. Returns one row (n, b0, b1, b2, log_loss). */
  def logisticGd2(df: DataFrame, x1: Column, x2: Column, y: Column,
      lr: Double, steps: Int): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    val spark = df.sparkSession
    val d = df
      .select(x1.cast("double").as("x1"), x2.cast("double").as("x2"),
        y.cast("double").as("y"))
      .where(col("x1").isNotNull && col("x2").isNotNull &&
        col("y").isNotNull)
      .localCheckpoint(false)
    var b = Array(0.0, 0.0, 0.0)
    var nn = 0L
    def q9(t: Column): Column =
      floor(t * lit(1e9) + lit(0.5)).cast("long")
    for (_ <- 1 to steps) {
      val z = lit(b(0)) + lit(b(1)) * col("x1") + lit(b(2)) * col("x2")
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val r = col("y") - p
      val row = d.agg(
        count(lit(1)).as("n"),
        sum(q9(r)).as("g0"),
        sum(q9(r * col("x1"))).as("g1"),
        sum(q9(r * col("x2"))).as("g2")).head()
      nn = row.getLong(0)
      // identical double ops to the oracle: v = b + lr*(g/1e9)/n, then
      // floor-quantize to 1e-9 (exact on both engines; round() decimal
      // semantics differ driver-side vs SQL-side)
      def upd(bi: Double, g: Long): Double = {
        val v = bi + lr * (g.toDouble / 1e9) / nn
        math.floor(v * 1e9 + 0.5) / 1e9
      }
      b = Array(upd(b(0), row.getLong(1)), upd(b(1), row.getLong(2)),
        upd(b(2), row.getLong(3)))
    }
    val zF = lit(b(0)) + lit(b(1)) * col("x1") + lit(b(2)) * col("x2")
    val pF = lit(1.0) / (lit(1.0) + exp(-zF))
    val lossTerm = -(col("y") * log(pF) +
      (lit(1.0) - col("y")) * log(lit(1.0) - pF))
    val ls = d.agg(sum(q9(lossTerm))).head().getLong(0)
    val loss = math.floor(ls.toDouble / 1e9 / nn * 1e6 + 0.5) / 1e6
    import spark.implicits._
    Seq((nn, b(0), b(1), b(2), loss))
      .toDF("n", "b0", "b1", "b2", "log_loss")
  }

  /** Levene's test, Brown-Forsythe variant (Brown & Forsythe 1974):
    * variance-homogeneity across groups via a one-way ANOVA on the
    * absolute deviations from each group's MEDIAN — the robust
    * pre-check before trusting [[anovaF]]/[[welchT]] pooled-variance
    * assumptions. One exact per-group percentile pass (broadcast
    * medians), one map-only |v − med| projection, then the existing
    * decimal-quantized [[anovaF]] machinery. Returns
    * (n_groups, n, f, eta2). */
  def leveneBrownForsythe(df: DataFrame, vCol: String,
      groupCol: String, scale: Int = 2): DataFrame = {
    val v = col(vCol).cast("double")
    val in = df.where(v.isNotNull && !isnan(v) &&
        col(groupCol).isNotNull)
      .select(v.as("__v"), col(groupCol).as("__g"))
    val meds = in.groupBy("__g")
      .agg(expr("percentile(__v, 0.5)").as("__med"))
    in.join(broadcast(meds), "__g")
      .select(abs(col("__v") - col("__med")).as("__z"), col("__g"))
      .transform(anovaF(_, "__z", "__g", scale))
  }

  /** Benford first-significant-digit screen (Benford 1938; the fraud /
    * fabricated-data tripwire auditors run on financial columns): the
    * observed first-digit distribution of a positive amount column
    * against Benford's log10(1 + 1/d) expectation, with the per-digit
    * χ² contribution. First digits are extracted EXACTLY: the amount
    * is cent-quantized to a BIGINT (floor(x·100 + 0.5) — half-up, the
    * engines agree) and the leading digit read off its decimal string
    * — never via log10/pow, whose libm boundary behavior at exact
    * powers of ten differs across engines. Expected shares are
    * driver-side constants, identical literals in the oracle. One
    * 9-group aggregate + a broadcast total. Returns one row per
    * observed digit: (digit, n, share, benford, chi2_term), 6 dp. */
  def benfordFirstDigit(df: DataFrame, vCol: String): DataFrame = {
    val x = col(vCol).cast("double")
    val cents = floor(x * 100 + lit(0.5)).cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    val counts = df.where(x.isNotNull && x > 0.0)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    val benford = (1 to 9).map(d =>
      (d, math.log10(1.0 + 1.0 / d))).toMap
    val bCol = (1 to 9).foldLeft(lit(0.0)) { (acc, d) =>
      when(col("digit") === d, lit(benford(d))).otherwise(acc)
    }
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("total"), 6).as("share"),
        round(bCol, 6).as("benford"),
        round(((col("n").cast("double") - col("total") * bCol) *
          (col("n").cast("double") - col("total") * bCol))
          / (col("total") * bCol), 6).as("chi2_term"))
      .orderBy("digit")
  }

  /** Poisson(1) CDF thresholds c_0..c_7 (e^{-1}·Σ 1/i!): a uniform u
    * maps to the weight w = #{k : u >= c_k} ∈ 0..8 — the inverse-CDF
    * draw written as a branchless sum of comparisons, identical
    * arithmetic in any engine. Exposed for the oracle builder so the
    * SQL interpolates the SAME Double literals this operator compares
    * against (Double.toString round-trips, so both engines parse back
    * the identical bit pattern). */
  val poissonCdf1: IndexedSeq[Double] = {
    val invE = math.exp(-1.0)
    (0 to 7).scanLeft(0.0) { (acc, k) =>
      acc + invE / (1 to k).product
    }.tail.toIndexedSeq
  }

  /** Leave-one-group-out (jackknife) influence of each group on the
    * corpus mean of an INTEGER metric — the "which source moves the
    * number" attribution run before re-weighting a mix (Quenouille/
    * Tukey delete-group jackknife): for each group g,
    * loo_mean(g) = (S − S_g)/(N − n_g) and influence(g) =
    * loo_mean(g) − mean. Groups covering the whole corpus (N = n_g)
    * emit NULL loo/influence.
    *
    * Exactness: one map-side-combined aggregation produces exact
    * BIGINT (S_g, n_g); the global (S, N) is their bounded rollup
    * broadcast back; every emitted stat is a single double division or
    * difference — engine-identical at any scale. Returns per group:
    * (group, n, group_mean, loo_mean, influence), 6 dp. */
  def jackknifeGroupInfluence(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val x = col(valueCol).cast("long")
    val per = df.where(x.isNotNull)
      .groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"), sum(x).as("s"))
    val tot = per.agg(sum(col("n")).as("nn"), sum(col("s")).as("ss"))
    per.crossJoin(broadcast(tot))
      .select(col("g").as(groupCol), col("n"),
        round(col("s").cast("double") / col("n"), 6).as("group_mean"),
        when(col("nn") > col("n"),
          round((col("ss") - col("s")).cast("double")
            / (col("nn") - col("n")), 6)).as("loo_mean"),
        when(col("nn") > col("n"),
          round((col("ss") - col("s")).cast("double")
            / (col("nn") - col("n"))
            - col("ss").cast("double") / col("nn"), 6)).as("influence"))
  }

  /** Cohen's κ inter-rater agreement between two categorical raters
    * (Cohen 1960) — the standard "do my two quality classifiers agree
    * beyond chance" check run before trusting ensemble labels on a
    * training corpus. po = observed agreement, pe = chance agreement
    * from the marginal label distributions, κ = (po − pe)/(1 − pe)
    * (NULL when pe = 1: a single shared category has no chance-
    * corrected signal).
    *
    * Exactness: everything flows from integer cell counts of ONE
    * contingency aggregation; the pe cross-product accumulates in
    * decimal(38,0) (n_a·n_b overflows BIGINT once marginals pass
    * ~3·10^9 rows — the Mann-Whitney discipline), and po/pe/κ are each
    * a single double division — engine-identical at any scale. Rows
    * where either rater is NULL are excluded (both-rated universe).
    *
    * Scale design (100 TB): one shuffle to the (a, b) cell table,
    * whose size is bounded by the label-vocabulary square, then
    * label-count joins on that bounded table. Returns one row
    * (n, n_agree, po, pe, kappa), 6 dp. */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val cells = df
      .select(raterA.cast("string").as("a"), raterB.cast("string").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    val tot = cells.agg(sum(col("c")).as("n"),
      coalesce(sum(when(col("a") === col("b"), col("c"))), lit(0L))
        .as("n_agree"))
    val ma = cells.groupBy("a").agg(sum(col("c")).as("ca"))
    val mb = cells.groupBy("b").agg(sum(col("c")).as("cb"))
    val pesum = ma.join(mb, col("a") === col("b"))
      .agg(coalesce(sum(col("ca").cast("decimal(38,0)") * col("cb")),
        lit(0L).cast("decimal(38,0)")).as("pesum"))
    tot.crossJoin(pesum)
      .select(col("n"), col("n_agree"),
        (col("n_agree").cast("double") / col("n")).as("rpo"),
        (col("pesum").cast("double")
          / (col("n").cast("double") * col("n"))).as("rpe"))
      .select(col("n"), col("n_agree"),
        round(col("rpo"), 6).as("po"), round(col("rpe"), 6).as("pe"),
        when(col("rpe") < 1.0,
          round((col("rpo") - col("rpe")) / (lit(1.0) - col("rpe")), 6))
          .as("kappa"))
  }

  /** Per-group Poisson bootstrap CI for the mean of an INTEGER metric
    * (Chamandy, Muralidharan, Najmi & Naidu 2012, "Estimating
    * uncertainty for massive data streams" — the one-pass bootstrap
    * every planet-scale pipeline uses instead of resampling): each of
    * `b` replicates reweights every row by an independent Poisson(1)
    * count derived DETERMINISTICALLY from md5(replicate:id), so the
    * whole bootstrap is one explode + two aggregations — no data
    * movement proportional to b beyond the map side, no RNG state.
    *
    * Exactness: the metric is integral, so every replicate's weighted
    * sum and weight total are exact BIGINTs and its mean is a SINGLE
    * double division — bit-identical across engines and partitionings
    * (no float accumulation-order sensitivity). The CI picks order
    * statistics of the b replicate means: lo = sorted[floor(α/2·(B-1))],
    * hi = sorted[ceil((1-α/2)·(B-1))] (0-based, conservative outward),
    * B counting only replicates with nonzero total weight.
    *
    * Scale design (100 TB): the b-way explode is map-side and combines
    * to (group, replicate) partials before the ONE shuffle — wire
    * volume is groups·b rows regardless of input size; the final
    * per-group sort is over b doubles. Returns
    * (group, n, mean, b_eff, ci_lo, ci_hi), means 6 dp. */
  def poissonBootstrapMeanCI(df: DataFrame, groupCol: String,
      idCol: String, valueCol: String, b: Int = 64,
      alpha: Double = 0.05): DataFrame = {
    require(b >= 4 && b <= 512, s"replicates must be in [4, 512]: $b")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    val x = col(valueCol).cast("long")
    val base = df.where(x.isNotNull)
      .select(col(groupCol).as("g"), col(idCol).cast("string").as("__id"),
        x.as("x"))
    val rep = base.select(col("g"), col("__id"), col("x"),
      explode(sequence(lit(0), lit(b - 1))).as("r"))
    val u = (conv(substring(md5(
        concat(col("r").cast("string"), lit(":"), col("__id"))), 1, 15),
      16, 10).cast("long").cast("double") / lit(1152921504606846976.0))
    val w = poissonCdf1.map(c => (u >= lit(c)).cast("long"))
      .reduce(_ + _)
    val partials = rep
      .select(col("g"), col("r"), w.as("w"), col("x"))
      .groupBy("g", "r")
      .agg(sum(col("w") * col("x")).as("sx"), sum(col("w")).as("sw"))
      .where(col("sw") > 0)
      .select(col("g"), col("r"),
        (col("sx").cast("double") / col("sw")).as("m"))
    val overall = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        (sum(col("x")).cast("double") / count(lit(1))).as("mean"))
    val ci = partials.groupBy("g")
      .agg(sort_array(collect_list(col("m"))).as("ms"),
        count(lit(1)).as("b_eff"))
      .select(col("g"), col("b_eff"),
        element_at(col("ms"),
          (floor(lit(alpha / 2) * (col("b_eff") - 1)) + 1).cast("int"))
          .as("lo"),
        element_at(col("ms"),
          (ceil(lit(1 - alpha / 2) * (col("b_eff") - 1)) + 1).cast("int"))
          .as("hi"))
    overall.join(ci, Seq("g"))
      .select(col("g").as(groupCol), col("n"),
        round(col("mean"), 6).as("mean"), col("b_eff"),
        round(col("lo"), 6).as("ci_lo"), round(col("hi"), 6).as("ci_hi"))
  }
}
