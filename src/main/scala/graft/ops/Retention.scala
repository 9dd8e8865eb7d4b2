package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cohort retention analysis — the activation/stickiness matrix every
  * product-analytics stack derives from an event stream: users grouped
  * by the period of their FIRST activity (the cohort), then counted in
  * each later period they return. The reference has no temporal
  * operators; this extends the events-analytics family
  * (Sessionize/Funnel/Transitions).
  *
  * Scale design: the (user, period) projection collapses to DISTINCT
  * pairs first (map-side combined — one row per active user-period, not
  * per event), the cohort assignment is a groupBy-min on the user, and
  * the matrix rollup is a second small groupBy; both shuffles hash on
  * uniformly-distributed keys. Period indexing is exact INTEGER
  * division of the epoch time (`div`) — no float boundary can move a
  * user between periods, in any engine.
  */
object Retention {

  /** Retention matrix: one row per (cohort_period, period_offset) with
    * the distinct-user count active in that offset. `timeCol` is a
    * NUMERIC epoch column (e.g. microseconds); `period` the bucket
    * width in the same unit (non-positive rejected). Offsets are
    * guaranteed ≥ 0 (cohort = the user's minimum period). */
  def cohortRetention(
      df: DataFrame, userCol: String, timeCol: String,
      period: Long): DataFrame = {
    require(period > 0, "period must be positive")
    require(!timeCol.contains("`") && !timeCol.contains("'"),
      "column name must not contain backticks or quotes")
    val uw = df
      .where(col(userCol).isNotNull && col(timeCol).isNotNull)
      .select(col(userCol).as("u"),
        // FLOOR division ((a - pmod) div b): Spark's `div` truncates
        // toward zero, which would merge periods -(p-1)..(p-1) into
        // one double-width bucket for pre-epoch times and disagree
        // with floor-semantics `//` oracles
        expr(s"(`$timeCol` - pmod(`$timeCol`, $period)) div $period")
          .as("wk"))
      .distinct()
      .localCheckpoint(false)
    val cohorts = uw.groupBy("u").agg(min(col("wk")).as("cohort"))
    uw.join(cohorts, "u")
      .groupBy(col("cohort").as("cohort_period"),
        (col("wk") - col("cohort")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Cohort lifetime-value curves — the revenue companion to
    * [[cohortRetention]]: users are cohorted by their FIRST activity
    * period (any event type), revenue accrues from `revenueFilter`
    * rows only, and each (cohort, age) cell reports the cohort's
    * per-user cumulative revenue — the LTV curve a growth team reads
    * against acquisition cost.
    *
    * Shuffle shape: one distinct-user-period pass for cohorts, one
    * groupBy for per-(cohort, age) revenue (decimal-exact), then the
    * cumulative sum runs on the AGGREGATED grid — the window partition
    * is one cohort's age axis, bounded by the calendar, never by
    * users (the [[kaplanMeier]] bounded-window contract). Returns
    * (cohort_period, period_offset, n_users, rev, cum_rev,
    * ltv_per_user): rev/cum_rev exact decimal→double, ltv 6 dp. */
  def cohortLtv(
      df: DataFrame, userCol: String, timeCol: String,
      valueCol: String, revenueFilter: Column,
      period: Long): DataFrame = {
    require(period > 0, "period must be positive")
    require(!timeCol.contains("`") && !timeCol.contains("'"),
      "column name must not contain backticks or quotes")
    val per =
      expr(s"(`$timeCol` - pmod(`$timeCol`, $period)) div $period")
    val base = df
      .where(col(userCol).isNotNull && col(timeCol).isNotNull)
      .select(col(userCol).as("u"), per.as("per"),
        col(valueCol).cast(DecimalType(18, 6)).as("v"),
        revenueFilter.as("is_rev"))
      .localCheckpoint(false)
    val cohorts = base.groupBy("u").agg(min(col("per")).as("cohort"))
    val sizes = cohorts.groupBy("cohort")
      .agg(countDistinct(col("u")).as("n_users"))
    val cells = base.where(col("is_rev"))
      .join(cohorts, "u")
      .groupBy(col("cohort"), (col("per") - col("cohort")).as("age"))
      .agg(sum(col("v")).as("rev"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cohort").orderBy("age")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    cells.join(sizes, "cohort")
      .select(col("cohort").as("cohort_period"),
        col("age").as("period_offset"),
        col("n_users"),
        col("rev").cast("double").as("rev"),
        sum(col("rev")).over(w).cast("double").as("cum_rev"),
        round(sum(col("rev")).over(w).cast("double") /
          col("n_users"), 6).as("ltv_per_user"))
      .orderBy("cohort_period", "period_offset")
  }

  /** Kaplan-Meier survival curve from per-subject (duration, observed)
    * rows — durations with `observed` true are churn/death events,
    * false are right-censored (still active at last sight). `durCol`
    * must be QUANTIZED time units (days, weeks): the curve has one row
    * per distinct death time, and the cumulative-product windows run
    * on the aggregated per-duration table, which is bounded by the
    * duration grid, never the subject count (the same bounded-window
    * contract as the vocabulary ranking).
    *
    * At each death time t_i: n_risk = subjects with duration ≥ t_i
    * (censored-at-t_i counted at risk, the standard convention),
    * d = deaths at t_i, and S(t_i) = Π_{j≤i} (1 − d_j/n_j), computed
    * as exp(Σ ln) — both factors accumulate in duration order, so the
    * float sequence is identical in any engine; a d = n_risk final
    * step short-circuits to exactly 0 rather than ln(0). One
    * groupBy(duration) shuffle; everything after runs on the bounded
    * grid — and that contract is now ENFORCED, not just documented:
    * the aggregated grid is checkpointed and counted, and a duration
    * domain wider than `maxGrid` fails loudly (the countAcf contract,
    * Timeseries.countAcf) instead of funneling an unbounded axis into
    * the one-task cumulative window. Returns (t, n_risk, d, surv) for
    * death times, ordered by t, surv 6dp-rounded. */
  def kaplanMeier(
      df: DataFrame, durCol: String, obsCol: String,
      maxGrid: Long = 10000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dur = col(durCol).cast("long")
    val obs = col(obsCol).cast("boolean")
    val c = df
      .where(dur.isNotNull && obs.isNotNull)
      .select(dur.as("__t"), obs.as("__o"))
      .groupBy("__t")
      .agg(count(lit(1)).as("cnt"), count(when(col("__o"), 1)).as("d"))
      .localCheckpoint(false)
    requireBoundedGrid(c, maxGrid, "kaplanMeier")
    val totals = c.agg(sum(col("cnt")).as("total"))
    // prior = subjects with strictly smaller duration (exclusive
    // prefix over the bounded duration grid)
    val wPrior = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = col("d").cast("double")
    val nd = col("n_risk").cast("double")
    c.crossJoin(totals)
      .withColumn("n_risk",
        col("total") - coalesce(sum(col("cnt")).over(wPrior), lit(0L)))
      .where(col("d") > 0)
      .withColumn("__cum",
        sum(when(col("d") < col("n_risk"), log(lit(1.0) - dd / nd)))
          .over(wCum))
      .select(col("__t").as("t"), col("n_risk"), col("d"),
        when(col("d") === col("n_risk"), lit(0.0))
          .otherwise(round(exp(col("__cum")), 6)).as("surv"))
      .orderBy("t")
  }

  /** Log-rank test (Mantel 1966; Peto & Peto 1972) between TWO
    * survival curves from per-subject (duration, observed, group)
    * rows — the standard "did cohort A churn differently from cohort
    * B" hypothesis test that pairs with [[kaplanMeier]]. At each
    * death time: hypergeometric expectation E_A = d·n_A/n and
    * variance d·(n_A/n)·(n_B/n)·(n−d)/(n−1); the statistic is
    * (Σ(d_A − E_A))² / ΣV ~ χ²(1).
    *
    * Same plan contract as the KM curve: one groupBy(duration)
    * shuffle, exclusive prefix sums for the at-risk counts over the
    * BOUNDED duration grid, then per-time E/V terms
    * floor(t·10⁹ + 0.5)-quantized before the final sums so the
    * statistic is order-invariant and engine-exact. The duration grid
    * is checkpointed, counted, and `maxGrid`-guarded like
    * [[kaplanMeier]]'s. Returns one row:
    * (n_times, d_a, e_a, var_sum, chi2), 6 dp. */
  def logRank(df: DataFrame, durCol: String, obsCol: String,
      groupA: org.apache.spark.sql.Column,
      maxGrid: Long = 10000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dur = col(durCol).cast("long")
    val obs = col(obsCol).cast("boolean")
    val c = df
      .where(dur.isNotNull && obs.isNotNull)
      .select(dur.as("__t"), obs.as("__o"), groupA.as("__a"))
      .groupBy("__t")
      .agg(count(lit(1)).as("cnt"),
        count(when(col("__a"), 1)).as("cnt_a"),
        count(when(col("__o"), 1)).as("d"),
        count(when(col("__o") && col("__a"), 1)).as("d_a"))
      .localCheckpoint(false)
    requireBoundedGrid(c, maxGrid, "logRank")
    val totals = c.agg(sum(col("cnt")).as("total"),
      sum(col("cnt_a")).as("total_a"))
    val wPrior = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val terms = c.crossJoin(broadcast(totals))
      .withColumn("n_risk",
        col("total") - coalesce(sum(col("cnt")).over(wPrior), lit(0L)))
      .withColumn("n_risk_a", col("total_a") -
        coalesce(sum(col("cnt_a")).over(wPrior), lit(0L)))
      .where(col("d") > 0)
    val n = col("n_risk").cast("double")
    val na = col("n_risk_a").cast("double")
    val dd = col("d").cast("double")
    val eA = dd * na / n
    val vA = when(col("n_risk") > 1,
      dd * (na / n) * ((n - na) / n) *
        ((n - dd) / (n - lit(1.0)))).otherwise(lit(0.0))
    terms
      .select(col("d_a"),
        floor(eA * lit(1e9) + lit(0.5)).cast("long").as("e_q"),
        floor(vA * lit(1e9) + lit(0.5)).cast("long").as("v_q"))
      .agg(count(lit(1)).as("n_times"),
        sum(col("d_a")).as("d_a"),
        sum(col("e_q")).as("e_qs"),
        sum(col("v_q")).as("v_qs"))
      .select(col("n_times"), col("d_a"),
        round(col("e_qs").cast("double") / lit(1e9), 6).as("e_a"),
        round(col("v_qs").cast("double") / lit(1e9), 6).as("var_sum"),
        round(((col("d_a").cast("double") -
            col("e_qs").cast("double") / lit(1e9)) *
          (col("d_a").cast("double") -
            col("e_qs").cast("double") / lit(1e9))) /
          (col("v_qs").cast("double") / lit(1e9)), 6).as("chi2"))
  }

  /** Cox proportional-hazards regression (Cox 1972, Breslow ties), one
    * covariate, `steps` Newton-Raphson steps on the partial
    * likelihood — the model behind every "which factor drives churn"
    * analysis, completing the survival suite ([[kaplanMeier]] /
    * [[nelsonAalen]] / [[logRank]] describe; this one ATTRIBUTES.
    *
    * The whole iteration runs on the BOUNDED duration grid: with β
    * fixed, each subject contributes exp(β·x)-weighted terms
    * (quantized to 10⁻⁹ longs at birth), per-duration sums aggregate
    * map-side, the risk-set sums S₀/S₁/S₂ are reverse-cumulative
    * INTEGER sums over the grid, and the per-death-time score/
    * information terms are re-quantized before the final reduction —
    * so, exactly as for the GD/NB trainers, last-ulp libm exp drift
    * cannot propagate and the oracle unrolls identical iterations
    * (step 1 is even all-integer: exp(0) = 1). β re-quantizes to
    * 10⁻⁹ between steps. Returns one row:
    * (n_subjects, n_deaths, beta, hazard_ratio 6dp). */
  def coxPh(df: DataFrame, durCol: String, obsCol: String,
      xCol: String, steps: Int = 2,
      maxGrid: Long = 10000000L): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val base = df
      .where(col(durCol).isNotNull && col(obsCol).isNotNull &&
        col(xCol).isNotNull)
      .select(col(durCol).cast("long").as("t"),
        col(obsCol).cast("boolean").cast("int").as("e"),
        col(xCol).cast("double").as("x"))
      .localCheckpoint(false)
    // grid guard rides the existing counts aggregate — zero extra jobs
    val counts = base
      .agg(count(lit(1)), sum(col("e")), countDistinct(col("t"))).head()
    val (nSubj, nDeath) = (counts.getLong(0), counts.getLong(1))
    require(counts.getLong(2) <= maxGrid,
      s"coxPh: ${counts.getLong(2)} distinct durations exceed " +
        s"maxGrid=$maxGrid — the per-iteration cumulative windows run " +
        "single-task over this grid; quantize durations or raise maxGrid")
    var beta = 0.0
    val wRev = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    for (_ <- 1 to steps) {
      val w = exp(lit(beta) * col("x"))
      def q9(c: org.apache.spark.sql.Column) =
        floor(c * lit(1e9) + lit(0.5)).cast("long")
      val grid = base.select(col("t"), col("e"), col("x"),
          q9(w).as("w_q"), q9(col("x") * w).as("xw_q"),
          q9(col("x") * col("x") * w).as("xxw_q"),
          q9(col("x")).as("x_q"))
        .groupBy("t")
        .agg(sum(col("w_q")).as("sw"), sum(col("xw_q")).as("sxw"),
          sum(col("xxw_q")).as("sxxw"),
          sum(col("e")).as("d"),
          sum(col("e") * col("x_q")).as("sxd_q"))
        .withColumn("s0q", sum(col("sw")).over(wRev))
        .withColumn("s1q", sum(col("sxw")).over(wRev))
        .withColumn("s2q", sum(col("sxxw")).over(wRev))
        .where(col("d") > 0)
      val s0 = col("s0q").cast("double") / lit(1e9)
      val s1 = col("s1q").cast("double") / lit(1e9)
      val s2 = col("s2q").cast("double") / lit(1e9)
      val dd = col("d").cast("double")
      val gT = col("sxd_q").cast("double") / lit(1e9) - dd * (s1 / s0)
      val hT = dd * (s2 / s0 - (s1 / s0) * (s1 / s0))
      val sums = grid.agg(
        sum(floor(gT * lit(1e9) + lit(0.5)).cast("long")).as("gq"),
        sum(floor(hT * lit(1e9) + lit(0.5)).cast("long")).as("hq"))
        .head()
      val g = sums.getLong(0).toDouble / 1e9
      val h = sums.getLong(1).toDouble / 1e9
      require(h > 0.0, "degenerate information (constant covariate?)")
      beta = math.floor((beta + g / h) * 1e9 + 0.5) / 1e9
    }
    import spark.implicits._
    Seq((nSubj, nDeath, beta,
        math.floor(math.exp(beta) * 1e6 + 0.5) / 1e6))
      .toDF("n_subjects", "n_deaths", "beta", "hazard_ratio")
  }

  /** Nelson-Aalen cumulative hazard from the same per-subject
    * (duration, observed) rows as [[kaplanMeier]]: H(t_i) =
    * Σ_{j≤i} d_j/n_j over the death times — the estimator survival
    * analysis prefers when the hazard itself (churn intensity over
    * tenure) is the readout, and the numerically gentler route to
    * S(t) ≈ exp(−H) under heavy censoring. Identical plan shape to
    * the KM curve: one groupBy(duration) shuffle, then exclusive
    * prefix sums over the bounded duration grid; each d/n term is one
    * double division and the cumulative sum runs in duration order,
    * so the float sequence is engine-exact. The grid is checkpointed,
    * counted, and `maxGrid`-guarded like [[kaplanMeier]]'s. Returns
    * (t, n_risk, d, cumhaz) for death times, ordered by t, cumhaz
    * 6dp-rounded. */
  def nelsonAalen(
      df: DataFrame, durCol: String, obsCol: String,
      maxGrid: Long = 10000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dur = col(durCol).cast("long")
    val obs = col(obsCol).cast("boolean")
    val c = df
      .where(dur.isNotNull && obs.isNotNull)
      .select(dur.as("__t"), obs.as("__o"))
      .groupBy("__t")
      .agg(count(lit(1)).as("cnt"), count(when(col("__o"), 1)).as("d"))
      .localCheckpoint(false)
    requireBoundedGrid(c, maxGrid, "nelsonAalen")
    val totals = c.agg(sum(col("cnt")).as("total"))
    val wPrior = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c.crossJoin(totals)
      .withColumn("n_risk",
        col("total") - coalesce(sum(col("cnt")).over(wPrior), lit(0L)))
      .where(col("d") > 0)
      .withColumn("__cum",
        sum(col("d").cast("double") / col("n_risk").cast("double"))
          .over(wCum))
      .select(col("__t").as("t"), col("n_risk"), col("d"),
        round(col("__cum"), 6).as("cumhaz"))
      .orderBy("t")
  }

  /** Daily active/new/returning rollup — the DAU decomposition every
    * product dashboard leads with: per period, total events, distinct
    * active keys, keys whose FIRST-ever activity falls in that period
    * (new), and the rest (returning).
    *
    * Scale design: events collapse to (period, key) counts first
    * (map-side combined), first-seen is a groupBy-min on the key, and
    * the final rollup joins those two key-partitioned tables — three
    * hash shuffles on uniform keys, no window, no distinct-over-window.
    * Period indexing is exact integer division of the epoch column. */
  /** Enforce the survival ops' bounded-grid window contract: the
    * cumulative windows downstream run in ONE task over the aggregated
    * duration grid, so an unbounded duration domain (raw-microsecond
    * durations, a corrupt column) must fail loudly here — the same
    * posture as `Timeseries.countAcf`'s maxPeriods guard. The grid is
    * already checkpointed, so the count is a cheap local scan and the
    * main query reuses the materialized grid (no second pass over the
    * raw data). */
  private def requireBoundedGrid(
      grid: DataFrame, maxGrid: Long, op: String): Unit = {
    val n = grid.count()
    require(n <= maxGrid,
      s"$op: $n distinct durations exceed maxGrid=$maxGrid — the " +
        "cumulative windows run single-task over this grid; quantize " +
        "durations (days/weeks) or raise maxGrid")
  }

  def dailyActivity(
      df: DataFrame, keyCol: String, timeCol: String,
      period: Long): DataFrame = {
    require(period > 0, "period must be positive")
    val ev = df
      .where(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .select(col(keyCol).as("__k"),
        expr(s"${timeCol} div ${period}L").as("day"))
    val firstDay = ev.groupBy("__k").agg(min(col("day")).as("__first"))
    val daily = ev.groupBy("day", "__k").agg(count(lit(1)).as("__n"))
    daily.join(firstDay, "__k")
      .groupBy("day")
      .agg(
        sum(col("__n")).as("n_events"),
        count(lit(1)).as("active_users"),
        sum(when(col("day") === col("__first"), 1L).otherwise(0L))
          .as("new_users"))
      .withColumn("returning_users",
        col("active_users") - col("new_users"))
  }
}
