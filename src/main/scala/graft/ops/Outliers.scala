package graft.ops

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Tukey-fence outlier screening per numeric column — the classic
  * box-plot rule (reference surfaces only the raw extreme observations,
  * `model/summary_algorithms.py` extreme-obs; the fence counts are the
  * alert-grade rollup a monitoring pipeline wants).
  *
  * Two scans, both fully fused and map-side combined:
  *   1. ONE aggregate computes `percentile(c, array(0.25, 0.75))` for
  *      every requested column (one sort buffer per column, not one
  *      per quantile);
  *   2. ONE aggregate counts values below/above the fences for every
  *      column simultaneously, then the single result row is melted to
  *      one row per column with `stack` (no shuffle — the melt runs on
  *      a one-row frame).
  *
  * Determinism: quartiles are rounded to `roundTo` decimals (HALF_UP,
  * matching both engines' `round`) BEFORE the fences are derived, so
  * `lo = q1 - k*(q3 - q1)` is the same pure-IEEE arithmetic on the same
  * inputs in any engine and the fence comparisons are exact. At 100 TB
  * the exact percentile pass is the bottleneck — swap in the GK sketch
  * (`approx_percentile`) upstream and keep pass 2 unchanged.
  */
object Outliers {

  private def roundHalfUp(x: Double, scale: Int): Double =
    new JBigDecimal(x).setScale(scale, RoundingMode.HALF_UP).doubleValue()

  /** Per-column Tukey screen: returns one row per column with the
    * rounded quartiles, derived fences, and below/above counts.
    * Nulls and NaNs are excluded from both the quartiles and counts. */
  def tukeyScreen(
      df: DataFrame, cols: Seq[String], k: Double = 1.5,
      roundTo: Int = 6): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    // names ride into percentile/stack SQL strings below — reject the
    // two chars that would break out of the quoting (same posture as
    // Validate.check)
    require(cols.forall(c => !c.contains("`") && !c.contains("'")),
      "column names must not contain backticks or quotes")
    // NaN -> null so percentile (which skips nulls) excludes it; NaN
    // would otherwise sort above +inf and shift the upper quartile
    val qAggs = cols.map { c =>
      val v = s"CAST(`$c` AS DOUBLE)"
      expr(s"percentile(CASE WHEN NOT isnan($v) THEN $v END, " +
        "array(0.25, 0.75))").as(s"q_$c")
    }
    val qRow = df.agg(qAggs.head, qAggs.tail: _*).head()

    val fences = cols.zipWithIndex.map { case (c, i) =>
      require(!qRow.isNullAt(i),
        s"column `$c` has no non-null, non-NaN values — no quartiles")
      val qs = qRow.getSeq[Double](i)
      val q1 = roundHalfUp(qs(0), roundTo)
      val q3 = roundHalfUp(qs(1), roundTo)
      (c, q1, q3, q1 - k * (q3 - q1), q3 + k * (q3 - q1))
    }

    val cAggs = fences.flatMap { case (c, _, _, lo, hi) =>
      val v = col(c).cast("double")
      val live = v.isNotNull && !v.isNaN
      Seq(
        count(when(live && v < lo, 1)).as(s"below_$c"),
        count(when(live && v > hi, 1)).as(s"above_$c"),
        count(when(live, 1)).as(s"n_$c"))
    }
    val counts = df.agg(cAggs.head, cAggs.tail: _*)

    // melt the single result row: stack wants (col_name, q1, q3, lo, hi,
    // below, above, n) tuples — quartiles/fences ride in as literals
    val stackArgs = fences.map { case (c, q1, q3, lo, hi) =>
      s"'$c', ${d(q1)}, ${d(q3)}, ${d(lo)}, ${d(hi)}, " +
        s"`below_$c`, `above_$c`, `n_$c`"
    }.mkString(", ")
    counts
      .select(expr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, q1, q3, lo, hi, n_below, n_above, n)"))
      .orderBy("col_name")
  }

  /** Winsorized (clamped-tail) robust moments of a numeric column:
    * values below the `lo` / above the `hi` percentile are clamped to
    * the fence, then mean/std are computed over the clamped data — the
    * outlier-proof location/scale estimate feature pipelines normalize
    * with (a plain mean moves arbitrarily far under one corrupt row;
    * the winsorized one is bounded).
    *
    * Determinism across engines: the clamped values are quantized to
    * CENTS (×100, round, long) and summed EXACTLY — Σc as a long, Σc²
    * through decimal(38,0) so a 100 TB sum cannot overflow — then mean
    * and std derive from the exact sums with one fixed IEEE expression
    * shape. An engine summing doubles in a different order cannot
    * drift; the only float steps are shared by construction. (The 0.01
    * quantization is exact for money-style data and a negligible bias
    * elsewhere.)
    *
    * Two scans (exact percentile bounds, then one fused clamp+agg);
    * at 100 TB swap the bounds pass to `approx_percentile` upstream.
    * Returns one row: (n, lo_bound, hi_bound, n_clamped_lo,
    * n_clamped_hi, w_mean, w_std). */
  def winsorizedStats(
      df: DataFrame, vCol: String, lo: Double = 0.01,
      hi: Double = 0.99, roundTo: Int = 6): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "need 0 <= lo < hi <= 1")
    require(!vCol.contains("`") && !vCol.contains("'"),
      "column name must not contain backticks or quotes")
    val v = s"CAST(`$vCol` AS DOUBLE)"
    val qRow = df.agg(expr(
      s"percentile(CASE WHEN NOT isnan($v) THEN $v END, " +
        s"array(${d(lo)}, ${d(hi)}))").as("q")).head()
    require(!qRow.isNullAt(0),
      s"column `$vCol` has no non-null, non-NaN values")
    val qs = qRow.getSeq[Double](0)
    val (bLo, bHi) = (roundHalfUp(qs(0), roundTo),
      roundHalfUp(qs(1), roundTo))
    val live = col(vCol).cast("double").isNotNull &&
      !col(vCol).cast("double").isNaN
    val clamped = least(greatest(col(vCol).cast("double"), lit(bLo)),
      lit(bHi))
    val cents = round(clamped * 100, 0).cast("long")
    val centsD = cents.cast("decimal(19,0)")
    df.where(live).agg(
        count(lit(1)).as("n"),
        count(when(col(vCol).cast("double") < bLo, 1))
          .as("n_clamped_lo"),
        count(when(col(vCol).cast("double") > bHi, 1))
          .as("n_clamped_hi"),
        sum(cents).as("sc"),
        sum(centsD * centsD).as("sc2"))
      .select(
        col("n"), lit(bLo).as("lo_bound"), lit(bHi).as("hi_bound"),
        col("n_clamped_lo"), col("n_clamped_hi"),
        round(col("sc").cast("double") / col("n") / 100.0, roundTo)
          .as("w_mean"),
        when(col("n") > 1, round(
          sqrt((col("sc2").cast("double") -
            col("sc").cast("double") * col("sc").cast("double") /
              col("n")) / (col("n") - lit(1.0))) / 100.0, roundTo))
          .as("w_std"))
  }

  /** Modified-z-score anomaly screen (Iglewicz & Hoaglin 1993): flag
    * values with |0.6745·(x − median)/MAD| > `cutoff` (3.5 classic) —
    * the robust alternative to ±3σ that one corrupt row cannot move.
    * Three passes (median; MAD = median of |x − median|; fused count),
    * each a single exact-percentile or count aggregate; median and MAD
    * are 6dp-rounded before use so both engines compare against
    * bit-identical cutoffs (the tukeyScreen convention). At 100 TB
    * swap the percentile passes to GK sketches upstream. Returns one
    * row: (n, median, mad, n_anomalies, anomaly_rate). A zero MAD
    * (> 50% of values identical) yields null anomaly fields rather
    * than dividing by zero. */
  def robustZScreen(
      df: DataFrame, vCol: String, cutoff: Double = 3.5): DataFrame = {
    require(!vCol.contains("`") && !vCol.contains("'"),
      "column name must not contain backticks or quotes")
    val v = s"CAST(`$vCol` AS DOUBLE)"
    val liveExpr = s"CASE WHEN NOT isnan($v) THEN $v END"
    val medRow = df.agg(expr(s"percentile($liveExpr, 0.5)")).head()
    require(!medRow.isNullAt(0),
      s"column `$vCol` has no non-null, non-NaN values")
    val med = roundHalfUp(medRow.getDouble(0), 6)
    val mad = roundHalfUp(df.agg(expr(
      s"percentile(abs(($liveExpr) - ${d(med)}), 0.5)")).head()
      .getDouble(0), 6)
    val live = col(vCol).cast("double").isNotNull &&
      !col(vCol).cast("double").isNaN
    val z = lit(0.6745) * (col(vCol).cast("double") - lit(med)) / lit(mad)
    df.where(live).agg(
        count(lit(1)).as("n"),
        count(when(abs(z) > cutoff, 1)).as("n_anomalies"))
      .select(col("n"), lit(med).as("median"), lit(mad).as("mad"),
        when(lit(mad) =!= 0.0, col("n_anomalies")).as("n_anomalies"),
        when(lit(mad) =!= 0.0,
          round(col("n_anomalies").cast("double") / col("n"), 8))
          .as("anomaly_rate"))
  }

  /** Render a double as a SQL literal that parses back bit-identically
    * (CAST from the shortest round-trip repr). */
  /** Hill estimator of the right-tail index (Hill 1975 — the standard
    * heavy-tail diagnostic; α̂ < 2 means infinite variance, α̂ < 1
    * infinite mean, the regimes where mean-based monitoring silently
    * lies): over the k largest positive values x_(1) ≥ … ≥ x_(k) with
    * threshold x_(k+1),
    *
    *   1/α̂ = (1/k) Σ_{i≤k} ln(x_(i) / x_(k+1))
    *
    * The top-(k+1) values arrive via TakeOrdered (per-partition top-k,
    * no global sort); ties at the threshold are fine (the estimator
    * depends only on the multiset of top values). Values ≤ 0 are
    * excluded (the tail index is defined for a positive right tail).
    * Returns one row (n, k, x_k1, hill_inv, alpha), 6 dp. */
  def hillTailIndex(df: DataFrame, vCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val x = col(vCol).cast("double")
    val pos = df.where(x.isNotNull && x > 0.0).select(x.as("x"))
    val top = pos.orderBy(col("x").desc).limit(k + 1)
    // min-aggregate (not orderBy+limit 1): a 1-row AGGREGATE build side
    // is structurally recognized as bounded by the plan sweep
    val thr = top.agg(min(col("x")).as("xk1"))
    val n = pos.agg(count(lit(1)).as("n"))
    top.crossJoin(broadcast(thr)).where(col("x") > col("xk1"))
      .agg(count(lit(1)).as("k_eff"),
        sum(log(col("x") / col("xk1"))).as("s"),
        first(col("xk1")).as("x_k1"))
      .crossJoin(broadcast(n))
      .select(col("n"), col("k_eff"),
        round(col("x_k1"), 6).as("x_k1"),
        round(col("s") / col("k_eff"), 6).as("hill_inv"),
        round(col("k_eff") / col("s"), 6).as("alpha"))
  }

  private def d(x: Double): String = s"CAST('$x' AS DOUBLE)"

  /** Top-k multivariate (2-feature) Mahalanobis outliers — the
    * correlation-aware distance that catches points no per-column
    * fence can (far in the joint distribution, unremarkable in every
    * marginal). Mean and covariance come from ONE decimal-quantized
    * Gram aggregate (exact integer cent sums — the [[Hypothesis]]
    * discipline, so both engines derive bit-identical μ/Σ), the 2×2
    * inverse is closed-form, and per-row d² = Δᵀ Σ⁻¹ Δ is a map-only
    * projection ranked through the mergeable
    * [[graft.functions.BoundedTopK]] heap on the 10⁻⁶-quantized
    * distance — no window over the data. Returns
    * (rnk, idCol, d2) for the top `k`, d² 6 dp. */
  def mahalanobisTopK(df: DataFrame, idCol: String,
      x1Col: String, x2Col: String, k: Int,
      scale: Int = 2): DataFrame = {
    val f = math.pow(10, scale)
    val x1 = col(x1Col).cast("double")
    val x2 = col(x2Col).cast("double")
    val base = df.where(x1.isNotNull && x2.isNotNull &&
        !isnan(x1) && !isnan(x2) && col(idCol).isNotNull)
      .select(col(idCol).as("rid"), x1.as("x1"), x2.as("x2"))
      .localCheckpoint(false)
    def q(c: org.apache.spark.sql.Column) =
      round(c * f).cast(DecimalType(38, 0))
    val g = base.agg(
      count(lit(1)).as("n"),
      sum(q(col("x1"))).as("s1"), sum(q(col("x2"))).as("s2"),
      sum(q(col("x1")) * q(col("x1"))).as("q11"),
      sum(q(col("x1")) * q(col("x2"))).as("q12"),
      sum(q(col("x2")) * q(col("x2"))).as("q22")).head()
    val n = g.getLong(0).toDouble
    def bd(i: Int) = g.getDecimal(i).toBigInteger.doubleValue
    val (s1, s2, q11, q12, q22) = (bd(1), bd(2), bd(3), bd(4), bd(5))
    val m1 = s1 / n / f
    val m2 = s2 / n / f
    val c11 = (q11 - s1 * s1 / n) / (n - 1.0) / (f * f)
    val c12 = (q12 - s1 * s2 / n) / (n - 1.0) / (f * f)
    val c22 = (q22 - s2 * s2 / n) / (n - 1.0) / (f * f)
    val det = c11 * c22 - c12 * c12
    require(det != 0.0, "degenerate covariance (collinear features)")
    val d1 = col("x1") - lit(m1)
    val d2c = col("x2") - lit(m2)
    val dist2 = round(
      (d1 * (lit(c22) * d1 - lit(c12) * d2c) +
        d2c * (lit(c11) * d2c - lit(c12) * d1)) / lit(det), 6)
    base
      .select(col("rid"), floor(dist2 * lit(1e6) + lit(0.5)).cast("long")
        .as("d2_q"))
      .agg(graft.functions.BoundedTopK
        .topK(col("d2_q"), col("rid"), k).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "t")))
      .select((col("pos") + 1).cast("int").as("rnk"),
        col("t.id").as(idCol),
        (col("t.ord").cast("double") / lit(1e6)).as("d2"))
  }
}
