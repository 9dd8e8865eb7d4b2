package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series diagnostics over an event stream — seasonality and
  * burstiness checks a monitoring pipeline runs on arrival counts.
  * The reference has no temporal surface; this extends the
  * events-analytics family (Sessionize/Funnel/Retention).
  */
object Timeseries {

  /** Autocorrelation of per-period event COUNTS at the requested lags:
    * corr(x_t, x_{t+L}) over the densified series (periods with no
    * events count as ZERO — skipping gaps would bias every lag toward
    * busy stretches). Period indexing is exact integer division of the
    * numeric epoch `timeCol`; the dense axis comes from one bounded
    * `spark.range` join (series length = time span / period, tiny next
    * to the input); each lag is one equi-join of that small series
    * with itself shifted — integer keys, hash join, no window over the
    * raw events.
    *
    * Determinism: all five sufficient statistics (Σx, Σy, Σxy, Σx²,
    * Σy²) are EXACT — counts ride through decimal(38,0) so no float
    * aggregation order exists — and the Pearson fold is one fixed IEEE
    * expression on the exact sums. Degenerate lags (constant series →
    * zero variance) return null acf. Returns (lag, n_pairs, acf 6dp),
    * one row per lag, ordered by lag. */
  def countAcf(
      df: DataFrame, timeCol: String, period: Long,
      lags: Seq[Int], maxPeriods: Long = 10000000L): DataFrame = {
    require(period > 0, "period must be positive")
    require(lags.nonEmpty && lags.forall(_ >= 1),
      "lags must be non-empty and >= 1")
    require(!timeCol.contains("`") && !timeCol.contains("'"),
      "column name must not contain backticks or quotes")
    val spark = df.sparkSession
    val b = df.where(col(timeCol).isNotNull)
      // floor division (pmod form): `div` truncates toward zero and
      // would misbucket pre-epoch times vs the floor-semantics oracle
      .select(expr(s"(`$timeCol` - pmod(`$timeCol`, $period)) " +
        s"div $period").as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val mm = b.agg(min(col("t")), max(col("t"))).head()
    require(!mm.isNullAt(0), "no non-null time values")
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    // one corrupt timestamp must fail loudly, not inflate the dense
    // axis to billions of zero rows
    require(hi - lo < maxPeriods,
      s"time span ${hi - lo} periods exceeds maxPeriods=$maxPeriods — " +
        "corrupt timestamps? filter the input or raise maxPeriods")
    val dense = spark.range(lo, hi + 1).toDF("t")
      .join(b, Seq("t"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .localCheckpoint(false)
    val perLag = lags.map { l =>
      val xd = col("x").cast("decimal(19,0)")
      val yd = col("y").cast("decimal(19,0)")
      dense.select(col("t"), col("c").as("x"))
        .join(dense.select((col("t") - lit(l.toLong)).as("t"),
          col("c").as("y")), "t")
        .agg(
          count(lit(1)).as("k"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(xd * yd).as("sxy"),
          sum(xd * xd).as("sxx"), sum(yd * yd).as("syy"))
        .select(lit(l.toLong).as("lag"), col("k").as("n_pairs"),
          {
            val kd = col("k").cast("double")
            val sx = col("sx").cast("double")
            val sy = col("sy").cast("double")
            val num = kd * col("sxy").cast("double") - sx * sy
            val vx = kd * col("sxx").cast("double") - sx * sx
            val vy = kd * col("syy").cast("double") - sy * sy
            when(vx > 0 && vy > 0,
              round(num / sqrt(vx * vy), 6)).as("acf")
          })
    }
    perLag.reduce(_ union _).orderBy("lag")
  }

  /** Global inter-arrival-gap statistics: per-key consecutive time
    * gaps (one hash-partitioned window — the sessionize shuffle) then
    * ONE fused corpus aggregate: count, mean, exact p50/p90, and the
    * coefficient of variation — CV >> 1 is the burstiness signature,
    * CV ≈ 1 Poisson. Gap sums and squared sums accumulate in
    * decimal(38,0) (a 30-day micro gap squared is ~7e24, far past
    * LongType), so mean/std are partition-order-exact; percentiles
    * use linear interpolation (identical in any engine). Returns one
    * row: (n_gaps, mean_gap, p50_gap, p90_gap, cv), 6dp-rounded. */
  def interarrivalStats(
      df: DataFrame, keyCol: String, timeCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order: Seq[Column] = (col(timeCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val gaps = df
      .where(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .withColumn("__g", col(timeCol) - lag(col(timeCol), 1).over(w))
      .where(col("__g").isNotNull)
      .select(col("__g").cast("long").as("__g"))
    val gd = col("__g").cast("decimal(38,0)")
    val agg = gaps.agg(
      count(lit(1)).as("n"),
      sum(gd).as("sg"), sum(gd * col("__g")).as("sg2"),
      expr("percentile(__g, array(0.5, 0.9))").as("ps"))
    val nd = col("n").cast("double")
    val mean = col("sg").cast("double") / nd
    val std = sqrt((col("sg2").cast("double") -
      col("sg").cast("double") * col("sg").cast("double") / nd) /
      (nd - 1.0))
    agg.select(
      col("n").as("n_gaps"),
      round(mean, 6).as("mean_gap"),
      round(col("ps").getItem(0), 6).as("p50_gap"),
      round(col("ps").getItem(1), 6).as("p90_gap"),
      when(col("n") > 1 && mean > 0.0, round(std / mean, 6)).as("cv"))
  }

  /** CUSUM changepoint scan over the arrival-count series: the period
    * t* maximizing |Σ_{j≤t}(c_j − mean)| on the zero-filled axis — the
    * level-shift locator (a mean change makes the cumulative deviation
    * peak at the shift). Deviations from the rational mean accumulate
    * in t-order through a window over the BOUNDED dense axis, so both
    * engines execute the identical float sequence and the argmax needs
    * no rounding tolerance; ties break to the earliest period. Returns
    * one row: (t_star, cusum_abs 6dp, mean 6dp, n_periods). */
  def countChangepoint(
      df: DataFrame, timeCol: String, period: Long,
      maxPeriods: Long = 10000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(period > 0, "period must be positive")
    require(!timeCol.contains("`") && !timeCol.contains("'"),
      "column name must not contain backticks or quotes")
    val spark = df.sparkSession
    val b = df.where(col(timeCol).isNotNull)
      .select(expr(s"(`$timeCol` - pmod(`$timeCol`, $period)) " +
        s"div $period").as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val mm = b.agg(min(col("t")), max(col("t")), sum(col("c"))).head()
    require(!mm.isNullAt(0), "no non-null time values")
    val (lo, hi, total) = (mm.getLong(0), mm.getLong(1), mm.getLong(2))
    require(hi - lo < maxPeriods,
      s"time span ${hi - lo} periods exceeds maxPeriods=$maxPeriods — " +
        "corrupt timestamps? filter the input or raise maxPeriods")
    val np = hi - lo + 1
    val mean = total.toDouble / np
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spark.range(lo, hi + 1).toDF("t")
      .join(b, Seq("t"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("__s",
        sum(col("c").cast("double") - lit(mean)).over(wCum))
      .orderBy(abs(col("__s")).desc, col("t"))
      .limit(1)
      .select(col("t").as("t_star"), round(abs(col("__s")), 6)
          .as("cusum_abs"),
        round(lit(mean), 6).as("mean"), lit(np).as("n_periods"))
  }

  /** Per-key time-weighted average (TWAP): each observation's value
    * holds until the key's next observation, so the average weights
    * values by their holding time — the fair summary for irregular
    * sampling, where the plain mean over-counts bursts. The weighted
    * sum Σ v·Δt accumulates in DECIMAL (value at 6dp × long micro
    * gaps), so it is partition-order-exact; the final division is one
    * deterministic double op. One hash-partitioned lead window.
    * Returns (keyCol, n_obs, span, twap 6dp); twap null for
    * single-observation keys (zero span). */
  def twap(
      df: DataFrame, keyCol: String, timeCol: String, vCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val order: Seq[Column] = (col(timeCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    df.where(col(keyCol).isNotNull && col(timeCol).isNotNull &&
        col(vCol).isNotNull)
      .withColumn("__next", lead(col(timeCol), 1).over(w))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_obs"),
        (max(col(timeCol)) - min(col(timeCol))).cast("long").as("span"),
        sum(col(vCol).cast(DecimalType(18, 6)) *
          (col("__next") - col(timeCol))).as("__ws"))
      .select(col(keyCol), col("n_obs"), col("span"),
        when(col("span") > 0, round(
          col("__ws").cast("double") / col("span").cast("double"), 6))
          .as("twap"))
  }

  /** Lead-lag cross-correlation between two event streams' arrival
    * counts — "does series A lead series B?": Pearson between A's
    * zero-filled per-period count at t and B's at t+lag, for each
    * requested lag (negative = A trails). Same exactness discipline as
    * [[countAcf]]: integer counts, decimal(19,0) cross-moments (no
    * float-order hazard), one fixed IEEE fold per lag; the dense axis
    * is bounded by `maxPeriods` so one corrupt timestamp fails loudly.
    * Rows matching neither mark are ignored. Returns (lag, n_pairs,
    * xcorr) ordered by lag; xcorr null when either side is constant
    * over the overlap. */
  def crossCountCorr(
      df: DataFrame, timeCol: String, period: Long,
      markA: Column, markB: Column, lags: Seq[Int],
      maxPeriods: Long = 10000000L): DataFrame = {
    require(period > 0, "period must be positive")
    require(lags.nonEmpty, "lags must be non-empty")
    require(!timeCol.contains("`") && !timeCol.contains("'"),
      "column name must not contain backticks or quotes")
    val spark = df.sparkSession
    val b = df
      .where(col(timeCol).isNotNull && (markA || markB))
      .select(expr(s"(`$timeCol` - pmod(`$timeCol`, $period)) " +
        s"div $period").as("t"), markA.as("__a"), markB.as("__b"))
      .groupBy("t").agg(
        count(when(col("__a"), 1)).as("ca"),
        count(when(col("__b"), 1)).as("cb"))
    val mm = b.agg(min(col("t")), max(col("t"))).head()
    require(!mm.isNullAt(0), "no rows match either mark")
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    require(hi - lo < maxPeriods,
      s"time span ${hi - lo} periods exceeds maxPeriods=$maxPeriods — " +
        "corrupt timestamps? filter the input or raise maxPeriods")
    val dense = spark.range(lo, hi + 1).toDF("t")
      .join(b, Seq("t"), "left")
      .withColumn("ca", coalesce(col("ca"), lit(0L)))
      .withColumn("cb", coalesce(col("cb"), lit(0L)))
      .localCheckpoint(false)
    val perLag = lags.map { l =>
      val xd = col("x").cast("decimal(19,0)")
      val yd = col("y").cast("decimal(19,0)")
      dense.select(col("t"), col("ca").as("x"))
        .join(dense.select((col("t") - lit(l.toLong)).as("t"),
          col("cb").as("y")), "t")
        .agg(
          count(lit(1)).as("k"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(xd * yd).as("sxy"),
          sum(xd * xd).as("sxx"), sum(yd * yd).as("syy"))
        .select(lit(l.toLong).as("lag"), col("k").as("n_pairs"),
          {
            val kd = col("k").cast("double")
            val sx = col("sx").cast("double")
            val sy = col("sy").cast("double")
            val num = kd * col("sxy").cast("double") - sx * sy
            val vx = kd * col("sxx").cast("double") - sx * sx
            val vy = kd * col("syy").cast("double") - sy * sy
            when(vx > 0 && vy > 0,
              round(num / sqrt(vx * vy), 6)).as("xcorr")
          })
    }
    perLag.reduce(_ union _).orderBy("lag")
  }

  /** EWMA control chart over per-period event counts: for every series
    * key and period, the exponentially-weighted moving average of the
    * TRAILING `window` periods (exclusive of the current one — a
    * forecast, not a smoother), the deviation of the observed count
    * from it, and a spike flag when |deviation| exceeds `threshold` ×
    * √ewma (the Poisson-scale control limit) — the standard cheap
    * anomaly monitor on arrival rollups.
    *
    *   ewma_t = Σ_{j=1..K} α(1−α)^{j−1} · x_{t−j}  /  Σ α(1−α)^{j−1}
    *
    * normalized over the lags actually inside the axis, so early
    * periods use what history exists (the first period has none →
    * null ewma). Gaps count as ZERO, like [[countAcf]].
    *
    * Determinism: the K weights are Scala-computed constants folded in
    * as literals (no engine `pow` in the plan — libm vs JDK pow can
    * differ in the last ulp); each weighted term is quantized to 9 dp
    * and summed in DECIMAL(38,9), so the accumulation is
    * partition-order-exact, and the final ratio is one IEEE division.
    *
    * Scale design (100 TB): one map-side-combined groupBy rolls the
    * stream up to (key, period); the dense axis is a bounded
    * spark.range broadcast-joined per key; the lag expansion is a
    * K-way explode of the ROLLUP (K·periods·keys rows, sublinear in
    * the input) hash-aggregated back — no window over raw events, no
    * self-join. Returns (keyCol, t, cnt, ewma, dev, is_spike) ordered
    * by (key, t). */
  def ewmaChart(
      df: DataFrame, keyCol: String, timeCol: String, period: Long,
      alpha: Double = 0.3, window: Int = 7, threshold: Double = 3.0,
      maxPeriods: Long = 10000000L): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(period > 0, "period must be positive")
    require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
    require(window >= 1 && window <= 64, "window must be in [1,64]")
    require(!timeCol.contains("`") && !timeCol.contains("'"),
      "column name must not contain backticks or quotes")
    val spark = df.sparkSession
    val b = df.where(col(timeCol).isNotNull)
      .select(col(keyCol).as("k"),
        expr(s"(`$timeCol` - pmod(`$timeCol`, $period)) div $period")
          .as("t"))
      .groupBy("k", "t").agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // axis bounds + dense + lags share it
    val mm = b.agg(min(col("t")), max(col("t"))).head()
    require(!mm.isNullAt(0), "no non-null time values")
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    require(hi - lo < maxPeriods,
      s"time span ${hi - lo} periods exceeds maxPeriods=$maxPeriods")
    val axis = spark.range(lo, hi + 1).toDF("t")
    val dense = b.select("k").distinct()
      .crossJoin(broadcast(axis))
      .join(b, Seq("k", "t"), "left")
      .na.fill(0L, Seq("c"))
      .localCheckpoint(false)
    val weights = (1 to window).map(l =>
      alpha * math.pow(1.0 - alpha, (l - 1).toDouble))
    val wCol = weights.zipWithIndex.foldLeft(lit(Double.NaN)) {
      case (acc, (w, i)) => when(col("lag") === i + 1, lit(w)).otherwise(acc)
    }
    val contrib = dense
      .select(col("k"), col("t").as("tj"), col("c").as("cj"),
        explode(array((1 to window).map(lit(_)): _*)).as("lag"))
      .withColumn("t", col("tj") + col("lag"))
      .where(col("t") <= hi)
      .withColumn("w", wCol)
      .groupBy("k", "t")
      .agg(
        sum(round(col("w") * col("cj"), 9).cast(DecimalType(38, 9)))
          .as("num"),
        sum(round(col("w"), 9).cast(DecimalType(38, 9))).as("den"))
    val raw = col("num").cast("double") / col("den").cast("double")
    val haveHist = col("den").isNotNull && col("den") > 0
    dense.join(contrib, Seq("k", "t"), "left")
      .select(col("k").as(keyCol), col("t"), col("c").as("cnt"),
        when(haveHist, round(raw, 6)).as("ewma"),
        when(haveHist, round(col("c") - raw, 6)).as("dev"),
        when(haveHist,
          abs(col("c") - raw) > lit(threshold) * sqrt(raw)).as("is_spike"))
      .orderBy(keyCol, "t")
  }

  /** Mann-Kendall trend test + Sen's slope per series key — the
    * nonparametric "is this metric drifting?" check a monitoring
    * pipeline runs on per-period rollups (robust to outliers and to
    * any monotone transform, unlike an OLS slope):
    *
    *   S    = Σ_{i<j} sgn(v_j − v_i)          (by `orderCol`)
    *   varS = (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)) / 18   (tie-corrected)
    *   z    = (S−1)/√varS  if S>0,  (S+1)/√varS  if S<0,  else 0
    *   sen  = median over pairs of (v_j − v_i)/(t_j − t_i)
    *
    * Input is an already-aggregated series table (one row per key and
    * order value — e.g. daily counts); `orderCol` must be unique per
    * key so slope denominators are nonzero. The pairwise self-join is
    * O(n²) per key ON THE ROLLUP, whose length is bounded by the time
    * span — at 100 TB the rollup is still days × keys, so the join is
    * tiny; the raw stream never self-joins. S and the tie terms are
    * integer-exact (no float aggregation order); varS/z/sen are fixed
    * per-row IEEE expressions on exact sums, engine-stable at 6 dp —
    * the sen median interpolates exactly like SQL quantile_cont.
    *
    * Returns (keyCol, n, s, var_s, z, sen_slope); z is null when
    * varS = 0 (all-tied series), single-point keys report s=0 with
    * null z and sen_slope. */
  def mannKendall(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    val s0 = df
      .select(col(keyCol).as("k"), col(orderCol).cast("double").as("t"),
        col(valueCol).cast("double").as("v"))
      .where(col("t").isNotNull && col("v").isNotNull)
      .localCheckpoint(false) // pairs, ties, and counts share one scan
    val a = s0.select(col("k"), col("t").as("ta"), col("v").as("va"))
    val b = s0.select(col("k"), col("t").as("tb"), col("v").as("vb"))
    val pairAgg = a.join(b, Seq("k")).where(col("ta") < col("tb"))
      .groupBy("k")
      .agg(
        sum(signum(col("vb") - col("va")).cast("long")).as("s"),
        round(expr("percentile((vb - va) / (tb - ta), 0.5)"), 6)
          .as("sen_slope"))
    val ties = s0.groupBy("k", "v").agg(count(lit(1)).as("tj"))
      .groupBy("k")
      .agg(sum(col("tj")).as("n"),
        sum(col("tj") * (col("tj") - 1) * (lit(2L) * col("tj") + 5))
          .as("tie_term"))
    val varS = (col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5) -
      col("tie_term")).cast("double") / 18.0
    ties.join(pairAgg, Seq("k"), "left")
      .withColumn("s", coalesce(col("s"), lit(0L)))
      .select(col("k").as(keyCol), col("n"), col("s"),
        round(varS, 6).as("var_s"),
        when(varS > 0.0, round(
          when(col("s") > 0, (col("s") - 1).cast("double") / sqrt(varS))
            .when(col("s") < 0, (col("s") + 1).cast("double") / sqrt(varS))
            .otherwise(0.0), 6)).as("z"),
        col("sen_slope"))
  }

  /** Weekly seasonal profile of event arrivals: count per
    * (iso-dow, hour-of-day) bucket, each bucket's share of traffic,
    * its lift vs a uniform week, and a Poisson-scale spike flag — the
    * baseline a monitoring pipeline subtracts before calling anything
    * an anomaly (q159's EWMA chart handles the trend axis; this is
    * the calendar axis).
    *
    * `tsUsCol` is integer epoch-MICROSECONDS (UTC). Both bucket
    * coordinates are pure integer arithmetic on it — iso-dow from the
    * epoch day number (1970-01-01 was a Thursday, isodow 4), hour from
    * us-per-hour division — so no calendar/timezone library is in the
    * loop and any engine reproduces the bucketing exactly. All 168
    * buckets are emitted (empty ones as zero) via one bounded axis
    * join; counts are exact integers, share/lift/z one fixed IEEE
    * expression each. ONE groupBy over the events, nothing global.
    *
    * Returns (isodow 1-7 Mon-Sun, hour 0-23, n, share, lift, z, spike)
    * — share/lift/z 6dp, z = (n-μ)/√μ against the uniform-week mean,
    * spike = z > 3. */
  def seasonalProfile(df: DataFrame, tsUsCol: String): DataFrame = {
    require(!tsUsCol.contains("`") && !tsUsCol.contains("'"),
      "column name must not contain backticks or quotes")
    val spark = df.sparkSession
    val us = col(tsUsCol).cast("long")
    val DayUs = 86400000000L
    // floor-division day number + non-negative in-day remainder (the
    // pmod form — `div` alone truncates toward zero pre-epoch)
    val day = expr(s"(`$tsUsCol` - pmod(`$tsUsCol`, $DayUs)) div $DayUs")
    val isodow = pmod(day + lit(3L), lit(7L)) + lit(1L) // epoch day 0 = Thu
    val hour = expr(s"pmod(`$tsUsCol`, $DayUs) div ${3600000000L}")
    val counts = df.where(us.isNotNull)
      .groupBy(isodow.cast("int").as("isodow"), hour.cast("int").as("hour"))
      .agg(count(lit(1)).as("n"))
      // referenced twice (densify + total) — pin the <=168-row table
      // so the event scan runs once
      .localCheckpoint(false)
    val axis = spark.range(168).select(
      (col("id") / 24 + 1).cast("int").as("isodow"),
      (col("id") % 24).cast("int").as("hour"))
    val dense = axis.join(counts, Seq("isodow", "hour"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(counts.agg(sum(col("n")).as("tot"))))
    val total = col("tot").cast("double")
    val mu = total / lit(168.0)
    dense.select(col("isodow"), col("hour"), col("n"),
      round(col("n").cast("double") / total, 6).as("share"),
      round(col("n").cast("double") * lit(168.0) / total, 6).as("lift"),
      when(mu > 0.0, round((col("n").cast("double") - mu) / sqrt(mu), 6))
        .as("z"))
      .withColumn("spike", coalesce(col("z") > 3.0, lit(false)))
  }

  /** M4 visualization downsampling (Jugel et al., "M4: A
    * Visualization-Oriented Time Series Data Aggregation", VLDB 2014 —
    * public algorithm): per time bucket, the first/last/min/max values
    * — the four points that make a line chart of the bucket
    * pixel-exact at that resolution, reducing any series to 4 rows per
    * pixel column no matter the input density.
    *
    * One map-side-combined groupBy on the bucket; first/last are
    * `min_by`/`max_by` over the (ts, tieCol) struct — pure SELECTION,
    * no float arithmetic, so outputs are bit-exact. At 100 TB this is
    * the operator a dashboard layer runs instead of shipping raw
    * points. */
  def m4Downsample(
      df: DataFrame, tsUsCol: String, valCol: String, tieCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val e = df
      .where(col(tsUsCol).isNotNull && col(valCol).isNotNull)
      .select(expr(s"$tsUsCol div ${bucketUs}L").as("bucket"),
        col(valCol).as("__v"),
        struct(col(tsUsCol), col(tieCol)).as("__ord"))
    e.groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        min(col("__v")).as("v_min"),
        max(col("__v")).as("v_max"),
        min_by(col("__v"), col("__ord")).as("v_first"),
        max_by(col("__v"), col("__ord")).as("v_last"))
  }

  /** Per-key resample + forward-fill — the pandas
    * `resample().ffill()` every time-series consumer asks of an
    * analytics engine and Spark has no built-in for: collapse
    * observations to one value per (key, period) (latest wins,
    * deterministic (ts, value) lexicographic pick), materialize each
    * key's FULL period grid between its first and last observation
    * (a bounded calendar explode), and carry the last observed value
    * across the gaps.
    *
    * Scale shape: one groupBy for the per-period collapse, one for
    * the per-key span, the grid explode is calendar-bounded, and the
    * fill window partitions on ONE key's grid — bounded by span, not
    * rows. Returns (keyCol, period, value), gaps filled. */
  def resampleFfill(df: DataFrame, keyCol: String, tsUsCol: String,
      valueCol: String, periodUs: Long): DataFrame = {
    require(periodUs > 0, "periodUs must be positive")
    import org.apache.spark.sql.expressions.Window
    val per = expr(
      s"(`$tsUsCol` - pmod(`$tsUsCol`, $periodUs)) div $periodUs")
    val base = df.where(col(keyCol).isNotNull && col(tsUsCol).isNotNull
        && col(valueCol).isNotNull)
      .select(col(keyCol).as("k"), per.as("p"),
        col(tsUsCol).as("ts"), col(valueCol).cast("double").as("v"))
      .localCheckpoint(false)
    // latest observation per (key, period): lexicographic (ts, v) max
    val obs = base.groupBy("k", "p")
      .agg(max(struct(col("ts"), col("v"))).as("m"))
      .select(col("k"), col("p"), col("m.v").as("v"))
    val grid = base.groupBy("k")
      .agg(min(col("p")).as("p0"), max(col("p")).as("p1"))
      .select(col("k"),
        explode(sequence(col("p0"), col("p1"))).as("p"))
    val w = Window.partitionBy("k").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(obs, Seq("k", "p"), "left")
      .select(col("k").as(keyCol), col("p").as("period"),
        last(col("v"), ignoreNulls = true).over(w).as("value"))
      .orderBy(keyCol, "period")
  }

  /** Rolling distinct actives — WAU-by-day and its cousins: for every
    * period `d` in the data's range, the EXACT count of distinct keys
    * active in the trailing window `[d - (span-1), d]`. Spark's window
    * frames cannot express COUNT(DISTINCT) over a RANGE frame, and
    * streaming sketches only approximate it; the exact scalable plan
    * is: collapse to distinct (key, period) once, fan each activity
    * out to the ≤ `span` periods whose trailing window it enters
    * (bounded explode — a calendar fanout, not a data fanout), then
    * distinct-count per period, semi-joined to the tiny observed-
    * period set so the tail never reports windows past the data.
    * Shuffles on (period[, key]) only; per-period work is bounded by
    * actives × span. Returns (period, n_active), ordered. */
  def rollingDistinct(df: DataFrame, keyCol: String, tsUsCol: String,
      periodUs: Long, span: Int): DataFrame = {
    require(periodUs > 0 && span >= 1, "need periodUs > 0, span >= 1")
    val per = expr(
      s"(`$tsUsCol` - pmod(`$tsUsCol`, $periodUs)) div $periodUs")
    val base = df.where(col(keyCol).isNotNull && col(tsUsCol).isNotNull)
      .select(col(keyCol).as("k"), per.as("p"))
      .distinct()
      .localCheckpoint(false)
    // restrict to periods that occur in the data: the calendar fanout
    // otherwise reports trailing windows past the observed range
    val observed = base.select(col("p").as("period")).distinct()
    base
      .select(col("k"),
        explode(sequence(col("p"), col("p") + (span - 1))).as("period"))
      .join(observed, Seq("period"), "left_semi")
      .groupBy("period")
      .agg(countDistinct(col("k")).as("n_active"))
      .orderBy("period")
  }

  /** Per-key resample + LINEAR INTERPOLATION — the pandas
    * `resample().interpolate()` sibling of [[resampleFfill]] (the pair
    * real consumers reach for together): same latest-wins collapse and
    * bounded calendar grid, but each interior gap takes the straight
    * line between its surrounding observations instead of carrying the
    * last one forward. The grid spans each key's first..last observed
    * period, so every gap has BOTH neighbors (pandas' default linear
    * interpolate has no leading/trailing fill either).
    *
    * Same scale shape as ffill: per-(key,period) groupBy, per-key span
    * groupBy, calendar-bounded explode, and the neighbor windows
    * partition on one key's grid. Interpolated cells are 6dp-rounded
    * with one fixed parenthesization — v_prev + (v_next − v_prev) ·
    * ((p − p_prev)/(p_next − p_prev)) — so any engine reproduces them;
    * observed cells pass through raw. Returns (keyCol, period, value). */
  def resampleInterpolate(df: DataFrame, keyCol: String, tsUsCol: String,
      valueCol: String, periodUs: Long): DataFrame = {
    require(periodUs > 0, "periodUs must be positive")
    import org.apache.spark.sql.expressions.Window
    val per = expr(
      s"(`$tsUsCol` - pmod(`$tsUsCol`, $periodUs)) div $periodUs")
    val base = df.where(col(keyCol).isNotNull && col(tsUsCol).isNotNull
        && col(valueCol).isNotNull)
      .select(col(keyCol).as("k"), per.as("p"),
        col(tsUsCol).as("ts"), col(valueCol).cast("double").as("v"))
      .localCheckpoint(false)
    val obs = base.groupBy("k", "p")
      .agg(max(struct(col("ts"), col("v"))).as("m"))
      .select(col("k"), col("p"), col("m.v").as("v"))
    val grid = base.groupBy("k")
      .agg(min(col("p")).as("p0"), max(col("p")).as("p1"))
      .select(col("k"),
        explode(sequence(col("p0"), col("p1"))).as("p"))
    val wPrev = Window.partitionBy("k").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy("k").orderBy("p")
      .rowsBetween(0, Window.unboundedFollowing)
    val joined = grid.join(obs, Seq("k", "p"), "left")
      .withColumn("v_prev", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("p_prev",
        last(when(col("v").isNotNull, col("p")), ignoreNulls = true)
          .over(wPrev))
      .withColumn("v_next", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("p_next",
        first(when(col("v").isNotNull, col("p")), ignoreNulls = true)
          .over(wNext))
    // double division: a gap row always has p_next > p_prev, and the
    // observed-row branch never reads the (0/0 = NaN) fraction
    val frac = (col("p") - col("p_prev")).cast("double") /
      (col("p_next") - col("p_prev")).cast("double")
    joined.select(col("k").as(keyCol), col("p").as("period"),
      when(col("v").isNotNull, col("v"))
        .otherwise(round(
          col("v_prev") + (col("v_next") - col("v_prev")) * frac, 6))
        .as("value"))
      .orderBy(keyCol, "period")
  }

}
