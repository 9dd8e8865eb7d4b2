package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distribution-drift detection between two data slices — the
  * two-sample Kolmogorov-Smirnov statistic, the standard train/serve or
  * day-over-day drift screen (Deequ/Evidently class; the reference has
  * no cross-slice operators).
  *
  * KS = max over values v of |F1(v) - F2(v)| where Fi is a slice's
  * empirical CDF. Both CDFs come from ONE value-count table (union with
  * side tags → groupBy(v), map-side combined), and the cumulative sums
  * use the same two-phase range-partitioned prefix-sum shape as
  * [[Ranking]]: per-partition (c1, c2) subtotals to the driver (bounded
  * by partitions), prefix offsets broadcast back, one narrow cumulative
  * pass — no `sum over (order by v)` global window, whose empty
  * partition spec would funnel the whole vocabulary through one
  * reducer. The final max is a plain aggregate.
  *
  * Exactness: cumulative counts are integers; F = cum/n is one IEEE
  * division per side, so the statistic is engine-reproducible
  * bit-for-bit (the oracle replays it with window cumsums).
  */
object Drift {

  /** Shared numeric-slice prep for every two-sample statistic in this
    * file: cast to double, drop null/NaN, tag the side, union, and
    * collapse to per-value counts (one map-side-combined groupBy). */
  private def sideValueCounts(
      df1: DataFrame, df2: DataFrame, vCol: String): DataFrame = {
    def side(df: DataFrame, one: Int) = df
      .select(col(vCol).cast("double").as("v"))
      .where(col("v").isNotNull && !col("v").isNaN)
      .select(col("v"), lit(one).as("s"))
    side(df1, 0).unionByName(side(df2, 1))
      .groupBy("v")
      .agg(
        count(when(col("s") === 0, 1)).as("c1"),
        count(when(col("s") === 1, 1)).as("c2"))
  }

  /** Two-sample KS over `vCol` (nulls/NaNs dropped): returns a one-row
    * DataFrame (ks_stat, n1, n2). */
  def ksTwoSample(
      df1: DataFrame, df2: DataFrame, vCol: String): DataFrame = {
    val spark = df1.sparkSession
    import spark.implicits._
    val counts = sideValueCounts(df1, df2, vCol)
    val p = spark.sessionState.conf.numShufflePartitions
    val ranged: Dataset[(Double, Long, Long)] = counts
      .repartitionByRange(p, col("v"))
      .sortWithinPartitions("v")
      .as[(Double, Long, Long)]
      .persist(StorageLevel.MEMORY_AND_DISK)

    // per-partition subtotals -> driver prefix offsets (bounded by p)
    val subs: Array[(Int, Long, Long)] = ranged
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var s1 = 0L; var s2 = 0L
        it.foreach { case (_, c1, c2) => s1 += c1; s2 += c2 }
        Iterator.single((pid, s1, s2))
      }
      .collect()
    val n1 = subs.map(_._2).sum
    val n2 = subs.map(_._3).sum
    require(n1 > 0 && n2 > 0, s"both slices need rows, got $n1/$n2")
    val offsets: Map[Int, (Long, Long)] = {
      var c1 = 0L; var c2 = 0L
      subs.sortBy(_._1).map { case (pid, s1, s2) =>
        val e = pid -> ((c1, c2)); c1 += s1; c2 += s2; e
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)

    val stat = ranged
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var (cum1, cum2) = bc.value.getOrElse(pid, (0L, 0L))
        var best = 0.0
        it.foreach { case (_, c1, c2) =>
          cum1 += c1; cum2 += c2
          val d = math.abs(
            cum1.toDouble / n1 - cum2.toDouble / n2)
          if (d > best) best = d
        }
        Iterator.single(best)
      }
      .reduce(math.max)
    ranged.unpersist(false)
    bc.destroy()
    Seq((stat, n1, n2)).toDF("ks_stat", "n1", "n2")
  }

  /** Population Stability Index between two slices over fixed-width
    * bins — the ML-monitoring drift score (PSI < 0.1 stable, > 0.25
    * shifted, by the usual rule of thumb):
    *
    *   PSI = Σ bins (p1 - p2) * ln(p1 / p2)
    *
    * with Laplace-smoothed bin shares pi = (ci + 0.5) / (ni + 0.5k)
    * so empty bins stay defined — deterministically, not via an
    * epsilon clamp. Bins are fixed-width over the COMBINED min/max
    * (pure-IEEE [[graft.functions.StatFunctions.histogramBin]]
    * arithmetic, identical in any engine); bins empty in BOTH slices
    * are dropped rather than smoothed (they carry no evidence of
    * drift). Two scans (bounds + binned counts), both map-side
    * combined; the PSI fold runs over k rows. */
  def psi(
      df1: DataFrame, df2: DataFrame, vCol: String,
      bins: Int = 10): DataFrame = {
    val binned = binnedCounts(df1, df2, vCol, bins)
    val n1 = sum(col("c1")).over(
      org.apache.spark.sql.expressions.Window.partitionBy())
    val n2 = sum(col("c2")).over(
      org.apache.spark.sql.expressions.Window.partitionBy())
    val p1 = (col("c1") + 0.5) / (n1 + 0.5 * bins)
    val p2 = (col("c2") + 0.5) / (n2 + 0.5 * bins)
    binned
      .select(((p1 - p2) * log(p1 / p2)).as("term"),
        col("c1"), col("c2"))
      .agg(
        round(sum(col("term")), 8).as("psi"),
        sum(col("c1")).as("n1"),
        sum(col("c2")).as("n2"))
  }

  /** Per-SEGMENT PSI: each segment's value distribution vs its
    * complement (everyone else), all segments in ONE binned pass — the
    * "which cohort is the drift coming from" screen that follows a
    * whole-table [[psi]] alarm. Same fixed-width global binning and
    * Laplace smoothing as [[psi]] (pi = (ci + 0.5)/(ni + 0.5·bins)),
    * complement counts derived by subtraction from the global bin
    * counts — no second scan per segment. The per-segment fold runs on
    * a segments × bins grid (vocabulary-sized; zero-count cells kept —
    * they carry drift evidence through the smoothing). Returns
    * (segCol, n_seg, psi 8dp) — one row per segment. */
  def segmentPsi(
      df: DataFrame, segCol: String, vCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val v = col(vCol).cast("double")
    val live = df
      .where(v.isNotNull && !v.isNaN && col(segCol).isNotNull)
      .select(col(segCol).as("__s"), v.as("__v"))
      .localCheckpoint(false)
    val mm = live.agg(min(col("__v")).as("mn"), max(col("__v")).as("mx"))
      .head()
    require(!mm.isNullAt(0), s"no live ($segCol, $vCol) rows")
    val (mn, mx) = (mm.getDouble(0), mm.getDouble(1))
    val bin = graft.functions.StatFunctions
      .histogramBin(col("__v"), mn, mx, bins)
    val counts = live.groupBy(col("__s"), bin.as("bin"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val binTot = counts.groupBy("bin").agg(sum(col("c")).as("ct"))
    val segTot = counts.groupBy("__s").agg(sum(col("c")).as("ns"))
    val grand = counts.agg(sum(col("c")).as("n"))
    val grid = segTot.crossJoin(binTot)
      .join(counts, Seq("__s", "bin"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .crossJoin(broadcast(grand))
    val p1 = (col("c") + lit(0.5)) / (col("ns") + lit(0.5 * bins))
    val p2 = (col("ct") - col("c") + lit(0.5)) /
      (col("n") - col("ns") + lit(0.5 * bins))
    grid
      .groupBy(col("__s"))
      .agg(max(col("ns")).as("n_seg"), max(col("n")).as("__n"),
        round(sum((p1 - p2) * log(p1 / p2)), 8).as("__psi"))
      // a segment that IS the whole table has an empty complement —
      // its "drift" would be pure smoothing artifact; report null
      .select(col("__s").as(segCol), col("n_seg"),
        when(col("n_seg") < col("__n"), col("__psi")).as("psi"))
  }

  /** Sequential (period-over-period) PSI: each period's value
    * distribution scored against the PREVIOUS period — the drift
    * SERIES a monitoring pipeline charts, where [[psi]] is one point
    * and [[segmentPsi]] is the cross-sectional cut. Global fixed-width
    * bins (one min/max pass), per-(period, bin) counts densified over
    * the full grid, the same Laplace smoothing as [[psi]], and one
    * lag window per bin column over the bounded periods × bins table
    * — no per-period rescan, scale-safe at any period count. Periods
    * compare to the previous period PRESENT IN THE DATA (an empty
    * period does not produce a zero-vs-zero row). Returns
    * (period, prev_period, n, psi 8dp) for every period with a
    * predecessor, ordered by period. */
  def sequentialPsi(
      df: DataFrame, periodCol: String, vCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val v = col(vCol).cast("double")
    val live = df
      .where(v.isNotNull && !v.isNaN && col(periodCol).isNotNull)
      .select(col(periodCol).cast("long").as("__p"), v.as("__v"))
      .localCheckpoint(false)
    val mm = live.agg(min(col("__v")).as("mn"), max(col("__v")).as("mx"))
      .head()
    require(!mm.isNullAt(0), s"no live ($periodCol, $vCol) rows")
    val bin = graft.functions.StatFunctions
      .histogramBin(col("__v"), mm.getDouble(0), mm.getDouble(1), bins)
    val counts = live.groupBy(col("__p"), bin.as("bin"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // grid + totals reuse, bounded table
    val axis = counts.sparkSession.range(bins)
      .select(col("id").cast("int").as("bin"))
    val grid = counts.select("__p").distinct().crossJoin(axis)
      .join(counts, Seq("__p", "bin"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .join(counts.groupBy("__p").agg(sum(col("c")).as("n")), "__p")
    val wb = Window.partitionBy("bin").orderBy("__p")
    val p = (col("c") + lit(0.5)) / (col("n") + lit(0.5 * bins))
    val scored = grid
      .withColumn("p", p)
      .withColumn("pp", lag(col("p"), 1).over(wb))
      .withColumn("prev", lag(col("__p"), 1).over(wb))
      .where(col("pp").isNotNull)
    scored
      .groupBy(col("__p").as("period"), col("prev").as("prev_period"))
      .agg(max(col("n")).as("n"),
        round(sum((col("p") - col("pp")) *
          log(col("p") / col("pp"))), 8).as("psi"))
      .orderBy("period")
  }

  /** Jensen-Shannon divergence between two slices over the same
    * fixed-width binning as [[psi]] — the bounded, symmetric drift
    * score (0 ≤ JSD ≤ ln 2 in nats):
    *
    *   JSD = ½ KL(p1 ‖ m) + ½ KL(p2 ‖ m),   m = (p1 + p2) / 2
    *
    * No smoothing is needed: a bin empty on one side contributes a
    * well-defined `½ p·ln 2` from the other (the zero-count term is 0
    * by the xlogx convention, guarded explicitly so no ln(0) is ever
    * evaluated). Same two map-side-combined scans as PSI; the fold
    * runs over ≤ bins rows. */
  def jsd(
      df1: DataFrame, df2: DataFrame, vCol: String,
      bins: Int = 10): DataFrame = {
    val binned = binnedCounts(df1, df2, vCol, bins)
    val n1 = sum(col("c1")).over(
      org.apache.spark.sql.expressions.Window.partitionBy())
    val n2 = sum(col("c2")).over(
      org.apache.spark.sql.expressions.Window.partitionBy())
    val p1 = col("c1") / n1
    val p2 = col("c2") / n2
    val m = (p1 + p2) / 2
    val term =
      when(col("c1") > 0, p1 * log(p1 / m) / 2).otherwise(0.0) +
        when(col("c2") > 0, p2 * log(p2 / m) / 2).otherwise(0.0)
    binned
      .select(term.as("term"), col("c1"), col("c2"))
      .agg(
        round(sum(col("term")), 8).as("jsd"),
        sum(col("c1")).as("n1"),
        sum(col("c2")).as("n2"))
  }

  /** Exact 1-Wasserstein (earth-mover) distance between two slices —
    * the drift score that weighs HOW FAR mass moved, not just whether
    * it did (KS is sup-norm; W1 is the integral):
    *
    *   W1 = ∫ |F1(v) − F2(v)| dv
    *      = Σ over adjacent distinct values |F1(vᵢ) − F2(vᵢ)|·(vᵢ₊₁ − vᵢ)
    *
    * Same one-pass value-count + range-partitioned prefix-sum shape as
    * [[ksTwoSample]] — no global window. The only new mechanics: each
    * summand needs the NEXT distinct value, and a partition's last row
    * pairs with the next partition's first, so the per-partition FIRST
    * values (bounded by the partition count, like the prefix
    * subtotals) ride to the driver and broadcast back as boundary
    * hand-offs. Counts are integers and each summand is the same IEEE
    * expression in any engine; only the final sum's order varies →
    * rounded to 6 decimals (absolute W1 scales with the value range —
    * callers on wide ranges should prefer `w1 / (max − min)`, emitted
    * as `w1_norm` rounded to 8). */
  def wasserstein(
      df1: DataFrame, df2: DataFrame, vCol: String): DataFrame = {
    val spark = df1.sparkSession
    import spark.implicits._
    val counts = sideValueCounts(df1, df2, vCol)
    val p = spark.sessionState.conf.numShufflePartitions
    val ranged: Dataset[(Double, Long, Long)] = counts
      .repartitionByRange(p, col("v"))
      .sortWithinPartitions("v")
      .as[(Double, Long, Long)]
      .persist(StorageLevel.MEMORY_AND_DISK)

    // per-partition (subtotals, first+last value) -> driver (bounded
    // by p); firsts seed the boundary hand-offs, first/last of the
    // non-empty extremes are the global min/max (partitions are
    // range-ordered and sorted) — no separate bounds scan
    val subs: Array[(Int, Long, Long, Option[Double], Option[Double])] =
      ranged
        .mapPartitions { it =>
          val pid = TaskContext.getPartitionId()
          var s1 = 0L; var s2 = 0L
          var first: Option[Double] = None; var last: Option[Double] = None
          it.foreach { case (v, c1, c2) =>
            if (first.isEmpty) first = Some(v)
            last = Some(v)
            s1 += c1; s2 += c2
          }
          Iterator.single((pid, s1, s2, first, last))
        }
        .collect()
    val n1 = subs.map(_._2).sum
    val n2 = subs.map(_._3).sum
    require(n1 > 0 && n2 > 0, s"both slices need rows, got $n1/$n2")
    val offsets: Map[Int, (Long, Long)] = {
      var c1 = 0L; var c2 = 0L
      subs.sortBy(_._1).map { case (pid, s1, s2, _, _) =>
        val e = pid -> ((c1, c2)); c1 += s1; c2 += s2; e
      }.toMap
    }
    // next non-empty partition's first value, per partition
    val byPid = subs.sortBy(_._1)
    val nextFirst: Map[Int, Double] = byPid.map { case (pid, _, _, _, _) =>
      pid -> byPid.collectFirst {
        case (p2, _, _, Some(f), _) if p2 > pid => f
      }
    }.collect { case (pid, Some(f)) => pid -> f }.toMap
    val mn = byPid.flatMap(_._4).head
    val mx = byPid.flatMap(_._5).last
    val bc = spark.sparkContext.broadcast((offsets, nextFirst))

    val w1 = ranged
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var (cum1, cum2) = bc.value._1.getOrElse(pid, (0L, 0L))
        var acc = 0.0
        var pendingF = 0.0 // |F1-F2| waiting for the next value's gap
        var pendingV = 0.0
        var havePending = false
        it.foreach { case (v, c1, c2) =>
          if (havePending) acc += pendingF * (v - pendingV)
          cum1 += c1; cum2 += c2
          pendingF = math.abs(cum1.toDouble / n1 - cum2.toDouble / n2)
          pendingV = v; havePending = true
        }
        // close the gap to the next partition's first value
        if (havePending) bc.value._2.get(pid).foreach { nf =>
          acc += pendingF * (nf - pendingV)
        }
        Iterator.single(acc)
      }
      .reduce(_ + _)
    ranged.unpersist(false)
    bc.destroy()
    val norm = if (mx > mn) w1 / (mx - mn) else 0.0
    Seq((BigDecimal(w1).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble,
      BigDecimal(norm).setScale(8, BigDecimal.RoundingMode.HALF_UP)
        .toDouble,
      n1, n2)).toDF("w1", "w1_norm", "n1", "n2")
  }

  /** Two-sample chi-square homogeneity over a CATEGORICAL column —
    * the drift screen for discrete features (KS/PSI/JSD cover numeric).
    * Contingency from one side-tagged union groupBy (map-side
    * combined); expected counts e_ij = n_i·(c1+c2)/N; the statistic
    *
    *   χ² = Σ cells (c_ij − e_ij)² / e_ij,   dof = k − 1
    *
    * folds over ≤ k vocabulary rows. Null is kept as its own level
    * (missingness shifting between slices IS drift). Levels empty in
    * one slice contribute their full expected mass — no smoothing, the
    * classical statistic. */
  def chiSquareHomogeneity(
      df1: DataFrame, df2: DataFrame, cCol: String): DataFrame = {
    def side(df: DataFrame, one: Int) =
      df.select(col(cCol).as("v"), lit(one).as("s"))
    // vocabulary-bounded, materialized once: the empty-slice guard and
    // the statistic both read it without recomputing the input scan
    val counts = side(df1, 0).unionByName(side(df2, 1))
      .groupBy("v")
      .agg(
        count(when(col("s") === 0, 1)).as("c1"),
        count(when(col("s") === 1, 1)).as("c2"))
      .localCheckpoint()
    val totals = counts.agg(sum(col("c1")), sum(col("c2"))).head()
    require(!totals.isNullAt(0) && totals.getLong(0) > 0 &&
      totals.getLong(1) > 0,
      "both slices need rows — an empty side makes every expected " +
        s"count 0 and the statistic NaN (got ${totals.get(0)}/" +
        s"${totals.get(1)})")
    val n1 = sum(col("c1")).over(
      org.apache.spark.sql.expressions.Window.partitionBy())
    val n2 = sum(col("c2")).over(
      org.apache.spark.sql.expressions.Window.partitionBy())
    // double from the first multiply: long·long would overflow ANSI
    // once slice sizes pass ~3e9 rows
    val tot = col("c1") + col("c2")
    val e1 = n1.cast("double") * tot / (n1 + n2)
    val e2 = n2.cast("double") * tot / (n1 + n2)
    val term =
      (col("c1") - e1) * (col("c1") - e1) / e1 +
        (col("c2") - e2) * (col("c2") - e2) / e2
    counts
      .select(term.as("term"), col("c1"), col("c2"))
      .agg(
        round(sum(col("term")), 8).as("chi2"),
        (count(lit(1)) - 1).as("dof"),
        sum(col("c1")).as("n1"),
        sum(col("c2")).as("n2"))
  }

  /** Q–Q comparison table — the data behind a quantile-quantile plot:
    * for each requested percentile, both slices' exact quantiles side
    * by side plus the gap. Two fused percentile aggregates (one
    * array-probabilities buffer per slice — never one sort per
    * percentile), melted to one row per p with `stack` on the one-row
    * result. Quantiles round to 6dp (the q05-proven cross-engine
    * envelope); the gap derives from the ROUNDED quantiles so it is
    * bit-stable too. */
  def qqTable(
      df1: DataFrame, df2: DataFrame, vCol: String,
      percentiles: Seq[Double] = Seq(0.01, 0.05, 0.1, 0.25, 0.5,
        0.75, 0.9, 0.95, 0.99)): DataFrame = {
    require(percentiles.nonEmpty, "need at least one percentile")
    require(percentiles.forall(p => p >= 0 && p <= 1),
      "percentiles must be in [0,1]")
    require(!vCol.contains("`") && !vCol.contains("'"),
      "column name must not contain backticks or quotes")
    val probs = percentiles.mkString(",")
    def side(df: DataFrame) = df
      .agg(expr(
        s"percentile(CASE WHEN NOT isnan(CAST(`$vCol` AS DOUBLE)) " +
          s"THEN CAST(`$vCol` AS DOUBLE) END, array($probs))").as("qs"))
    val joined = side(df1).crossJoin(
      side(df2).withColumnRenamed("qs", "qs2"))
    val stackArgs = percentiles.zipWithIndex.map { case (p, i) =>
      s"CAST('$p' AS DOUBLE), round(qs[$i], 6), round(qs2[$i], 6)"
    }.mkString(", ")
    joined
      .select(expr(s"stack(${percentiles.size}, $stackArgs) " +
        "AS (p, q1, q2)"))
      .select(col("p"), col("q1"), col("q2"),
        round(col("q2") - col("q1"), 6).as("gap"))
      .orderBy("p")
  }

  /** Multi-column PSI drift report — every numeric column's [[psi]]
    * in ONE melted pass per side instead of 2 scans per column: the
    * whole-table drift screen a monitoring job runs per batch.
    *
    *   1. one fused aggregate over the side-tagged union → per-column
    *      combined min/max (+ per-side row counts for the guards);
    *   2. one melt (explode of a column-name/value struct array) →
    *      chained per-column fixed-width binning → ONE groupBy
    *      (col_name, bin), map-side combined;
    *   3. the PSI fold runs over ≤ cols·bins rows, per-column totals
    *      from a window PARTITIONed by col_name (vocabulary-bounded).
    *
    * Same Laplace smoothing and pure-IEEE bin arithmetic as [[psi]] —
    * for any single column the sweep's score equals psi()'s. Columns
    * with no live values (all null/NaN in both slices) are reported
    * with null psi rather than dropped. */
  def psiSweep(
      df1: DataFrame, df2: DataFrame, cols: Seq[String],
      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(cols.nonEmpty, "need at least one column")
    // collision-proof side tag: a swept column named "s" must not
    // shadow it (same posture as Skew.freshName)
    val sTag = Iterator.iterate("__s")("_" + _)
      .dropWhile(cols.contains).next()
    def side(df: DataFrame, one: Int) = df.select(
      (cols.map(c => col(c).cast("double").as(c)) :+
        lit(one).as(sTag)): _*)
    val both = side(df1, 0).unionByName(side(df2, 1))

    val boundAggs = cols.flatMap { c =>
      val live = when(!isnan(col(c)), col(c)) // null for NaN, min/max skip
      Seq(min(live).as(s"mn_$c"), max(live).as(s"mx_$c"))
    } ++ Seq(
      count(when(col(sTag) === 0, 1)).as("n1_rows"),
      count(when(col(sTag) === 1, 1)).as("n2_rows"))
    val b = both.agg(boundAggs.head, boundAggs.tail: _*).head()
    require(b.getLong(2 * cols.size) > 0 && b.getLong(2 * cols.size + 1) > 0,
      "both slices need rows")
    val bounds: Map[String, (Double, Double)] = cols.zipWithIndex.map {
      case (c, i) =>
        c -> (if (b.isNullAt(2 * i)) (0.0, 0.0)
              else (b.getDouble(2 * i), b.getDouble(2 * i + 1)))
    }.toMap

    val melted = both.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).as("v"))): _*)).as("e"),
        col(sTag))
      .select(col("e.col_name").as("col_name"), col("e.v").as("v"),
        col(sTag))
      .where(col("v").isNotNull && !col("v").isNaN)
    val binExpr = cols.tail.foldLeft(
      when(col("col_name") === cols.head,
        graft.functions.StatFunctions.histogramBin(col("v"),
          bounds(cols.head)._1, bounds(cols.head)._2, bins))) { (acc, c) =>
      acc.when(col("col_name") === c,
        graft.functions.StatFunctions.histogramBin(col("v"),
          bounds(c)._1, bounds(c)._2, bins))
    }
    val binned = melted
      .select(col("col_name"), binExpr.as("bin"), col(sTag))
      .groupBy("col_name", "bin")
      .agg(
        count(when(col(sTag) === 0, 1)).as("c1"),
        count(when(col(sTag) === 1, 1)).as("c2"))

    val byCol = org.apache.spark.sql.expressions.Window
      .partitionBy("col_name")
    val n1 = sum(col("c1")).over(byCol)
    val n2 = sum(col("c2")).over(byCol)
    val p1 = (col("c1") + 0.5) / (n1 + 0.5 * bins)
    val p2 = (col("c2") + 0.5) / (n2 + 0.5 * bins)
    // a column empty on ONE side would score against the implicit
    // smoothed-uniform — the exact garbage psi()'s guard rejects —
    // so its psi is null (the counts still name the empty side)
    val scored = binned
      .select(col("col_name"),
        ((p1 - p2) * log(p1 / p2)).as("term"), col("c1"), col("c2"))
      .groupBy("col_name")
      .agg(
        round(when(sum(col("c1")) > 0 && sum(col("c2")) > 0,
          sum(col("term"))), 8).as("psi"),
        sum(col("c1")).as("n1"),
        sum(col("c2")).as("n2"))
    // columns with zero live rows in BOTH slices never reach the melt
    // (known from the bounds row — no extra action): emit null psi
    val missing = cols.zipWithIndex
      .filter { case (_, i) => b.isNullAt(2 * i) }.map(_._1)
    val out =
      if (missing.isEmpty) scored
      else {
        val spark = df1.sparkSession
        import spark.implicits._
        scored.unionByName(missing.toDF("col_name")
          .select(col("col_name"), lit(null).cast("double").as("psi"),
            lit(0L).as("n1"), lit(0L).as("n2")))
      }
    out.orderBy("col_name")
  }

  /** Shared PSI/JSD prep: side-tagged union → combined min/max →
    * fixed-width bin counts per side (one groupBy, map-side combined).
    * Only bins PRESENT in at least one slice come back. */
  private def binnedCounts(
      df1: DataFrame, df2: DataFrame, vCol: String,
      bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    def side(df: DataFrame, one: Int) = df
      .select(col(vCol).cast("double").as("v"))
      .where(col("v").isNotNull && !col("v").isNaN)
      .select(col("v"), lit(one).as("s"))
    val both = side(df1, 0).unionByName(side(df2, 1))
    val b = both.agg(min(col("v")), max(col("v")),
      count(when(col("s") === 0, 1)), count(when(col("s") === 1, 1)))
      .head()
    require(!b.isNullAt(0), "both slices are empty")
    // an empty side would otherwise score the other against an
    // implicit uniform (PSI) or emit a null row (JSD) — fail loudly,
    // matching ksTwoSample/wasserstein
    require(b.getLong(2) > 0 && b.getLong(3) > 0,
      s"both slices need rows, got ${b.getLong(2)}/${b.getLong(3)}")
    val (mn, mx) = (b.getDouble(0), b.getDouble(1))
    both
      .select(
        graft.functions.StatFunctions.histogramBin(col("v"), mn, mx, bins)
          .as("bin"),
        col("s"))
      .groupBy("bin")
      .agg(
        count(when(col("s") === 0, 1)).as("c1"),
        count(when(col("s") === 1, 1)).as("c2"))
  }
}
