package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised feature-engineering statistics: Weight-of-Evidence /
  * Information-Value bin scoring and smoothed target encoding — the
  * label-aware transforms a tabular-ML pipeline derives from the same
  * corpus scans as the profile. The reference (a label-free profiler)
  * has none of this; it extends the pipeline surface like the drift
  * family does for monitoring.
  *
  * Scale design: both ops are ONE fused map-side-combined aggregation
  * over the input (plus a one-row min/max pre-pass for the WOE binning)
  * — counts only on the wire, every ratio/log a per-row expression on
  * exact integers afterward, so results are engine-bit-stable and the
  * plans are unchanged at 1000 executors.
  */
object FeatureEng {

  /** Weight-of-Evidence table of a numeric feature against a boolean
    * target over `bins` fixed-width bins (credit-scoring classic;
    * Siddiqi, "Credit Risk Scorecards", 2006):
    *
    *   WOE_b = ln( (pos_b + s)/(pos + B·s) ÷ (neg_b + s)/(neg + B·s) )
    *   IV    = Σ_b (p_pos_b − p_neg_b) · WOE_b   (smoothed shares)
    *
    * with Laplace `smooth` s keeping empty cells finite. Null/NaN
    * feature rows and null targets are excluded. Returns one row per
    * bin — EMPTY bins included, with their nonzero smoothed terms, so
    * `sum(iv_term)` equals the formula's full-sum IV —
    * (bin, n_pos, n_neg, woe, iv_term), 6dp-rounded. */
  def woeTable(
      df: DataFrame, vCol: String, target: Column,
      bins: Int = 10, smooth: Double = 0.5): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    require(smooth > 0, "smooth must be > 0 (zero cells diverge)")
    val v = col(vCol).cast("double")
    val live = df.where(v.isNotNull && !v.isNaN && target.isNotNull)
      .select(v.as("__v"), target.cast("boolean").as("__t"))
      .localCheckpoint(false)
    val mm = live.agg(min(col("__v")).as("mn"), max(col("__v")).as("mx"))
      .head()
    require(!mm.isNullAt(0), s"no live (value, target) rows in `$vCol`")
    val (mn, mx) = (mm.getDouble(0), mm.getDouble(1))
    val bin = graft.functions.StatFunctions
      .histogramBin(col("__v"), mn, mx, bins)
    val occupied = live.groupBy(bin.as("bin")).agg(
      count(when(col("__t"), 1)).as("n_pos"),
      count(when(!col("__t"), 1)).as("n_neg"))
    // densify: EMPTY bins still carry nonzero smoothed shares — the
    // header formula sums over all B bins, so sum(iv_term) must too
    val counts = live.sparkSession.range(bins.toLong)
      .select(col("id").cast("int").as("bin"))
      .join(occupied, Seq("bin"), "left")
      .na.fill(0L, Seq("n_pos", "n_neg"))
    val totals = counts.agg(sum(col("n_pos")).as("tp"),
      sum(col("n_neg")).as("tn"))
    val pPos = (col("n_pos") + lit(smooth)) /
      (col("tp") + lit(bins * smooth))
    val pNeg = (col("n_neg") + lit(smooth)) /
      (col("tn") + lit(bins * smooth))
    counts.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_pos"), col("n_neg"),
        round(log(pPos / pNeg), 6).as("woe"),
        round((pPos - pNeg) * log(pPos / pNeg), 6).as("iv_term"))
      .orderBy("bin")
  }

  /** Smoothed target encoding of a categorical feature (the empirical-
    * Bayes shrinkage form, Micci-Barreca, SIGKDD Expl. 2001):
    *
    *   enc_c = (pos_c + m·prior) / (n_c + m),  prior = pos/n
    *
    * — each category's target rate shrunk toward the global prior with
    * pseudo-count weight `m`, so rare categories don't memorize their
    * few labels. Null categories form their own level (they exist at
    * serving time too); null targets are excluded. Returns
    * (cCol, n, n_pos, enc), 6dp-rounded. */
  def targetEncode(
      df: DataFrame, cCol: String, target: Column,
      m: Double = 10.0): DataFrame = {
    require(m >= 0, "m must be >= 0")
    val live = df.where(target.isNotNull)
      .select(col(cCol).as("__c"), target.cast("boolean").as("__t"))
    val counts = live.groupBy(col("__c")).agg(
      count(lit(1)).as("n"),
      count(when(col("__t"), 1)).as("n_pos"))
    val totals = counts.agg(sum(col("n")).as("tot"),
      sum(col("n_pos")).as("totPos"))
    counts.crossJoin(broadcast(totals))
      .select(col("__c").as(cCol), col("n"), col("n_pos"),
        round((col("n_pos") +
            lit(m) * (col("totPos") / col("tot").cast("double"))) /
          (col("n") + lit(m)), 6).as("enc"))
  }

  /** Calibration / reliability table: equal-WIDTH score bins vs the
    * observed positive rate — "does a score of 0.8 mean 80%?". Same
    * shape as [[woeTable]]: one min/max pre-pass, one fused
    * map-side-combined count aggregation, ALL bins emitted (empty
    * ones with n = 0 and a null rate) so the table is a fixed-k
    * artifact a dashboard can diff across runs. Counts only — no
    * float accumulation anywhere, so the result is engine- and
    * partition-order-exact. Returns (bin, n, n_pos, pos_rate)
    * ordered by bin, rate 6dp. */
  def calibrationTable(
      df: DataFrame, scoreCol: String, target: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    val v = col(scoreCol).cast("double")
    val live = df
      .where(v.isNotNull && !v.isNaN && target.isNotNull)
      .select(v.as("__v"), target.as("__t"))
    val mm = live.agg(min(col("__v")), max(col("__v"))).head()
    require(!mm.isNullAt(0), s"no live (score, target) rows in `$scoreCol`")
    val bin = graft.functions.StatFunctions
      .histogramBin(col("__v"), mm.getDouble(0), mm.getDouble(1), bins)
    val occupied = live.groupBy(bin.as("bin")).agg(
      count(lit(1)).as("n"), count(when(col("__t"), 1)).as("n_pos"))
    live.sparkSession.range(bins.toLong)
      .select(col("id").cast("int").as("bin"))
      .join(occupied, Seq("bin"), "left")
      .na.fill(0L, Seq("n", "n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        when(col("n") > 0,
          round(col("n_pos").cast("double") / col("n"), 6)).as("pos_rate"))
      .orderBy("bin")
  }

  /** Cumulative gains / lift by descending score decile: bucket 1 is
    * the top 1/k of scores, lift is that prefix's positive rate over
    * the base rate — the targeting-efficiency curve. Buckets come
    * from exact score percentiles (6dp-rounded thresholds, so both
    * engines cut at bit-identical boundaries; ties share a bucket and
    * a bucket can be empty under heavy ties — documented, exact).
    * One percentile pre-pass + one fused count aggregation + a
    * cumulative window over the k-row bucket table. Returns (bucket,
    * n, n_pos, cum_n, cum_pos, cum_rate, lift) ordered by bucket,
    * rates 6dp. */
  def liftTable(
      df: DataFrame, scoreCol: String, target: Column,
      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, "k must be >= 2")
    val v = col(scoreCol).cast("double")
    val live = df
      .where(v.isNotNull && !v.isNaN && target.isNotNull)
      .select(v.as("__v"), target.as("__t"))
    // descending cut points: bucket b = scores in (q_{1-b/k}, q_{1-(b-1)/k}]
    val probs = (1 until k).map(i => 1.0 - i.toDouble / k)
    val qRow = live.agg(expr(
      s"percentile(__v, array(${probs.mkString(",")}))").as("q")).head()
    require(!qRow.isNullAt(0), s"no live (score, target) rows in `$scoreCol`")
    val cuts = qRow.getSeq[Double](0).map(x =>
      new java.math.BigDecimal(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
    // outermost test must be the HIGHEST cut: v above several cuts
    // belongs to the smallest bucket index (top decile)
    val bucket = cuts.zipWithIndex.foldRight(lit(k)) {
      case ((c, i), acc) => when(col("__v") > lit(c), lit(i + 1)).otherwise(acc)
    }
    val perBucket = live.groupBy(bucket.as("bucket")).agg(
      count(lit(1)).as("n"), count(when(col("__t"), 1)).as("n_pos"))
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    live.sparkSession.range(1, k + 1L)
      .select(col("id").cast("int").as("bucket"))
      .join(perBucket, Seq("bucket"), "left")
      .na.fill(0L, Seq("n", "n_pos"))
      .withColumn("cum_n", sum(col("n")).over(wCum))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .withColumn("__tot_n", max(col("cum_n")).over(Window.orderBy(lit(1))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__tot_pos", max(col("cum_pos"))
        .over(Window.orderBy(lit(1))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("bucket"), col("n"), col("n_pos"), col("cum_n"),
        col("cum_pos"),
        when(col("cum_n") > 0, round(
          col("cum_pos").cast("double") / col("cum_n"), 6)).as("cum_rate"),
        when(col("cum_n") > 0 && col("__tot_pos") > 0, round(
          (col("cum_pos").cast("double") / col("cum_n")) /
            (col("__tot_pos").cast("double") / col("__tot_n")), 6))
          .as("lift"))
      .orderBy("bucket")
  }

  /** Hashing-trick text vectorization (Weinberger et al., "Feature
    * Hashing for Large Scale Multitask Learning", ICML 2009 — public
    * algorithm): each token maps to index md5₄₈(w) mod `dim` with a
    * ±1 sign from the next md5 hex digit's parity, and a document's
    * feature value is the signed token-count sum — collisions cancel
    * in expectation instead of biasing upward. The whole transform is
    * explode → groupBy, map-side combined, with a deterministic
    * md5-derived hash family (no RNG, engine-reproducible: DuckDB
    * computes the identical indices from the same hex). Zero-valued
    * features (exact sign cancellations) are kept, so the output is
    * the true sparse vector. */
  def hashingTrickFeatures(
      df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim >= 2, "dim must be >= 2")
    val w = df.select(col(idCol).as("id"),
        explode(TextAnalysis.words(col(textCol))).as("w"))
      .withColumn("__h", md5(col("w").cast("binary")))
      .withColumn("feat_idx",
        expr(s"cast(conv(substring(__h, 1, 12), 16, 10) as bigint) % $dim"))
      .withColumn("__sign",
        when(expr("cast(conv(substring(__h, 13, 1), 16, 10) as int)") % 2
          === 0, 1L).otherwise(-1L))
    w.groupBy(col("id").as(idCol), col("feat_idx"))
      .agg(sum(col("__sign")).as("weight"),
        count(lit(1)).as("n_tokens"))
  }

  /** Exact depth-1 decision-tree (stump) training by Gini gain — the
    * first split CART would make, and the unit every boosted-tree
    * trainer repeats: histogram the feature into `bins` equal-width
    * buckets (the histogram-split strategy of LightGBM/XGBoost's hist
    * mode), scan the bounded bucket grid for the split with maximal
    * impurity reduction. All split statistics are INTEGER (bucket
    * positive/total counts via cumulative sums over the `bins`-row
    * grid — a bounded window, never over rows), so the chosen split
    * is engine-exact; the Gini values are one agreed double formula
    * over those integers, 6 dp. ONE pass over the data (the bucket
    * groupBy) + grid arithmetic. Ties break to the smallest bucket.
    * Returns one row: (split_bucket, threshold, n_left, pos_left,
    * n_right, pos_right, gini_parent, gain). */
  def decisionStump(df: DataFrame, xCol: String, yCol: Column,
      bins: Int = 64): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val x = col(xCol).cast("double")
    val in = df.where(x.isNotNull && !isnan(x))
      .select(x.as("x"), yCol.cast("int").as("y"))
    val bounds = in.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val cells = bins.toDouble
    val counts = in.crossJoin(broadcast(bounds))
      .select(
        least(floor((col("x") - col("mn")) /
          ((col("mx") - col("mn")) / lit(cells))), lit(cells - 1))
          .cast("long").as("b"),
        col("y"), col("mn"), col("mx"))
      .groupBy("b", "mn", "mx")
      .agg(count(lit(1)).as("nb"), sum(col("y")).cast("long").as("pb"))
      // the bounded grid feeds both the cumulative scan and the totals
      // agg - materialize once or the corpus is scanned twice
      .localCheckpoint(false)
    val wCum = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, 0)
    val grid = counts
      .withColumn("nl", sum(col("nb")).over(wCum))
      .withColumn("pl", sum(col("pb")).over(wCum))
      .crossJoin(broadcast(counts.agg(
        sum(col("nb")).as("n"), sum(col("pb")).as("p"))))
      .where(col("b") < bins - 1 && col("nl") > 0 &&
        (col("n") - col("nl")) > 0)
    def gini(pos: org.apache.spark.sql.Column,
        tot: org.apache.spark.sql.Column) = {
      val r = pos.cast("double") / tot
      lit(1.0) - r * r - (lit(1.0) - r) * (lit(1.0) - r)
    }
    val gParent = gini(col("p"), col("n"))
    val gain = gParent -
      (col("nl").cast("double") / col("n")) * gini(col("pl"), col("nl")) -
      ((col("n") - col("nl")).cast("double") / col("n")) *
        gini(col("p") - col("pl"), col("n") - col("nl"))
    grid
      .select(col("b").cast("int").as("split_bucket"),
        round(col("mn") + (col("b") + 1).cast("double") *
          ((col("mx") - col("mn")) / lit(cells)), 6).as("threshold"),
        col("nl").as("n_left"), col("pl").as("pos_left"),
        (col("n") - col("nl")).as("n_right"),
        (col("p") - col("pl")).as("pos_right"),
        round(gParent, 6).as("gini_parent"),
        floor(gain * lit(1e6) + lit(0.5)).cast("long").as("gain_q"))
      .orderBy(col("gain_q").desc, col("split_bucket"))
      .limit(1)
      .select(col("split_bucket"), col("threshold"), col("n_left"),
        col("pos_left"), col("n_right"), col("pos_right"),
        col("gini_parent"),
        (col("gain_q").cast("double") / lit(1e6)).as("gain"))
  }

  /** Split-conformal prediction calibration (Vovk et al.; the
    * distribution-free marginal-coverage recipe of Lei et al. JASA
    * 2018): deterministic hash split into train / calibration / test,
    * a per-group mean model fit on train, the (1−α) conformal quantile
    * q̂ = the ⌈(1−α)(n_cal+1)⌉-th smallest absolute calibration
    * residual, and the achieved test coverage of ŷ ± q̂ per group —
    * the finite-sample guarantee check run before shipping any
    * prediction interval.
    *
    * Exactness: the model means are single divisions of exact integer
    * sums; residuals are one subtraction each; q̂ is an ORDER
    * STATISTIC (TakeOrdered of the k smallest, max of those — no
    * interpolation, so any engine agrees bit-for-bit). The only
    * driver-side value is n_cal (one count), needed because the k of
    * "k smallest" must be a plan literal; k clamps to n_cal when
    * ⌈(1−α)(n+1)⌉ exceeds it (the vacuous-interval regime). Groups
    * absent from the train split carry no model and are excluded from
    * calibration and test.
    *
    * Returns per group: (group, n_test, n_covered, coverage 6dp,
    * q_hat 6dp, n_cal) — q̂/n_cal are the global calibration facts
    * repeated per row. */
  def splitConformal(df: DataFrame, keyCol: String, groupCol: String,
      valueCol: String, alpha: Double = 0.1,
      trainPct: Int = 60, calPct: Int = 20): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    require(trainPct > 0 && calPct > 0 && trainPct + calPct < 100,
      s"need positive train/cal and a nonempty test split: " +
        s"$trainPct/$calPct")
    val b = pmod(graft.functions.StatFunctions
      .hash64(col(keyCol).cast("string"), 0), lit(100))
    val base = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("long").as("y"),
        when(b < trainPct, "train")
          .when(b < trainPct + calPct, "cal").otherwise("test").as("split"))
    val model = base.where(col("split") === "train")
      .groupBy("g")
      .agg((sum(col("y")).cast("double") / count(lit(1))).as("yhat"))
    val resid = base.where(col("split") =!= "train")
      .join(model, Seq("g"))
      .select(col("g"), col("split"),
        abs(col("y").cast("double") - col("yhat")).as("r"))
    val cal = resid.where(col("split") === "cal")
    val nCal = cal.count() // driver: one Long — k must be a plan literal
    val k = math.min(math.ceil((1 - alpha) * (nCal + 1)).toLong, nCal).toInt
    val qhat = cal.orderBy(col("r")).limit(math.max(k, 1))
      .agg(max(col("r")).as("q_hat"))
    resid.where(col("split") === "test")
      .crossJoin(broadcast(qhat))
      .groupBy("g")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("r") <= col("q_hat"), 1L).otherwise(0L))
          .as("n_covered"),
        first(col("q_hat")).as("qh"))
      .select(col("g").as(groupCol), col("n_test"), col("n_covered"),
        round(col("n_covered").cast("double") / col("n_test"), 6)
          .as("coverage"),
        round(col("qh"), 6).as("q_hat"), lit(nCal).as("n_cal"))
  }
}
