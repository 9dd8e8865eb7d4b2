package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LABEL and SCORE quality control — the QC pass a training-data
  * pipeline runs over its classifier outputs and human annotations
  * before trusting either:
  *
  *  - [[calibrationBins]] / [[calibrationSummary]]: is the quality
  *    classifier's score a PROBABILITY? (reliability diagram bins;
  *    expected/maximum calibration error, Naeini et al. AAAI 2015;
  *    Brier 1950 score). A filter thresholding an uncalibrated score
  *    throws away different mass than it thinks.
  *  - [[cohenKappa]]: two-rater chance-corrected agreement (Cohen,
  *    1960) — the instruction/preference-data QC number; raw percent
  *    agreement flatters imbalanced label sets.
  *  - [[fleissKappa]]: the n-rater generalization (Fleiss, 1971)
  *    for panel-labeled data, fixed raters-per-item.
  *
  * All four are one or two aggregates with closed-form arithmetic —
  * fixed-decimal rounded so any engine replays them. Reference
  * analog: none (the reference profiles unlabeled frames); this is
  * the labeled-data half a curation pipeline adds. Gates q430–q433.
  */
object LabelQc {

  /** Reliability-diagram bins over (score ∈ [0,1], binary label):
    * equal-width bins on the score, each with its size, mean
    * confidence, empirical accuracy, and signed gap. Scores exactly
    * 1.0 land in the top bin. One map-side-combined aggregate. */
  def calibrationBins(df: DataFrame, scoreCol: String,
      labelCol: String, bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2,1000]: $bins")
    df.select(col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("double").as("y"))
      .where(col("s").isNotNull && col("y").isNotNull &&
        col("s") >= 0 && col("s") <= 1)
      .withColumn("bin",
        least(floor(col("s") * bins), lit(bins - 1)).cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(avg(col("s")), 8).as("confidence"),
        round(avg(col("y")), 8).as("accuracy"))
      .withColumn("gap",
        round(col("accuracy") - col("confidence"), 8))
  }

  /** One-row calibration summary: ECE (bin-weighted |gap|), MCE
    * (worst bin |gap|), Brier score (mean squared error of the
    * probability), n. ECE/MCE are computed from the UNROUNDED bin
    * stats and rounded once at the end. */
  def calibrationSummary(df: DataFrame, scoreCol: String,
      labelCol: String, bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2,1000]: $bins")
    val rows = df.select(col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("double").as("y"))
      .where(col("s").isNotNull && col("y").isNotNull &&
        col("s") >= 0 && col("s") <= 1)
      .withColumn("bin",
        least(floor(col("s") * bins), lit(bins - 1)).cast("int"))
    val perBin = rows.groupBy("bin")
      .agg(count(lit(1)).as("n"), avg(col("s")).as("c"),
        avg(col("y")).as("a"))
    val brier = rows.agg(
      round(avg((col("s") - col("y")) * (col("s") - col("y"))), 8)
        .as("brier"),
      count(lit(1)).as("n"))
    perBin
      .agg(
        round(sum(abs(col("a") - col("c")) * col("n")) /
          sum(col("n")), 8).as("ece"),
        round(max(abs(col("a") - col("c"))), 8).as("mce"))
      .crossJoin(broadcast(brier))
      .select(col("ece"), col("mce"), col("brier"), col("n"))
  }

  /** Threshold-free ranking quality of a scorer: one row with
    * ROC-AUC (the Mann–Whitney form with AVERAGE ranks over score
    * ties — tie-safe and order-free, so any engine replays it
    * exactly), Gini = 2·AUC − 1, and average precision in the
    * step-interpolated distinct-threshold form AP = Σ (R_t −
    * R_{t−1})·P_t (the scikit-learn definition — again a function
    * of the distinct-score table, never of a per-row tie order).
    * AUC/AP null when a class is empty. Scale shape: one
    * distinct-score aggregate, then cumulative windows that run in
    * ONE task over that grid — so the score domain must be bounded:
    * `maxDistinctScores` enforces it loudly (the
    * [[Retention]]-family bounded-grid contract; a continuous scorer
    * should be quantized to a fixed grid first — binned AUC is
    * within 1/bins of exact, and the grid IS the resolution a
    * downstream threshold sweep can act on anyway). The grid is
    * checkpointed once; guard count and windows reuse it. */
  def rankingMetrics(df: DataFrame, scoreCol: String,
      labelCol: String, maxDistinctScores: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perScore = df.select(col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("double").as("y"))
      .where(col("s").isNotNull && col("y").isNotNull)
      .groupBy("s").agg(count(lit(1)).as("cnt"),
        sum(col("y")).as("pos"))
      .localCheckpoint(true)
    requireBoundedScoreGrid(perScore, maxDistinctScores,
      "rankingMetrics")
    val asc = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = perScore
      .withColumn("__cum", sum(col("cnt")).over(asc))
      .withColumn("__avg_rank",
        col("__cum").cast("double") - (col("cnt") - 1) / 2.0)
      .withColumn("__tp", sum(col("pos")).over(desc))
      .withColumn("__n_at", sum(col("cnt")).over(desc))
    val tot = ranked.agg(
      sum(col("cnt")).as("n"), sum(col("pos")).as("np"),
      sum(col("pos") * col("__avg_rank")).as("sum_pos_rank"))
    val ap = ranked
      .withColumn("__prec",
        col("__tp").cast("double") / col("__n_at"))
      .crossJoin(broadcast(tot.select(col("np").as("__np"))))
      .where(col("__np") > 0)
      .withColumn("__rec", col("__tp").cast("double") / col("__np"))
      .withColumn("__prev_rec",
        lag(col("__rec"), 1, 0.0).over(Window.orderBy(col("s").desc)))
      .agg(sum((col("__rec") - col("__prev_rec")) * col("__prec"))
        .as("ap_raw"))
    tot.crossJoin(broadcast(ap))
      .select(col("n"), col("np").cast("long").as("n_pos"),
        when(col("np") > 0 && col("n") > col("np"),
          round((col("sum_pos_rank") -
            col("np") * (col("np") + 1) / 2.0) /
            (col("np").cast("double") * (col("n") - col("np"))), 8))
          .as("auc"),
        when(col("np") > 0 && col("n") > col("np"),
          round((col("sum_pos_rank") -
            col("np") * (col("np") + 1) / 2.0) /
            (col("np").cast("double") * (col("n") - col("np"))) * 2
            - 1, 8)).as("gini"),
        when(col("np") > 0, round(col("ap_raw"), 8)).as("ap"))
  }

  /** Precision/recall curve at every DISTINCT score threshold
    * (descending): predicted-positive = score ≥ threshold. One
    * distinct-score aggregate + a cumulative window in ONE task over
    * that grid — bounded by `maxDistinctScores` (the
    * [[rankingMetrics]] contract; quantize continuous scorers). */
  def prCurve(df: DataFrame, scoreCol: String,
      labelCol: String, maxDistinctScores: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perScore = df.select(col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("double").as("y"))
      .where(col("s").isNotNull && col("y").isNotNull)
      .groupBy("s").agg(count(lit(1)).as("cnt"),
        sum(col("y")).as("pos"))
      .localCheckpoint(true)
    requireBoundedScoreGrid(perScore, maxDistinctScores, "prCurve")
    val desc = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val np = perScore.agg(sum(col("pos")).as("__np"))
    perScore
      .withColumn("__tp", sum(col("pos")).over(desc))
      .withColumn("__n_at", sum(col("cnt")).over(desc))
      .crossJoin(broadcast(np))
      .select(col("s").as("threshold"),
        col("__tp").cast("long").as("tp"),
        (col("__n_at") - col("__tp")).cast("long").as("fp"),
        round(col("__tp").cast("double") / col("__n_at"), 8)
          .as("precision"),
        when(col("__np") > 0,
          round(col("__tp").cast("double") / col("__np"), 8))
          .as("recall"))
  }

  /** The ranking ops' bounded-grid window contract (the
    * [[Retention]] posture): cumulative windows downstream run
    * single-task over the distinct-score grid, so an unbounded score
    * domain must fail loudly BEFORE the window — the grid is already
    * checkpointed, so the count is a cheap local scan. */
  private def requireBoundedScoreGrid(grid: DataFrame, maxGrid: Long,
      op: String): Unit = {
    val n = grid.count()
    require(n <= maxGrid,
      s"$op: $n distinct scores exceed maxDistinctScores=$maxGrid — " +
        "the cumulative windows run single-task over this grid; " +
        "quantize the score (fixed-width bins) or raise the cap")
  }

  /** Cohen's κ over two-rater rows (labelA, labelB): κ =
    * (p_o − p_e)/(1 − p_e) with p_e from the raters' marginal label
    * distributions. Output one row (n, po, pe, kappa); κ null when
    * p_e = 1 (both raters constant — agreement is undefined, not
    * perfect). Two aggregates over the label dimension. */
  def cohenKappa(df: DataFrame, labelACol: String,
      labelBCol: String): DataFrame = {
    val rows = df.select(col(labelACol).cast("string").as("a"),
        col(labelBCol).cast("string").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
    val n = rows.agg(count(lit(1)).as("n"),
      avg(when(col("a") === col("b"), 1.0).otherwise(0.0)).as("po"))
    val margA = rows.groupBy("a").agg(count(lit(1)).as("ca"))
    val margB = rows.groupBy(col("b").as("a"))
      .agg(count(lit(1)).as("cb"))
    val pe = margA.join(margB, Seq("a"))
      .agg(sum(col("ca") * col("cb")).as("sum_ab"))
    n.crossJoin(broadcast(pe))
      .select(col("n"),
        round(col("po"), 8).as("po"),
        round(col("sum_ab").cast("double") / (col("n") * col("n")), 8)
          .as("pe"),
        when(col("sum_ab").cast("double") / (col("n") * col("n")) < 1.0,
          round((col("po") - col("sum_ab").cast("double") /
            (col("n") * col("n"))) /
            (lit(1.0) - col("sum_ab").cast("double") /
              (col("n") * col("n"))), 8)).as("kappa"))
  }

  /** Krippendorff's α (nominal metric) over (item, label) rows with
    * VARIABLE raters per item — the agreement coefficient
    * [[fleissKappa]] points to when panels are ragged (Krippendorff,
    * Content Analysis, 2004). Items with fewer than 2 ratings carry
    * no pairable information and are dropped (counted separately in
    * the output). Closed form over the coincidence matrix:
    *
    *   α = 1 − (n−1) · Σ_u (n_u² − Σ_c n_uc²)/(n_u−1)
    *             / (n² − Σ_c n_c²)
    *
    * (n = pairable ratings, n_uc = ratings of category c on unit u,
    * n_c = category marginals over pairable units). α null when the
    * denominator is 0 — every pairable rating in one category means
    * agreement is undefined, not perfect (the κ discipline). Three
    * aggregates; the unit dimension is the only big key. */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
      labelCol: String): DataFrame = {
    val cell = df.select(col(itemCol).as("i"),
        col(labelCol).cast("string").as("c"))
      .where(col("i").isNotNull && col("c").isNotNull)
      .groupBy("i", "c").agg(count(lit(1)).as("nic"))
    val perUnit = cell.groupBy("i")
      .agg(sum(col("nic")).as("nu"),
        sum(col("nic") * col("nic")).as("sq"))
    val pairable = perUnit.where(col("nu") >= 2)
    val unitAgg = pairable.agg(
      count(lit(1)).as("n_units"),
      sum(col("nu")).as("n"),
      sum((col("nu") * col("nu") - col("sq")).cast("double") /
        (col("nu") - 1)).as("num"))
    val dropped = perUnit.where(col("nu") < 2)
      .agg(count(lit(1)).as("n_dropped"))
    val marg = cell.join(pairable.select(col("i")), Seq("i"))
      .groupBy("c").agg(sum(col("nic")).as("nc"))
      .agg(sum(col("nc") * col("nc")).as("sum_nc2"))
    unitAgg.crossJoin(broadcast(marg)).crossJoin(broadcast(dropped))
      .select(col("n_units"), col("n_dropped"), col("n"),
        when(col("n") * col("n") - col("sum_nc2") > 0,
          round(lit(1.0) - (col("n") - 1).cast("double") * col("num") /
            (col("n") * col("n") - col("sum_nc2")).cast("double"), 8))
          .as("alpha"))
  }

  /** Fleiss' κ over (item, label) assignment rows with a FIXED
    * rater count per item (`ratersPerItem` — rejected loudly if any
    * item disagrees: variable panels need Krippendorff, not a
    * silent reweighting). One (item,label) aggregate, one item
    * aggregate, one label-marginal aggregate. Output one row
    * (n_items, p_bar, pe_bar, kappa); κ null when pe_bar = 1. */
  def fleissKappa(df: DataFrame, itemCol: String, labelCol: String,
      ratersPerItem: Int): DataFrame = {
    require(ratersPerItem >= 2,
      s"ratersPerItem must be >= 2: $ratersPerItem")
    val r = ratersPerItem.toDouble
    val cell = df.select(col(itemCol).as("i"),
        col(labelCol).cast("string").as("c"))
      .where(col("i").isNotNull && col("c").isNotNull)
      .groupBy("i", "c").agg(count(lit(1)).as("nic"))
    val perItem = cell.groupBy("i")
      .agg(sum(col("nic")).as("ni"),
        sum(col("nic") * col("nic")).as("sq"))
    val badItems = perItem.where(col("ni") =!= ratersPerItem)
    require(badItems.isEmpty,
      s"every item must carry exactly $ratersPerItem ratings")
    val pBar = perItem.agg(
      count(lit(1)).as("n_items"),
      avg((col("sq") - r) / (r * (r - 1.0))).as("p_bar"))
    val peBar = cell.groupBy("c").agg(sum(col("nic")).as("nc"))
      .crossJoin(broadcast(perItem.agg(
        sum(col("ni")).as("tot"))))
      .agg(sum((col("nc").cast("double") / col("tot")) *
        (col("nc").cast("double") / col("tot"))).as("pe_bar"))
    pBar.crossJoin(broadcast(peBar))
      .select(col("n_items"),
        round(col("p_bar"), 8).as("p_bar"),
        round(col("pe_bar"), 8).as("pe_bar"),
        when(col("pe_bar") < 1.0,
          round((col("p_bar") - col("pe_bar")) /
            (lit(1.0) - col("pe_bar")), 8)).as("kappa"))
  }
}
