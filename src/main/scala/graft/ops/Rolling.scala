package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trailing time-window (RANGE-frame) rollups: for every event, aggregate
  * the same key's events inside `[t - span, t]` — the rate-limiting /
  * burst-detection shape (events per user per trailing hour). The
  * reference has no temporal surface; pipeline extension alongside
  * Sessionize.
  *
  * Scale design: one hash shuffle on the key, then a single WindowExec
  * with a RANGE frame — Spark maintains a sliding frame over the per-key
  * sorted stream, O(frame) state, no self-join (the naive phrasing is a
  * range self-join, quadratic per key). The value sum rides DECIMAL so
  * the sliding-frame add/remove order can't drift against any other
  * engine's segment-tree evaluation — exact arithmetic is
  * order-independent.
  */
object Rolling {

  /** Adds `n_trail` (event count) and `sum_trail` (exact value sum, as
    * double) over the trailing `span` (same units as the numeric `time`
    * column), inclusive of the current instant; rows with equal (key,
    * time) share one frame in every engine's RANGE semantics. */
  def trailingStats(
      df: DataFrame,
      key: String,
      time: String,
      span: Long,
      valueCol: String): DataFrame = {
    require(span >= 0, s"span must be >= 0, got $span")
    val clash = df.columns.toSet.intersect(Set("n_trail", "sum_trail"))
    require(clash.isEmpty,
      s"input already has output columns $clash; rename them first")
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(time))
      .rangeBetween(-span, 0)
    // both window expressions in ONE projection level: a chained
    // withColumn puts the decimal cast in a Project between two Window
    // operators and CollapseWindow can't merge across it — one select
    // plans a single WindowExec evaluating both functions in one pass
    df.select(
      col("*"),
      count(lit(1)).over(w).as("n_trail"),
      sum(col(valueCol).cast(DecimalType(18, 6))).over(w).cast("double")
        .as("sum_trail"))
  }

  /** Rolling MEDIAN over the trailing `frameRows`-row frame per key —
    * the robust centerline [[trailingStats]]' mean-family can't give
    * (one outlier saturates a sum; the median shrugs), the standard
    * monitoring/despiking smoother. Exact, not sketched: the frame is
    * ROWS-bounded, so collecting it per row is O(frameRows) state in
    * the single WindowExec — same shuffle/sort shape as trailingStats,
    * no self-join — and `sort_array` + middle pick (mean of the two
    * middles on even counts, the interpolated convention) is
    * deterministic for any executor order. Null values are excluded
    * from the frame (count may be < frameRows); an all-null frame
    * yields a null median. `tieCol` fixes the within-timestamp order
    * so frame CONTENTS are engine-reproducible — a bare time ordering
    * would leave ties to partitioning luck. Adds (n_frame, median). */
  def rollingMedian(df: DataFrame, key: String, time: String,
      tieCol: String, valueCol: String, frameRows: Int): DataFrame = {
    require(frameRows >= 1 && frameRows <= 10000,
      s"frameRows must be in [1, 10000] (bounded frame state): $frameRows")
    val clash = df.columns.toSet.intersect(Set("n_frame", "median"))
    require(clash.isEmpty,
      s"input already has output columns $clash; rename them first")
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col(tieCol))
      .rowsBetween(-(frameRows - 1), 0)
    val arr = sort_array(collect_list(col(valueCol).cast("double")).over(w))
    df.select(col("*"), arr.as("__mf"))
      .withColumn("n_frame", size(col("__mf")).cast("long"))
      .withColumn("median", when(col("n_frame") === 0, lit(null))
        .when(col("n_frame") % 2 === 1,
          element_at(col("__mf"), ((col("n_frame") + 1) / 2).cast("int")))
        .otherwise((
          element_at(col("__mf"), (col("n_frame") / 2).cast("int")) +
          element_at(col("__mf"), (col("n_frame") / 2 + 1).cast("int")))
          / 2.0))
      .drop("__mf")
  }
}
