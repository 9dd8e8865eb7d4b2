package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming interval (time-range) join — the unbounded-stream
  * counterpart of `ops.RangeJoin`: match each left event to the right
  * events of the same key whose timestamp falls in
  * `[rightTs, rightTs + span]` (e.g. "every action within 2h after that
  * user's error"). Built on Spark's native stream-stream join: both
  * sides watermarked, the range condition bounds how long either side's
  * rows stay in the join state store, so state is evicted as the
  * watermark advances — bounded by construction, the only join shape
  * that survives an unbounded 100 TB/day ingest. The equi-key keeps
  * matching keyed (state lookup per key), not a cross-product within
  * the window.
  */
object StreamingIntervalJoin {

  /** Inner stream-stream join of `left` events to `right` events of the
    * same key with `leftTs` in `[rightTs, rightTs + spanSeconds]`.
    * Timestamp columns must be castable to timestamp; both sides get
    * `watermarkDelay` watermarks (late rows beyond it are dropped, and
    * right-side state older than span + delay is evicted). Column sets
    * must be disjoint. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      spanSeconds: Long,
      watermarkDelay: String = "0 seconds"): DataFrame =
    build(left, right, leftKey, rightKey, leftTs, rightTs, spanSeconds,
      watermarkDelay, "inner")

  /** LEFT OUTER stream-stream interval join: every left event emits —
    * matched rows eagerly like the inner join, UNMATCHED rows with
    * null right columns only once the watermark proves no future right
    * row can still match (leftTs + delay passed on both sides), which
    * is when the engine evicts the left row from the join state. The
    * shape that keeps "events with no preceding signup" observable on
    * an unbounded stream — and the reason outer results are
    * watermark-DELAYED, not wrong, on a live pipeline. */
  def intervalJoinLeftOuter(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      spanSeconds: Long,
      watermarkDelay: String = "0 seconds"): DataFrame =
    build(left, right, leftKey, rightKey, leftTs, rightTs, spanSeconds,
      watermarkDelay, "left_outer")

  private def build(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      spanSeconds: Long,
      watermarkDelay: String,
      joinType: String): DataFrame = {
    require(spanSeconds >= 0, s"spanSeconds must be >= 0, got $spanSeconds")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty, s"left/right name clash: $clash")
    val l = left
      .withColumn(leftTs, col(leftTs).cast("timestamp"))
      .withWatermark(leftTs, watermarkDelay)
    val r = right
      .withColumn(rightTs, col(rightTs).cast("timestamp"))
      .withWatermark(rightTs, watermarkDelay)
    l.join(
      r,
      col(leftKey) === col(rightKey) &&
        col(leftTs) >= col(rightTs) &&
        col(leftTs) <= col(rightTs) + expr(s"INTERVAL $spanSeconds SECONDS"),
      joinType)
  }
}
