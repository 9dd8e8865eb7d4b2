package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap-based sessionization — the unbounded-stream counterpart
  * of `ops.Sessionize`, built on Spark's native `session_window` (merging
  * session state in the streaming aggregation state store) rather than
  * custom `flatMapGroupsWithState` state: the built-in operator already
  * expresses gap-merge semantics, handles out-of-order events inside the
  * watermark, and evicts closed sessions once the watermark passes their
  * end — bounded state by construction.
  *
  * Semantics note vs the batch operator: `session_window` extends a
  * session while the next event starts STRICTLY before last+gap, so two
  * events exactly `gap` apart begin a new session; the batch
  * `Sessionize` splits on strictly-greater-than-gap (they agree
  * everywhere except that boundary instant). The emitted window end is
  * last event time + gap (Spark's convention), so `n_events`/`sum_value`
  * are the session payload and `end - start - gap` the active duration.
  */
object StreamingSessionize {

  /** Per-(key, session) rollup in Append mode: rows emit once the
    * watermark passes a session's end, i.e. each session is final when
    * it appears. `tsCol` must be castable to timestamp. */
  def sessionStats(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: String,
      valueCol: String,
      watermarkDelay: String = "0 seconds"): DataFrame = {
    df.select(
        col(keyCol),
        col(tsCol).cast("timestamp").as("__ts"),
        col(valueCol).as("__v"))
      .withWatermark("__ts", watermarkDelay)
      .groupBy(col(keyCol), session_window(col("__ts"), gap).as("session"))
      .agg(count(lit(1)).as("n_events"), sum(col("__v")).as("sum_value"))
      .select(
        col(keyCol),
        col("session.start").as("session_start"),
        col("session.end").as("session_end"),
        col("n_events"),
        col("sum_value"))
  }
}
