package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming cardinality — windowed approximate distinct keys over an
  * event-time stream: "how many unique users / documents / IPs per
  * window, right now", the counting companion to
  * [[StreamingHeavyHitters]]' ranking.
  *
  * Exact distinct over a stream needs state proportional to the key
  * cardinality; the HLL++ sketch behind `approx_count_distinct` caps
  * it at a few KB per window at the configured relative error, so
  * state is windows-inside-watermark × sketch size NO MATTER how many
  * distinct keys flow past — the same bounded-state contract as the
  * rest of the streaming family, and the same sketch the batch
  * profiler's 100 TB mode runs (q00b), here behind a watermarked
  * window aggregate that Spark ages out automatically. */
object StreamingDistinct {

  /** Tumbling-window approximate distinct `keyCol` values.
    * `tsCol` must be castable to timestamp; late rows beyond
    * `watermark` are dropped (and their windows finalized). Returns
    * (w_start, w_end, approx_distinct). */
  def windowedApproxDistinct(df: DataFrame, tsCol: String,
      keyCol: String, windowDur: String, watermark: String,
      relativeSD: Double = 0.05): DataFrame =
    df.select(col(tsCol).cast("timestamp").as("ts"),
        col(keyCol).as("k"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur))
      .agg(approx_count_distinct(col("k"), relativeSD)
        .as("approx_distinct"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("approx_distinct"))
}
