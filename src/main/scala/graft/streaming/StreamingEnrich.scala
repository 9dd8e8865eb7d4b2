package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–static enrichment — the dimension-join every event pipeline
  * runs at ingest: an unbounded fact stream joined to a bounded
  * dimension table (users, devices, experiments), then aggregated per
  * event-time window and dimension attribute.
  *
  * Structured Streaming plans a stream–static equi-join STATELESSLY:
  * the static side is (re)read per micro-batch and — when small —
  * broadcast, so no join state accumulates and the only stateful
  * operator is the windowed aggregation behind the watermark (state
  * bounded by windows × groups). That asymmetry is exactly why the
  * enrichment belongs on the stream side of a Kappa pipeline rather
  * than as a post-hoc batch join: at 100 TB/day of facts the
  * dimension stays a broadcast, never a shuffle.
  *
  * Inner-join semantics: facts with no dimension row are dropped
  * (enrichment as filter); use a left join upstream if orphans must
  * survive — [[graft.ops.JoinHealth]] audits that choice offline.
  */
object StreamingEnrich {

  /** Enrich `stream` (must carry `keyCol` and event-time `timeCol`)
    * with `dim`'s `attrCol` via an inner equi-join on `keyCol`, then
    * aggregate per (tumbling `windowDuration` window, attribute):
    * event count and an exact decimal sum of `valueCol`. Append-mode
    * safe behind the `watermark`. Returns
    * (window, attr, n_events, sum_value). */
  def enrichedWindowStats(
      stream: DataFrame, dim: DataFrame,
      keyCol: String, timeCol: String, valueCol: String,
      attrCol: String, windowDuration: String,
      watermark: String): DataFrame = {
    val facts = stream.withWatermark(timeCol, watermark)
    val d = dim.select(col(keyCol), col(attrCol).as("attr"))
    facts
      .join(broadcast(d), keyCol)
      .groupBy(window(col(timeCol), windowDuration), col("attr"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,6)")).as("sum_value"))
  }
}
