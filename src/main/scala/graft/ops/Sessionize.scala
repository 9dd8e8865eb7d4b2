package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream.
  *
  * Assigns a per-key `session_id` (1-based, dense) where a new session
  * starts whenever the gap to the previous event of the same key strictly
  * exceeds `gap` (same units as the time column). The classic building
  * block for clickstream / telemetry pipelines the reference's profiling
  * surface feeds into; the reference itself has no temporal operators, so
  * this is part of the pipeline-extension surface (SURVEY §2 extension).
  *
  * Scale design: ONE shuffle (hash on the key), then two window functions
  * over the same (key, time) sort — Spark evaluates both in a single
  * WindowExec with per-partition streaming state of O(1) per key. No
  * global window, no driver participation, so the plan is unchanged at
  * 1000 executors: each key's timeline lands on one task. Skewed keys
  * (one user with billions of events) are the only hazard — for those,
  * pre-split by (key, coarse time bucket) upstream and stitch session ids
  * across bucket boundaries, which this API supports by composing over
  * bucketed input.
  */
object Sessionize {

  /** Adds a `session_id` column. `time` must be numeric (e.g. epoch
    * nanos — `events.ts` reads as long under parquet nanosAsLong);
    * `tieBreak` columns make the per-key order total when timestamps can
    * collide, so session numbering is deterministic.
    */
  def sessionize(
      df: DataFrame,
      key: String,
      time: String,
      gap: Long,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(gap >= 0, s"gap must be >= 0, got $gap")
    require(!df.columns.contains("session_id"),
      "input already has a session_id column; rename it first")
    val order: Seq[Column] = (col(time) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    val prev = lag(col(time), 1).over(w)
    val isNew = when(prev.isNull || col(time) - prev > gap, 1L).otherwise(0L)
    df.withColumn(
      "session_id",
      sum(isNew).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-key INTERVAL-UNION length — "how much wall-clock was this user
    * actually active": each row contributes the interval
    * [startCol, endCol) and overlapping/adjacent intervals merge before
    * summing, so double-covered time counts once (the measure of the
    * union, not the sum of lengths). The classic gaps-and-islands plan:
    * per key in start order, a running maximum of interval ends marks
    * island breaks (start > max end so far), islands groupBy-collapse
    * to (min start, max end), lengths sum exactly (integer time units
    * in, integers out — no float anywhere).
    *
    * Scale: both windows partition by the key (the sessionize shuffle
    * contract — never a global window); the island rollup is one more
    * hash groupBy. Returns (keyCol, n_intervals, n_islands,
    * union_len, sum_len): sum_len − union_len is the double-counted
    * overlap a naive sum would have inflated. */
  def intervalUnionLength(
      df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val base = df
      .where(col(keyCol).isNotNull && col(startCol).isNotNull &&
        col(endCol).isNotNull && col(endCol) >= col(startCol))
      .select(col(keyCol).as("k"), col(startCol).cast("long").as("s"),
        col(endCol).cast("long").as("e"))
    val w = Window.partitionBy("k").orderBy(col("s"), col("e"))
    val wPrior = w.rowsBetween(Window.unboundedPreceding, -1)
    val islands = base
      .withColumn("max_e_prior", max(col("e")).over(wPrior))
      .withColumn("brk",
        when(col("max_e_prior").isNull ||
          col("s") > col("max_e_prior"), 1L).otherwise(0L))
      .withColumn("island",
        sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("k", "island")
      .agg(min(col("s")).as("is_s"), max(col("e")).as("is_e"),
        count(lit(1)).as("cnt"), sum(col("e") - col("s")).as("len_sum"))
    islands.groupBy(col("k").as(keyCol))
      .agg(sum(col("cnt")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("is_e") - col("is_s")).as("union_len"),
        sum(col("len_sum")).as("sum_len"))
      .orderBy(keyCol)
  }

  /** Per-session rollup: event count, start/end/duration, exact value sum
    * (through DECIMAL so the result is order-independent).
    */
  def sessionStats(
      df: DataFrame,
      key: String,
      time: String,
      gap: Long,
      valueCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    sessionize(df, key, time, gap, tieBreak)
      .groupBy(col(key), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(time)).as("t_start"),
        max(col(time)).as("t_end"),
        (max(col(time)) - min(col(time))).as("duration"),
        sum(col(valueCol).cast(DecimalType(18, 6))).cast("double")
          .as("sum_value"))
  }

  /** Top within-session event paths: the k most frequent runs of
    * `len` CONSECUTIVE `typeCol` values inside a session (same key,
    * same gap-session) — the "what do users actually do" sequence
    * mining pass. Consecutive means adjacent in the (time, tieBreak)
    * order; a path never crosses a session boundary (leads are
    * partitioned by (key, session_id)). One sessionize window + len−1
    * leads over the same partitioning (single shuffle), a
    * groupBy(path) with map-side combine, then a bounded TakeOrdered
    * with (count desc, path) as the deterministic edge. Returns
    * (path, n) — path is " > "-joined — ordered. */
  def topPaths(
      df: DataFrame, key: String, time: String, typeCol: String,
      gap: Long, len: Int, k: Int,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(len >= 2, "len must be >= 2")
    require(k >= 1, "k must be >= 1")
    val order: Seq[Column] = (col(time) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(col(key), col("session_id"))
      .orderBy(order: _*)
    val steps: Seq[Column] = col(typeCol) +:
      (1 until len).map(i => lead(col(typeCol), i).over(w))
    sessionize(df.where(col(key).isNotNull && col(time).isNotNull &&
        col(typeCol).isNotNull), key, time, gap, tieBreak)
      .withColumn("path", concat_ws(" > ", steps: _*))
      // a lead that ran off the session end leaves a short path —
      // exactly len joined parts means all steps were present
      .where(size(split(col("path"), " > ")) === len)
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }
}
