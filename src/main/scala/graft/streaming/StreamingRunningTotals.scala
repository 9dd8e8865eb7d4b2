package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Per-key LIVE running totals on Spark 4's `transformWithState`
  * operator (the arbitrary-state API v2 that supersedes
  * `mapGroupsWithState`): every micro-batch re-emits each touched
  * key's cumulative (count, sum) — the "live dashboard counter"
  * primitive — with OPTIONAL per-key state TTL so idle keys expire
  * and total state stays bounded by the active key set rather than
  * the all-time one.
  *
  * Why the v2 API here: TTL is a first-class `TTLConfig` on the
  * `ValueState` itself (the store evicts expired values — no manual
  * timeout bookkeeping as in `GroupStateTimeout`), and the processor
  * object carries typed state handles initialized once per operator
  * rather than per-call `GroupState` plumbing. Requires the RocksDB
  * state store provider (set by [[runningTotals]]'s caller on the
  * session — see StreamingRunningTotalsSpec for the config).
  *
  * State per key: one (count, sum) pair — hard-bounded; with a TTL,
  * bounded by keys active within the TTL window.
  */
object StreamingRunningTotals {

  final case class Totals(key: String, n: Long, sum: Double)

  class Processor(ttlMillis: Long)
      extends StatefulProcessor[String, (String, Double), Totals] {
    @transient private var state: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)](
        "totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        if (ttlMillis > 0) TTLConfig(java.time.Duration.ofMillis(ttlMillis))
        else TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Double)],
        timerValues: TimerValues): Iterator[Totals] = {
      var (c, s) = Option(state.get()).getOrElse((0L, 0.0))
      rows.foreach { r => c += 1L; s += r._2 }
      state.update((c, s))
      Iterator.single(Totals(key, c, s))
    }
  }

  /** Update-mode stream of cumulative per-key totals. `ttlMillis <= 0`
    * keeps state forever; positive TTL expires keys idle longer than
    * the window (processing-time). */
  def runningTotals(
      df: DataFrame, keyCol: String, valCol: String,
      ttlMillis: Long = 0L): Dataset[Totals] = {
    val spark = df.sparkSession
    import spark.implicits._
    val timeMode =
      if (ttlMillis > 0) TimeMode.ProcessingTime() else TimeMode.None()
    df.select(col(keyCol).cast("string").as("k"),
        col(valCol).cast("double").as("v"))
      .where(col("k").isNotNull && col("v").isNotNull)
      .as[(String, Double)]
      .groupByKey(_._1)
      .transformWithState(new Processor(ttlMillis), timeMode,
        OutputMode.Update())
  }
}
