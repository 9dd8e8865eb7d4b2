package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis — the activation/stickiness matrix every
  * product-analytics stack derives from an event stream: users grouped
  * by the period of their FIRST activity (the cohort), then counted in
  * each later period they return. The reference has no temporal
  * operators; this extends the events-analytics family
  * (Sessionize/Funnel/Transitions).
  *
  * Scale design: the (user, period) projection collapses to DISTINCT
  * pairs first (map-side combined — one row per active user-period, not
  * per event), the cohort assignment is a groupBy-min on the user, and
  * the matrix rollup is a second small groupBy; both shuffles hash on
  * uniformly-distributed keys. Period indexing is exact INTEGER
  * division of the epoch time (`div`) — no float boundary can move a
  * user between periods, in any engine.
  */
object Retention {

  /** Retention matrix: one row per (cohort_period, period_offset) with
    * the distinct-user count active in that offset. `timeCol` is a
    * NUMERIC epoch column (e.g. microseconds); `period` the bucket
    * width in the same unit (non-positive rejected). Offsets are
    * guaranteed ≥ 0 (cohort = the user's minimum period). */
  def cohortRetention(
      df: DataFrame, userCol: String, timeCol: String,
      period: Long): DataFrame = {
    require(period > 0, "period must be positive")
    require(!timeCol.contains("`") && !timeCol.contains("'"),
      "column name must not contain backticks or quotes")
    val uw = df
      .where(col(userCol).isNotNull && col(timeCol).isNotNull)
      .select(col(userCol).as("u"),
        // FLOOR division ((a - pmod) div b): Spark's `div` truncates
        // toward zero, which would merge periods -(p-1)..(p-1) into
        // one double-width bucket for pre-epoch times and disagree
        // with floor-semantics `//` oracles
        expr(s"(`$timeCol` - pmod(`$timeCol`, $period)) div $period")
          .as("wk"))
      .distinct()
      .localCheckpoint(false)
    val cohorts = uw.groupBy("u").agg(min(col("wk")).as("cohort"))
    uw.join(cohorts, "u")
      .groupBy(col("cohort").as("cohort_period"),
        (col("wk") - col("cohort")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
