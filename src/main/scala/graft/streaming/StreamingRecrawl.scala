package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ONLINE recrawl change-rate estimation — the streaming twin of
  * [[graft.ops.CrawlSchedule.changeRate]] (Cho & Garcia-Molina's
  * bias-corrected λ̂): fetch events update per-URL state as they
  * arrive, and each micro-batch emits the URL's refreshed estimator
  * row — the live scheduler feed a continuous crawler reprioritizes
  * from, without a batch re-estimate over all history. q407 gates a
  * three-batch drive against the batch oracle (final rows must equal
  * the q405 computation over the same history).
  *
  * State per URL: (n_fetches, n_changes, t_first, t_last, last_hash)
  * — five scalars, NoTimeout, bounded by the MONITORED-frontier
  * dimension (a crawler tracks URLs it scheduled; this is the
  * StreamingBudget "state bounded by the plan's own dimension"
  * argument, not an unbounded-universe key like LSH buckets — for
  * open-universe feeds the event-time TTL discipline of
  * [[StreamingChunkDedup.novelChunksEventTime]] applies verbatim).
  * Within a batch a URL's slice is processed in ascending ts (the
  * flatMapGroups iterator order is not contractual); across batches
  * the micro-batch sequence is the arrival order — same contract as
  * [[StreamingBudget]]. Changes are DETECTED: a fetch whose hash
  * differs from the stored last hash increments X; λ̂ and due derive
  * exactly as the batch op (rounded HALF_UP at 8, due floored on the
  * rounded λ̂), so the gates share one oracle. */
object StreamingRecrawl {

  final case class RateState(n: Long, x: Long, t0: Long, t1: Long,
      lastHash: String)
  final case class RateUpdate(url: String, n_fetches: Long,
      n_changes: Long, lambda_hat: Option[Double], due_us: Option[Long])

  private def estimate(st: RateState): RateUpdate = {
    val n = st.n - 1 // intervals
    if (n <= 0) RateUpdate("", st.n, st.x, None, None)
    else {
      val raw = -math.log((n - st.x + 0.5) / (n + 0.5))
      val lam = BigDecimal(raw)
        .setScale(8, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      val due =
        if (lam > 0) {
          val dbar = (st.t1 - st.t0).toDouble / n
          Some(math.floor(st.t1 + dbar / lam).toLong)
        } else None
      RateUpdate("", st.n, st.x, Some(lam), due)
    }
  }

  def changeRateUpdates(df: DataFrame, urlCol: String, tsCol: String,
      hashCol: String): Dataset[RateUpdate] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(urlCol).cast("string").as("url"),
        col(tsCol).cast("long").as("ts"),
        col(hashCol).cast("string").as("h"))
      // a fetch event without a timestamp cannot order into the
      // history: dropped here (never-throw contract — a null ts would
      // crash the primitive-Long encode, the q380 lesson)
      .where(col("ts").isNotNull)
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RateState, RateUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (url, rows, state: GroupState[RateState]) =>
          var st = state.getOption.orNull
          rows.toSeq.sortBy(_._2).foreach { case (_, ts, h) =>
            st =
              if (st == null) RateState(1L, 0L, ts, ts, h)
              else RateState(st.n + 1,
                st.x + (if (h != st.lastHash) 1L else 0L),
                st.t0, ts, h)
          }
          state.update(st)
          Iterator.single(estimate(st).copy(url = url))
      }
  }
}
