package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Online drift monitoring — the streaming half of the batch drift
  * family (`ops.Drift`): per-event-time-window PSI of an incoming
  * stream against a BASELINE distribution profiled offline (e.g. the
  * training corpus' histogram). The standard serve-time monitor:
  * "did this hour's traffic drift from what the model saw in
  * training?"
  *
  * Stream-friendly by construction: the baseline fixes the bin edges
  * and reference shares up front (literals in the plan), so each
  * window needs only FIXED-ARITY conditional counts — ONE stateful
  * aggregation, append-mode safe behind the watermark, state bounded
  * by windows × bins. The PSI fold over the bin counts is a stateless
  * projection on the aggregate's output row. Same Laplace smoothing
  * as the batch `Drift.psi`, so scores are comparable across the
  * batch/stream boundary.
  */
object StreamingDrift {

  /** Baseline = bin edges + per-bin probability shares (must be
    * positive — smooth offline before passing; `fromCounts` does). */
  final case class Baseline(mn: Double, mx: Double, shares: Seq[Double]) {
    require(shares.nonEmpty, "need at least one bin")
    require(mx > mn, "need mx > mn")
    require(shares.forall(_ > 0), "baseline shares must be positive " +
      "(Laplace-smooth the offline histogram; fromCounts does)")
  }

  object Baseline {
    /** Build from raw offline bin counts with the SAME Laplace
      * smoothing the stream side applies: (c+0.5)/(n+0.5k). */
    def fromCounts(mn: Double, mx: Double, counts: Seq[Long]): Baseline = {
      val k = counts.size
      val n = counts.sum
      Baseline(mn, mx,
        counts.map(c => (c + 0.5) / (n + 0.5 * k)))
    }
  }

  /** Per-window drift: (w, psi, n) where psi compares the window's
    * smoothed bin shares against the baseline's. Values outside
    * [mn, mx] clamp into the edge bins (the baseline's support is the
    * reference frame); nulls/NaNs are dropped. */
  def psiVsBaseline(
      df: DataFrame, timeCol: String, valueCol: String,
      baseline: Baseline, windowDuration: String,
      watermark: String): DataFrame = {
    val k = baseline.shares.size
    val v = col(valueCol).cast("double")
    val bin = graft.functions.StatFunctions
      .histogramBin(v, baseline.mn, baseline.mx, k)
    val binClamped = greatest(lit(0), least(bin, lit(k - 1)))

    val counts: Seq[Column] = (0 until k).map(i =>
      count(when(binClamped === i, 1)).as(s"c$i"))
    val agged = df
      .where(v.isNotNull && !isnan(v))
      .withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), windowDuration).as("w"))
      .agg(counts.head, counts.tail: _*)

    val n = (0 until k).map(i => col(s"c$i")).reduce(_ + _)
    val psi = (0 until k).map { i =>
      val p = (col(s"c$i") + 0.5) / (n + 0.5 * k)
      val q = lit(baseline.shares(i))
      (p - q) * log(p / q)
    }.reduce(_ + _)
    agged.select(col("w"), round(psi, 8).as("psi"), n.as("n"))
  }
}
