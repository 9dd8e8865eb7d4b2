package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral-diversity profiling: how concentrated is each key's
  * activity over a categorical dimension? Per-key Shannon entropy of
  * the `stateCol` distribution, summarized as a fixed-bin histogram —
  * "what share of users do exactly one thing vs sample everything",
  * the segmentation readout a personalization/curation pipeline reads
  * before stratifying.
  *
  * Exactness: all histogram counts are exact integers. Each key's
  * entropy is H = ln(n) − Σ c·ln(c) / n (nats) — one fixed IEEE
  * expression both engines evaluate identically. A single-state key's
  * H is zero up to the n·ln(n)/n rounding (which can land one ulp
  * NEGATIVE), so the bin index clamps at 0 — in the same expression on
  * both sides; multi-state entropies sit far from the 0.25-wide bin
  * edges relative to last-ulp summation noise. Two shuffles, both on
  * keys: (key, state) counts, then the per-key rollup; the histogram
  * itself is a bounded aggregate. */
object Diversity {

  /** Returns (bin, lo, hi, n_keys) for non-empty entropy bins:
    * bin = min(floor(H / 0.25), nBins−1), lo/hi the bin bounds, nats.
    * Null keys are dropped; null states are their own level. */
  def keyEntropyHistogram(df: DataFrame, keyCol: String,
      stateCol: String, nBins: Int = 12): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    val counts = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("__k"), col(stateCol).as("__s"))
      .agg(count(lit(1)).as("c"))
    val per = counts.groupBy("__k").agg(
      sum(col("c")).as("n"),
      sum(col("c").cast("double") * log(col("c").cast("double")))
        .as("clnc"))
    val nd = col("n").cast("double")
    val h = log(nd) - col("clnc") / nd
    val bin = least(greatest(floor(h / 0.25), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("int")
    per.select(bin.as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_keys"))
      .select(col("bin"), (col("bin") * 0.25).as("lo"),
        ((col("bin") + 1) * 0.25).as("hi"), col("n_keys"))
      .orderBy("bin")
  }
}
