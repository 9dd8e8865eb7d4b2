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

  /** Hill-numbers diversity profile per group (Hill 1973; the
    * "effective number of species" ladder ecology standardized and
    * corpus linguistics borrowed): over each group's token
    * distribution,
    *
    *   D0 = richness (distinct types)
    *   D1 = exp(Shannon H)       (types weighted by their share)
    *   D2 = 1 / Simpson λ        (dominance-weighted)
    *
    * D0 ≥ D1 ≥ D2 always; a big D0 with a small D2 is the template-
    * farm signature (huge vocabulary, few tokens doing all the work).
    * Evenness = D1/D0 normalizes register size away.
    *
    * Exactness: counts are exact BIGINTs; λ = Σc²/N² has an exact
    * integer numerator (decimal(38,0) — c² overflows BIGINT past
    * ~3e9-token types); H = ln N − (Σ c ln c)/N keeps the only float
    * sum on per-DISTINCT-TYPE counts (the entropy-family discipline).
    * Returns (group, n_tokens, d0, d1, d2, evenness), 6 dp. */
  def hillNumbers(df: DataFrame, groupCol: String,
      tokenCol: String): DataFrame = {
    val counts = df.where(col(tokenCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(tokenCol).as("__t"))
      .agg(count(lit(1)).as("c"))
    val nd = col("n").cast("double")
    counts.groupBy("g").agg(
        sum(col("c")).as("n"),
        count(lit(1)).as("d0"),
        sum(col("c").cast("double") * log(col("c").cast("double")))
          .as("clnc"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("c2"))
      .select(col("g").as(groupCol), col("n").as("n_tokens"), col("d0"),
        round(exp(log(nd) - col("clnc") / nd), 6).as("d1"),
        round(nd * nd / col("c2").cast("double"), 6).as("d2"),
        round(exp(log(nd) - col("clnc") / nd) / col("d0"), 6)
          .as("evenness"))
  }
}
