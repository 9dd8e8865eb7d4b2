package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kendall rank correlation (tau-b, tie-corrected).
  *
  * The reference computes Kendall by pulling ALL numeric columns to one
  * node through a grouped-map pandas UDF (`correlations.py:140-216`, an
  * acknowledged non-distributed fallback citing arXiv:1704.03767 for a
  * future distributed algorithm). Here: exact tau-b by distributed pair
  * counting — a self-join over a (deterministically sampled, when large)
  * input. O(n^2) pairs shuffled across the cluster rather than one
  * node's memory; for full-table tau at 100 TB, sample first (the
  * estimate's s.e. ~ 1/sqrt(n) makes >10^4 rows statistically pointless).
  */
object Kendall {

  /** Exact tau-b between two numeric columns of `df` (pair-count join).
    * Output columns: n, concordant, discordant, tau_b (rounded). */
  def tauB(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.select(col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .withColumn("rid", monotonically_increasing_id())
    val a = base.as("a"); val b = base.as("b")
    val pairs = a.join(b, col("a.rid") < col("b.rid"))
      .select(
        (col("a.x") - col("b.x")).as("dx"),
        (col("a.y") - col("b.y")).as("dy"))
    val agg = pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("dx") * col("dy") > 0, 1L).otherwise(0L)).as("c"),
      sum(when(col("dx") * col("dy") < 0, 1L).otherwise(0L)).as("d"),
      sum(when(col("dx") === 0 && col("dy") =!= 0, 1L).otherwise(0L)).as("tx"),
      sum(when(col("dy") === 0 && col("dx") =!= 0, 1L).otherwise(0L)).as("ty"))
    val denom = (col("c") + col("d") + col("tx")).cast("double") *
      (col("c") + col("d") + col("ty")).cast("double")
    agg.select(
      col("n_pairs"), col("c").as("concordant"), col("d").as("discordant"),
      // constant column => all pairs tied => denom 0: tau undefined (null),
      // not an ANSI divide-by-zero failure
      round(
        when(denom > 0.0,
          (col("c") - col("d")).cast("double") / sqrt(denom)),
        8).as("tau_b"))
  }
}
