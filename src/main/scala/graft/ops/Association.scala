package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Information-theoretic association between two categorical columns:
  * mutual information and Theil's uncertainty coefficient U — the
  * asymmetric complement to Cramér's V / φk (reference correlations:
  * `model/correlations.py`; U is the dython-style categorical measure
  * the reference's users reach for next).
  *
  * Everything derives from ONE contingency pass:
  *
  *   joint(x, y, c)  =  groupBy(x, y).count        — the only full scan
  *   H(X), H(Y)      =  entropy of joint's marginals (tiny re-aggs)
  *   H(X,Y)          =  entropy of joint itself
  *   MI              =  H(X) + H(Y) − H(X,Y)
  *   U(X|Y) = MI/H(X),   U(Y|X) = MI/H(Y)
  *
  * The joint table is localCheckpoint'd so the three entropy aggregates
  * reuse one materialization instead of re-scanning the input (the
  * ReuseExchange-defeating column-pruning trap — see NOTES_r5). Each
  * entropy uses `Σ c·(ln n − ln c) / n` — q82's oracle-proven shape
  * rearranged to be exactly zero for constant columns (see below).
  * All driver transfers are one-row; the contingency table itself never
  * leaves the cluster, so cardinality of x/y only bounds the tiny
  * re-agg inputs — scale-safe at 100 TB.
  */
object Association {

  /** Entropy as `Σ c·(ln n − ln c) / n` — algebraically equal to
    * `ln n − Σ c·ln c / n` but EXACTLY 0.0 for a single-level column
    * (the lone term is `n·(ln n − ln n)`, identical bits in any
    * engine), so the zero-entropy U guard can test exact equality
    * instead of an epsilon. */
  private def entropy(counts: DataFrame, cCol: String, n: Long) =
    counts.agg(
      (sum(col(cCol) * (log(lit(n).cast("double")) - log(col(cCol)))) /
        lit(n)).as("h"))

  /** One-row result: (mi, u_x_given_y, u_y_given_x, n), natural-log
    * units, rounded to 8 decimals. Null categories are kept as their
    * own level (groupBy treats null as a key, matching pandas
    * `dropna=False` crosstabs). Returns null U when the corresponding
    * entropy is zero (constant column). */
  def categoricalAssociation(
      df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df
      .groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)

    val nRow = joint.agg(sum(col("c"))).head()
    require(!nRow.isNullAt(0), "input is empty")
    val n = nRow.getLong(0)
    val hxy = entropy(joint, "c", n).select(col("h").as("hxy"))
    val hx = entropy(
      joint.groupBy("x").agg(sum(col("c")).as("cx")), "cx", n)
      .select(col("h").as("hx"))
    val hy = entropy(
      joint.groupBy("y").agg(sum(col("c")).as("cy")), "cy", n)
      .select(col("h").as("hy"))

    val mi = col("hx") + col("hy") - col("hxy")
    hxy.crossJoin(hx).crossJoin(hy)
      .select(
        round(mi, 8).as("mi"),
        round(when(col("hx") =!= 0.0, mi / col("hx")), 8)
          .as("u_x_given_y"),
        round(when(col("hy") =!= 0.0, mi / col("hy")), 8)
          .as("u_y_given_x"),
        lit(n).as("n"))
  }

  /** Mutual information between two NUMERIC columns via equal-width
    * binning — the nonlinear-dependence screen Pearson misses (a
    * V-shaped relation scores 0 correlation but high MI). One min/max
    * pre-pass over live (both-non-null, non-NaN) rows, then the same
    * exact-count entropy machinery as [[categoricalAssociation]] over
    * the (bin_x, bin_y) contingency — identical bin arithmetic to the
    * histogram family, so any engine reproduces the cells. Returns
    * (mi, u_x_given_y, u_y_given_x, n), 8dp. */
  def binnedMutualInfo(
      df: DataFrame, xCol: String, yCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val live = df
      .where(x.isNotNull && !x.isNaN && y.isNotNull && !y.isNaN)
      .select(x.as("__x"), y.as("__y"))
    val mm = live.agg(min(col("__x")), max(col("__x")),
      min(col("__y")), max(col("__y"))).head()
    require(!mm.isNullAt(0), "no rows with both values live")
    val bx = graft.functions.StatFunctions
      .histogramBin(col("__x"), mm.getDouble(0), mm.getDouble(1), bins)
    val by = graft.functions.StatFunctions
      .histogramBin(col("__y"), mm.getDouble(2), mm.getDouble(3), bins)
    categoricalAssociation(
      live.select(bx.as("__bx"), by.as("__by")), "__bx", "__by")
  }
}
