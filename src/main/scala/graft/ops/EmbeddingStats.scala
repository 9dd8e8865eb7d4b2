package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.StatFunctions

/** Embedding-column hygiene stats — the checks an ANN/semantic-dedup
  * pipeline runs before trusting cosine similarity: zero vectors
  * (cosine undefined → silently NaN), norm spread (unnormalized
  * corpora make inner-product ≠ cosine), and dimension consistency
  * (a ragged column breaks every kernel downstream).
  *
  * Two passes: a tiny groupBy over the distinct vector lengths (the
  * modal dimension), then one fused aggregate. Norms come from the codegen'd
  * [[graft.functions.ArrayDot]] self-product (`Σ xᵢ²` left-to-right in
  * double, then sqrt) and are rounded to 6 decimals PER ROW before
  * aggregating, so min/max are order-independent bit-stable across
  * engines; avg adds one more rounding at 8. */
object EmbeddingStats {

  /** One-row result: (n, n_null, n_zero, n_dims, n_ragged,
    * min_norm, avg_norm, max_norm). `n_dims` is the modal (most
    * common, ties → smallest) element count; `n_ragged` counts rows
    * whose length differs from it. */
  def normStats(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val norm = round(StatFunctions.l2Norm(v), 6).as("norm")
    val base = df.select(norm, size(v).as("dims"), v.isNull.as("isnull"))
    // modal dimension: tiny value-count over distinct lengths
    val dimCounts = base.where(!col("isnull"))
      .groupBy("dims").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("dims"))
      .limit(1)
    val modal = dimCounts.collect().headOption.map(_.getInt(0))
    base.agg(
      count(lit(1)).as("n"),
      count(when(col("isnull"), 1)).as("n_null"),
      count(when(!col("isnull") && col("norm") === 0.0, 1)).as("n_zero"),
      lit(modal.getOrElse(0)).as("n_dims"),
      count(when(!col("isnull") &&
        col("dims") =!= lit(modal.getOrElse(-1)), 1)).as("n_ragged"),
      min(col("norm")).as("min_norm"),
      round(avg(col("norm")), 8).as("avg_norm"),
      max(col("norm")).as("max_norm"))
  }
}
