package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association-rule mining (support / confidence / lift) —
  * the market-basket classic, here for behavioral profiling: "users
  * who purchase also click?" Direct second-order signal on any
  * (basket, item) relation.
  *
  * Shape: collapse to DISTINCT (basket, item) presence pairs (one
  * shuffle); item supports by one groupBy; co-occurrence by a
  * self-join ON basket with `itemA < itemB` (each basket joins only
  * its own items — cost Σ|basket|², bounded by the item vocabulary
  * per basket, NOT the corpus; hash-partitioned by basket). Rules are
  * emitted in BOTH directions from the one triangular pair table.
  *
  * All scores are per-row divisions of exact longs (no float
  * aggregation), so results are engine-reproducible at 8 decimals:
  *
  *   support(A→B) = |A∩B| / n_baskets
  *   confidence(A→B) = |A∩B| / |A|
  *   lift(A→B) = |A∩B|·n_baskets / (|A|·|B|)   (symmetric)
  */
object Itemsets {

  /** One row per directed pair with co-occurrence ≥ `minSupportCount`:
    * (antecedent, consequent, support_cnt, support, confidence, lift).
    * Null items are dropped (a missing item is not an item). */
  def pairRules(
      df: DataFrame, basketCol: String, itemCol: String,
      minSupportCount: Long = 1L): DataFrame = {
    val baskets = df
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .where(col("bk").isNotNull && col("it").isNotNull)
      .distinct()
      .localCheckpoint(eager = false) // feeds three derivations below
    val nbRow = baskets.agg(countDistinct(col("bk"))).head()
    require(nbRow.getLong(0) > 0, "no baskets")
    val nb = nbRow.getLong(0)

    val itemCounts = baskets.groupBy("it").agg(count(lit(1)).as("c"))
    val pairCounts = baskets.as("a")
      .join(baskets.as("b"),
        col("a.bk") === col("b.bk") && col("a.it") < col("b.it"))
      .groupBy(col("a.it").as("i1"), col("b.it").as("i2"))
      .agg(count(lit(1)).as("c12"))
      .where(col("c12") >= minSupportCount)

    val directed = pairCounts
      .select(col("i1").as("antecedent"), col("i2").as("consequent"),
        col("c12"))
      .unionByName(pairCounts
        .select(col("i2").as("antecedent"), col("i1").as("consequent"),
          col("c12")))
    directed
      .join(itemCounts.select(col("it").as("antecedent"),
        col("c").as("c1")), "antecedent")
      .join(itemCounts.select(col("it").as("consequent"),
        col("c").as("c2")), "consequent")
      .select(
        col("antecedent"), col("consequent"),
        col("c12").as("support_cnt"),
        round(col("c12") / lit(nb).cast("double"), 8).as("support"),
        round(col("c12") / col("c1").cast("double"), 8).as("confidence"),
        round((col("c12") * lit(nb).cast("double")) /
          (col("c1") * col("c2").cast("double")), 8).as("lift"))
      .orderBy("antecedent", "consequent")
  }
}
