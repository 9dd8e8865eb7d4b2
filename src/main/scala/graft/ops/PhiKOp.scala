package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PhiK

/** phi-k between two (categorical or binned) columns: the contingency
  * table is a distributed groupBy; the chi2 inversion runs on the driver
  * over at most maxCard^2 cells (reference ships whole columns to one
  * node instead, correlations.py:416-521). */
object PhiKOp {

  def phik(df: DataFrame, colA: String, colB: String,
      maxCard: Int = 100): Double = {
    val cells = df
      .select(col(colA).cast("string").as("a"), col(colB).cast("string").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
      .collect()
    val aVals = cells.map(_.getAs[String]("a")).distinct.sorted
    val bVals = cells.map(_.getAs[String]("b")).distinct.sorted
    require(aVals.length <= maxCard && bVals.length <= maxCard,
      s"phik: cardinality ${aVals.length}x${bVals.length} exceeds $maxCard")
    val aIdx = aVals.zipWithIndex.toMap
    val bIdx = bVals.zipWithIndex.toMap
    PhiK.phikFromCounts(
      cells.map(r => (aIdx(r.getAs[String]("a")), bIdx(r.getAs[String]("b")),
        r.getAs[Long]("cnt"))).toSeq,
      aVals.length, bVals.length)
  }
}
