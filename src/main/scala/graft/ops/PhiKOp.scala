package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PhiK

/** phi-k between two (categorical or binned) columns: the contingency
  * table is a distributed groupBy; the chi2 inversion runs on the driver
  * over at most maxCard^2 cells (reference ships whole columns to one
  * node instead, correlations.py:416-521). */
object PhiKOp {

  /** Distributed contingency collection shared by [[phik]] and
    * [[phikStages]]: (indexed cells, r, k). */
  private def contingency(df: DataFrame, colA: String, colB: String,
      maxCard: Int): (Seq[(Int, Int, Long)], Int, Int) = {
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
    (cells.map(r => (aIdx(r.getAs[String]("a")), bIdx(r.getAs[String]("b")),
      r.getAs[Long]("cnt"))).toSeq, aVals.length, bVals.length)
  }

  def phik(df: DataFrame, colA: String, colB: String,
      maxCard: Int = 100): Double = {
    val (cells, r, k) = contingency(df, colA, colB, maxCard)
    PhiK.phikFromCounts(cells, r, k)
  }

  /** The oracle-portable stages of one phik pair, off the SAME
    * distributed contingency + driver chi2 code path [[phik]] uses
    * ([[graft.functions.PhiK.chi2Stages]]): (n, r_bins, k_bins,
    * chi2Obs, pedestal, target). The BVN inversion that maps `target`
    * to phik has no independent engine and stays covered by PhiKSpec's
    * identity tests. */
  def phikStages(df: DataFrame, colA: String, colB: String,
      maxCard: Int = 100): (Long, Int, Int, Double, Double, Double) = {
    val (cells, r, k) = contingency(df, colA, colB, maxCard)
    val (n, chi2, pedestal, target) = PhiK.chi2Stages(cells, r, k)
    (n.toLong, r, k, chi2, pedestal, target)
  }
}
