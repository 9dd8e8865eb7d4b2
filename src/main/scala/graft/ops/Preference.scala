package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PAIRWISE-preference ranking — the RLHF data primitive: given
  * "(winner, loser)" comparison rows (human preference pairs, A/B
  * eval verdicts, model-vs-model judgments), recover a strength
  * score per item. Bradley–Terry (1952): P(i beats j) =
  * p_i/(p_i + p_j), fit by Hunter's MM iteration (Ann. Statist.
  * 2004):
  *
  *   p_i ← W_i / Σ_{j≠i} m_ij / (p_i + p_j)
  *
  * (W_i = total wins of i, m_ij = games between i and j), then
  * sum-normalized to n (mean 1) each step so runs are comparable.
  * A FIXED iteration count keeps the gate deterministic; scores are
  * rounded once at the end (the per-item denominators sum over the
  * ITEM dimension — a handful of terms, so fixed-decimal rounding
  * absorbs float association differences between engines).
  *
  * Scale shape: the comparison log is corpus-sized — ONE
  * map-side-combined (winner, loser) aggregate is the only big
  * shuffle. The win matrix is item²-dimensioned (items are models /
  * policies / prompt variants — tens, not millions) and is collected
  * to the driver for the MM loop (the k-means-centroid discipline:
  * driver state bounded by the small dimension, never by the
  * corpus). Items that never lost (or never won) still score —
  * MM handles them; a zero-game item is absent from the output.
  *
  * Reference analog: none. Gate q432. */
object Preference {

  def bradleyTerry(pairs: DataFrame, winnerCol: String,
      loserCol: String, iterations: Int = 2): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations must be in [1,100]: $iterations")
    val spark = pairs.sparkSession
    val wins = pairs
      .select(col(winnerCol).cast("string").as("w"),
        col(loserCol).cast("string").as("l"))
      .where(col("w").isNotNull && col("l").isNotNull &&
        col("w") =!= col("l"))
      .groupBy("w", "l").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val items = wins.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val idx = items.zipWithIndex.toMap
    val k = items.length
    val winTot = new Array[Double](k)
    val games = Array.ofDim[Double](k, k)
    wins.foreach { case (w, l, n) =>
      val (i, j) = (idx(w), idx(l))
      winTot(i) += n.toDouble
      games(i)(j) += n.toDouble
      games(j)(i) += n.toDouble
    }
    var p = Array.fill(k)(1.0)
    for (_ <- 1 to iterations) {
      val next = new Array[Double](k)
      var i = 0
      while (i < k) {
        var denom = 0.0
        var j = 0
        while (j < k) {
          if (j != i && games(i)(j) > 0)
            denom += games(i)(j) / (p(i) + p(j))
          j += 1
        }
        next(i) = if (denom > 0) winTot(i) / denom else 0.0
        i += 1
      }
      val s = next.sum
      p = if (s > 0) next.map(_ * k / s) else next
    }
    // rank on the ROUNDED score (item asc tie-break) so any engine
    // replaying the rounded table derives the identical ranking
    val rounded = p.map(x =>
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    val rows = items.zipWithIndex
      .sortBy { case (item, i) => (-rounded(i), item) }
      .zipWithIndex
      .map { case ((item, i), rank) =>
        Row(item, winTot(i).toLong, games(i).sum.toLong, rounded(i),
          (rank + 1))
      }
    val schema = StructType(Seq(
      StructField("item", StringType), StructField("wins", LongType),
      StructField("games", LongType),
      StructField("bt_score", DoubleType),
      StructField("rank", IntegerType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)),
      schema)
  }
}
