package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed tie-averaged ranking without global windows.
  *
  * `rank().over(Window.orderBy(v))` forces the whole table onto ONE
  * reducer (Spark logs "WindowExec: No Partition Defined"); at 100 TB
  * that is a single-machine sort. Here ranks come from the per-value
  * COUNT table via a two-phase distributed prefix sum:
  *
  *   1. groupBy(key, v) -> counts (one hash shuffle, combiner-side);
  *   2. repartitionByRange by (key, v) + sortWithinPartitions — each
  *      range partition holds a contiguous slice of the value domain;
  *   3. one bounded pass collects per-(partition, key) subtotals
  *      (<= partitions x keys rows to the driver), the driver prefix-sums
  *      them into start offsets, broadcasts;
  *   4. a narrow mapPartitions emits avgrank = offset + cum + (cnt+1)/2.
  *
  * No stage ever sees more than its range slice; every shuffle is
  * hash/range partitioned. Reference semantics: tie-averaged ranks as in
  * pandas-profiling's Spearman (reference correlations.py:41-87), where
  * avg rank of value v = #(strictly smaller) + (count(v)+1)/2.
  */
object Ranking {

  /** Tie-averaged rank table for melted (key, value) rows.
    *
    * Input must have a string column `keyCol` and a double column `vCol`
    * with nulls/NaNs already filtered. Returns one row per distinct
    * (key, value): (keyCol, vCol, avgrank). Ranks are 1-based within each
    * key, ties averaged — exactly
    * `rank().over(Window.partitionBy(key).orderBy(v)) + (cnt-1)/2`.
    *
    * Runs two Spark jobs (subtotals + result materialization is left to
    * the caller); the intermediate count table is range-partitioned and
    * persisted so both jobs read the same partitioning.
    */
  def avgRanks(kv: DataFrame, keyCol: String, vCol: String, parts: Int = 0): DataFrame =
    avgRanksFromCounts(
      kv.groupBy(col(keyCol), col(vCol)).agg(count(lit(1)).as("cnt")),
      keyCol, vCol, parts)

  /** [[avgRanks]] starting from a PRECOMPUTED per-(key, value) count
    * table — lets a caller that already has the counts (e.g. the
    * profiler's value-counts pass) skip the groupBy shuffle entirely. */
  def avgRanksFromCounts(countsIn: DataFrame, keyCol: String, vCol: String,
      parts: Int = 0): DataFrame = {
    val spark = countsIn.sparkSession
    import spark.implicits._
    val p =
      if (parts > 0) parts
      else spark.sessionState.conf.numShufflePartitions
    val counts = countsIn.select(
      col(keyCol).as("k"), col(vCol).as("v"), col("cnt"))
    val ranged: Dataset[(String, Double, Long)] = counts
      .repartitionByRange(p, col("k"), col("v"))
      .sortWithinPartitions("k", "v")
      .select(col("k"), col("v").cast("double"), col("cnt"))
      .as[(String, Double, Long)]
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Phase 1: per-(partition, key) subtotals -> driver (bounded by p*keys).
    val subtotals: Array[(Int, String, Long)] = ranged
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val sums = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { case (k, _, n) => sums.update(k, sums.getOrElse(k, 0L) + n) }
        sums.iterator.map { case (k, n) => (pid, k, n) }
      }
      .collect()
    val offsets: Map[(Int, String), Long] = subtotals
      .groupBy(_._2)
      .flatMap { case (k, arr) =>
        var cum = 0L
        arr.sortBy(_._1).map { case (pid, _, n) =>
          val entry = ((pid, k), cum); cum += n; entry
        }
      }
    val bc = spark.sparkContext.broadcast(offsets)

    // Phase 2: narrow cumulative pass over the same sorted partitions.
    val ranks = ranged
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var curKey: String = null
        var cum = 0L
        it.map { case (k, v, n) =>
          if (k != curKey) {
            curKey = k
            cum = bc.value.getOrElse((pid, k), 0L)
          }
          val r = cum + (n + 1) / 2.0
          cum += n
          (k, v, r)
        }
      }
      .toDF(keyCol, vCol, "avgrank")
      // eager localCheckpoint pins the RESULT (same size class as the
      // count table) and cuts the lineage to `ranged`/`bc`, so both can
      // be released NOW instead of leaking until the ContextCleaner runs;
      // the checkpoint RDD itself is reclaimed when the returned frame
      // goes out of scope
      .localCheckpoint(true)
    ranged.unpersist(false)
    bc.destroy()
    ranks
  }

  /** Single-column convenience: tie-averaged rank per distinct value of
    * `vCol` in `df` (nulls and NaNs dropped). Returns (vCol, avgrank). */
  def avgRankTable(df: DataFrame, vCol: String, parts: Int = 0): DataFrame = {
    val kv = df
      .select(lit("_").as("__k"), col(vCol).cast("double").as("__v"))
      .where(col("__v").isNotNull && !col("__v").isNaN)
    avgRanks(kv, "__k", "__v", parts).select(col("__v").as(vCol), col("avgrank"))
  }

  /** Exact WEIGHTED quantiles — the token-mass/row-weight flavor every
    * mix-planning step needs ("the median document BY TOKEN COUNT", not
    * by row): the lower weighted quantile, smallest v whose cumulative
    * weight reaches q·W. Integer weights and exact integer cumulative
    * sums mean every boundary comparison is bit-stable across engines.
    *
    * Reuses [[avgRanksFromCounts]] with per-value WEIGHT sums as the
    * counts: avgrank = cumw_prev + (w+1)/2, so cumw_hi = avgrank +
    * (w−1)/2 exactly (half-integers are exact doubles until 2^52) —
    * the same range-partitioned prefix pass, no global window. Rows
    * with null/NaN values or weights that ROUND to a non-positive
    * integer are dropped (a zero-weight value must not be selectable
    * as a quantile; fractional weights quantize to nearest-integer —
    * pre-scale them if sub-unit resolution matters). Returns
    * one row per requested q: (q, value), ordered by q. */
  def weightedQuantiles(
      df: DataFrame, vCol: String, wCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.forall(q => q >= 0 && q <= 1), "quantiles must be in [0,1]")
    val v = col(vCol).cast("double")
    // round, don't truncate: a 0.9 weight must not silently vanish
    // (fractional weights are quantized to the nearest integer)
    val w = round(col(wCol).cast("double"), 0).cast("long")
    val counts = df
      .where(v.isNotNull && !v.isNaN && w.isNotNull && w > 0)
      .select(lit("_").as("__k"), v.as("__v"), w.as("__w"))
      .groupBy("__k", "__v").agg(sum(col("__w")).as("cnt"))
      .localCheckpoint()
    val totRow = counts.agg(sum(col("cnt"))).head()
    require(!totRow.isNullAt(0),
      s"no rows with live `$vCol` and positive `$wCol`")
    val total = totRow.getLong(0)
    val cum = counts.join(avgRanksFromCounts(counts, "__k", "__v"),
        Seq("__k", "__v"))
      .withColumn("__cumhi",
        col("avgrank") + (col("cnt") - lit(1L)) / lit(2.0))
    val qFrame = counts.sparkSession.range(1)
      .select(explode(array(qs.map(lit): _*)).as("q"))
    cum.crossJoin(broadcast(qFrame))
      .where(col("__cumhi") >= col("q") * lit(total.toDouble))
      .groupBy("q").agg(min(col("__v")).as("value"))
      .orderBy("q")
  }

  /** Percentile-rank ENCODING table: distinct value → tie-averaged
    * rank / n, exactly pandas `Series.rank(pct=True)` — the monotone,
    * outlier-proof feature transform. Vocabulary-sized output (join it
    * back to rows to encode); same range-partitioned prefix-sum
    * ranking as [[avgRankTable]] plus one count of the live rows — no
    * global window, no sort of the full data. pct_rank is rounded to
    * 8 decimals. */
  def pctRankTable(df: DataFrame, vCol: String, parts: Int = 0): DataFrame = {
    // ONE scan: the per-value count table feeds both the denominator
    // (vocabulary-sized sum) and the ranking (avgRanksFromCounts —
    // the API built for skipping the repeat groupBy)
    val counts = df
      .select(lit("_").as("__k"), col(vCol).cast("double").as("__v"))
      .where(col("__v").isNotNull && !col("__v").isNaN)
      .groupBy("__k", "__v").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val nRow = counts.agg(sum(col("cnt"))).head()
    require(!nRow.isNullAt(0), s"no non-null, non-NaN values in `$vCol`")
    val n = nRow.getLong(0)
    avgRanksFromCounts(counts, "__k", "__v", parts)
      .select(col("__v").as(vCol),
        round(col("avgrank") / n, 8).as("pct_rank"))
  }
}
