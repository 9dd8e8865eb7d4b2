package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Missingness-pattern analysis — the tabular core of missingno's
  * matrix/dendrogram views (reference `visualisation/missing.py`
  * renders these; the engine-side artifact is the pattern table):
  * which COMBINATIONS of columns go missing together, and how often.
  *
  * One groupBy over the boolean missing-flags (map-side combined;
  * at most 2^k patterns for k columns, in practice a handful), so the
  * full answer costs one scan regardless of data size. Complements
  * q03 (per-column counts) and q37 (pairwise nullity correlation) with
  * the joint view: `(a_missing, b_missing, c_missing) → count`. */
object Completeness {

  /** Returns one row per observed missingness pattern:
    * (`<col>_missing` boolean per input column, cnt, pct of rows),
    * pct rounded to 8 decimals. NaN counts as missing for
    * float/double columns (pandas semantics, matching the profiler's
    * n_missing). */
  def nullPatterns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val flags = cols.map { c =>
      val base = df.schema(c).dataType match {
        case org.apache.spark.sql.types.DoubleType |
            org.apache.spark.sql.types.FloatType =>
          col(c).isNull || isnan(col(c))
        case _ => col(c).isNull
      }
      base.as(s"${c}_missing")
    }
    val grouped = df.select(flags: _*)
      .groupBy(cols.map(c => col(s"${c}_missing")): _*)
      .agg(count(lit(1)).as("cnt"))
      // the <=2^k-row grid feeds both the totals agg and the output —
      // materialize once so the corpus is still scanned exactly once
      .localCheckpoint(false)
    // total via broadcast 1-row aggregate, not a partition-less window:
    // same answer, but no single-task window stage, and the plan-sweep
    // detectors recognize the bounded build side structurally
    val total = broadcast(grouped.agg(sum(col("cnt")).as("__tot")))
    grouped.crossJoin(total)
      .withColumn("pct", round(col("cnt") / col("__tot"), 8))
      .drop("__tot")
      .orderBy(col("cnt").desc +: cols.map(c => col(s"${c}_missing")): _*)
  }
}
