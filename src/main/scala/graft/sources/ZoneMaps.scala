package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** File-level zone maps — the data-skipping audit a lakehouse layout
  * review runs: per physical file, row count and the min/max envelope
  * of the pruning columns, plus "would predicate X skip this file
  * entirely" flags. At 100 TB the dominant scan saving is whole-file/
  * row-group skipping on exactly these envelopes (what Delta/Iceberg
  * store as file stats and Parquet stores per row group); computing
  * them from the data itself both audits the layout (are files
  * actually clustered on the filter column?) and predicts a
  * predicate's file-prune rate before anyone runs it.
  *
  * One scan, one groupBy on `input_file_name()` (as many groups as
  * files — bounded by the catalog, uniform by construction). */
object ZoneMaps {

  /** Per-file envelope of one long column: (file, n_rows, min, max),
    * `file` reduced to its basename so results are layout-relative.
    * `prunePredicates` maps an output column name to a (lo, hi)
    * half-open range; the flag is true when the file's envelope is
    * DISJOINT from the range — i.e. a scan with that predicate skips
    * the whole file. */
  def fileZoneMap(
      df: DataFrame, valueCol: String,
      prunePredicates: Map[String, (Long, Long)] = Map.empty): DataFrame = {
    val base = df
      .select(
        regexp_extract(input_file_name(), "[^/]+$", 0).as("file"),
        col(valueCol).cast("long").as("__v"))
      .where(col("__v").isNotNull)
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"),
        min(col("__v")).as("v_min"),
        max(col("__v")).as("v_max"))
    prunePredicates.toSeq.sortBy(_._1).foldLeft(base) {
      case (acc, (name, (lo, hi))) =>
        acc.withColumn(name,
          col("v_max") < lit(lo) || col("v_min") >= lit(hi))
    }
  }
}
