package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins.
  *
  * At 100 TB the dominant join cost is the shuffle. When both sides of
  * a recurring join are written bucketed AND sorted on the join key
  * with the same bucket count, Spark's scan reports a matching
  * `HashPartitioning(key, n)` output partitioning and the sort-merge
  * join compiles with NO Exchange on either side — the join runs
  * map-side, bucket i against bucket i (BucketingSpec asserts the
  * exchange-free plan). This is the layout a pipeline persists for its
  * fact/dimension tables once and amortizes over every downstream run.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external parquet table at `path`.
    * Bucketing metadata lives in the session catalog (`saveAsTable` is
    * required — a bare `parquet(path)` write cannot record buckets). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Equi-join two bucketed tables on their bucket key. The MERGE hint
    * pins sort-merge (a broadcast would also avoid the shuffle but
    * hides whether bucketing did its job). */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).hint("MERGE")
      .join(spark.table(rightTable), key)
}
