package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of catalog queries —
  * the per-operator "is this the plan I'd want at 100 TB" review:
  * column pruning (ReadSchema), filter pushdown (PushedFilters),
  * exchange count, broadcast placement, whole-stage-codegen spans.
  *
  * Usage: runMain graft.ExplainApp <name-or-prefix>... — each argument
  * matches any query whose name starts with it (q215 matches
  * q215_range_join_rule). SPARK_GRAFT_SF_DIR overrides the data dir.
  */
object ExplainApp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        println(s"===== $name =====")
        try fn(spark, dir).explain("formatted")
        catch { case e: Exception =>
          println(s"EXPLAIN FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
