package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of selected catalog
  * queries — the per-operator "is this the plan I'd want at 100 TB"
  * review (broadcast placement, pushed filters, exchange count,
  * whole-stage codegen spans) without running anything.
  *
  * Usage: runMain graft.PlanAudit <sfDir> <prefix>[,<prefix>...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, prefixes) = args
    val wanted = prefixes.split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        println(s"========== $name ==========")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Exception =>
          println(s"EXPLAIN FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
