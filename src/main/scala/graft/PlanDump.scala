package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the plan evidence the optimization rounds commit under plans/rNN/.
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>
  * writes <outDir>/<name>_<tag>.txt per query. Queries that execute
  * eager sub-jobs during construction (iterative ops with checkpoint
  * rings) dump the plan of the RETURNED DataFrame — the iteration
  * subplans are behind LogicalRDD checkpoint boundaries by design. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, namesCsv) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    new java.io.File(outDir).mkdirs()
    namesCsv.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val s = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), s)
        System.err.println(s"[plandump] wrote ${n}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
