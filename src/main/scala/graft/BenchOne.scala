package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time a single named query (or all, with live progress on
  * stderr). Same session config as Bench. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wanted = args.toSet
    // SPARK_GRAFT_REPS=n times each query n times in ONE JVM (rep 1 is
    // the cold figure, later reps the warm steady state)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted.contains(n) }
      .foreach { case (name, fn) =>
        (1 to reps).foreach { r =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage.take(200)}") }
          System.err.println(
            f"[bench] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
      }
    spark.stop()
  }
}
