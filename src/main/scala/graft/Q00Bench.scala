package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time ONLY the flagship q00 profile (with warmup), so the
  * Profiler's GRAFT_VERBOSE pass timings can be read without the noise
  * of the full bench suite. */
object Q00Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_Q00_RUNS", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup: scan + shuffle + codegen
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    val names = sys.env.getOrElse("SPARK_GRAFT_Q00_QUERIES",
      "q00_profile_lineitem").split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    // fail fast BEFORE the session/warmup cost on a typo'd name
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(names.nonEmpty && unknown.isEmpty,
      s"unknown queries $unknown; valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    names.foreach { name =>
      val q = SparkEntry.queries(name)
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        System.err.println(
          f"[q00bench] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
