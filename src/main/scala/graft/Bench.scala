package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Queries are forced through the noop sink so the full plan executes
  * (a bare count() would let Catalyst prune most of the work).
  *
  * Self-defending measurement (a contended host once recorded 297 s for
  * an ~80 s suite): a warmup action absorbs JVM/codegen startup, every
  * query runs TWICE and reports the min (an OS scheduling stall hits one
  * run, not both), and the JSON carries availableProcessors + the 1-min
  * load average so a polluted run is self-evident from the artifact.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // load average BEFORE this JVM does any work: external contention at
    // entry, unpolluted by the bench's own executor threads
    val loadStart = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet has TIMESTAMP(NANOS); read as nanos-epoch longs
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark) // SQL surface

    // Warmup: exercise scan + shuffle + codegen once, outside any timing.
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }

    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // two full passes, min per query: a transient host stall pollutes one
    // pass; the min of two is the honest steady-state figure. Session
    // caches (shingle table, IVF index) amortize WITHIN a pass — q22/23/24
    // share one shingle build as designed — but are cleared BETWEEN passes
    // so the min still carries each pass's one cold build instead of
    // timing a pure cache hit.
    val pass1 = ordered.map { case (n, f) => n -> timeOnce(n, f) }.toMap
    graft.ops.Dedup.clearShingleCache()
    graft.ops.IvfIndex.clearIndexCache()
    val pass2 = ordered.map { case (n, f) => n -> timeOnce(n, f) }.toMap
    val results = ordered.map { case (n, _) =>
      n -> math.min(pass1(n), pass2(n))
    }

    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val qsBoth = ordered.map { case (n, _) =>
      "\"" + n + f"""\":[${pass1(n)}%.3f,${pass2(n)}%.3f]""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val procs = Runtime.getRuntime.availableProcessors
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val t1 = pass1.values.sum; val t2 = pass2.values.sum
    // self-defense gate: external load at entry, or two passes that
    // disagree by >2x, mean the artifact is a contended measurement —
    // re-run on a quiet host before committing it
    val polluted = loadStart > procs / 4.0 ||
      math.max(t1, t2) > 2.0 * math.min(t1, t2)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","procs":$procs,"loadavg":$load%.2f,"loadavg_start":$loadStart%.2f,"polluted":$polluted,"pass_totals":[$t1%.3f,$t2%.3f],"queries_passes":$qsBoth}""")
    spark.stop()
  }
}
