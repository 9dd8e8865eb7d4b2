package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Vacuous-gate predicate (round-11 hardening): a gate row whose Spark
    * result has ZERO rows hash-matches an empty oracle no matter how
    * wrong the query is — q326's five-table join was "green" for two
    * rounds on empty-vs-empty because its LIKE matched no fixture row.
    * Zero rows is only acceptable when the query is on
    * [[SparkEntry.zeroRowAllowlist]] with a reason pointing at where the
    * non-empty behavior IS exercised. */
  private[graft] def vacuous(name: String, rows: Long): Boolean =
    rows == 0 && !SparkEntry.zeroRowAllowlist.contains(name)

  private[graft] def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** Writes one query result and enforces the zero-row gate: a vacuous
    * result's output is WITHHELD (deleted) so the driver's compare
    * records a hard FAIL ("spark output missing") instead of a green
    * empty-vs-empty hash. Returns the written row count, or -1 if the
    * output was withheld. */
  private[graft] def dumpGated(spark: SparkSession, name: String,
      df: DataFrame, outDir: String): Long = {
    val path = s"$outDir/$name"
    df.coalesce(1).write.mode("overwrite").parquet(path)
    // count from the written files: cheap at gate scale, and it counts
    // exactly what the driver will hash, not a re-execution
    val rows = spark.read.parquet(path).count()
    if (vacuous(name, rows)) {
      System.err.println(s"[verify] $name VACUOUS: 0 rows and not on " +
        "SparkEntry.zeroRowAllowlist -- a zero-row gate certifies " +
        "nothing; output withheld so the compare records a FAIL")
      deleteRecursively(new java.io.File(path))
      -1L
    } else rows
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet has TIMESTAMP(NANOS); read as nanos-epoch longs
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark) // SQL surface
    new java.io.File(outDir).mkdirs()
    // Dev aid: SPARK_GRAFT_ONLY=q65,q66 restricts the dump to queries whose
    // name starts with a listed prefix (driver leaves it unset → full run).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    // oracle_sql.json + the zero-row allowlist are written BEFORE the
    // dump loop (round-15 lesson: both depend only on SparkEntry, and a
    // driver timeout mid-loop used to leave dumped outputs but NO oracle
    // file, so the compare recorded {} — the whole round's correctness
    // signal lost to ordering). Written first, a partial dump still
    // yields partial-but-usable correctness rows.
    val json = SparkEntry.oracleSql
      // keep oracle_sql.json consistent with the dumped subset, so a
      // filtered dev run doesn't flood check_oracle.py with
      // output-missing failures for queries that were never dumped
      .filter { case (name, _) =>
        only.isEmpty || only.exists(name.startsWith) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the allowlist travels with the dump so check_oracle.py (and any
    // future driver-side zero-row lint) applies the same exemptions
    val allowJson = SparkEntry.zeroRowAllowlist
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(
      Paths.get(s"$outDir/zero_row_allowlist.json"), allowJson)
    SparkEntry.queries
      .filter { case (name, _) =>
        only.isEmpty || only.exists(name.startsWith) }
      .foreach { case (name, fn) =>
      try dumpGated(spark, name, fn(spark, sfDir), outDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
