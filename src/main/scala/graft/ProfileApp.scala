package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

import graft.profile.{ProfileConfig, ProfileHtml, ProfileJson, Profiler, TypeInference}

/** Console entry point — the Scala analogue of the reference's CLI
  * (`controller/console.py:86-109`: file scan -> ProfileReport -> sink).
  *
  * Usage: ProfileApp <input.(parquet|csv|json|orc)> <output.json>
  *          [--minimal] [--sketch] [--infer]
  * --infer runs the value-based type-inference pass (string->bool/
  * numeric/date promotion) before profiling, like the pandas path.
  * --sketch keeps the full stat set but swaps exact distinct/quantiles
  * for HLL++/GK sketches — the 100 TB operating mode (--minimal
  * additionally turns the expensive stats off entirely).
  */
object ProfileApp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which the vectorized
      // reader rejects by default; read as nanos-since-epoch longs.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  /** The whole console flow on a CALLER-OWNED session — split from
    * `main` so ProfileAppSpec can drive the entry point end-to-end
    * (scan dispatch, config flags, sink selection, summary lines)
    * against the suite's shared session without `main`'s
    * `spark.stop()` killing it. */
  def run(spark: SparkSession, args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ProfileApp <input.(parquet|csv|json|orc)> <output.json> [--minimal] [--sketch] [--infer]")
    val input = args(0)
    val output = args(1)
    val minimal = args.contains("--minimal")
    val sketch = args.contains("--sketch")
    val infer = args.contains("--infer")
    val spearman = args.contains("--spearman")
    graft.functions.GraftFunctions.register(spark) // SQL surface

    // Extension-dispatched scan (reference: utils/dataframe.py:24-67);
    // Stata .dta / Excel .xlsx / SAS XPORT .xpt / SAS .sas7bdat ride
    // the native graft DataSource V2 readers (rounds 10-11); HDF and
    // legacy .xls remain unsupported.
    val df = input.replaceAll(".*\\.", "").toLowerCase match {
      case "csv" | "tsv" =>
        spark.read.option("header", "true").option("inferSchema", "true")
          .option("sep", if (input.endsWith(".tsv")) "\t" else ",").csv(input)
      case "json" | "jsonl" => spark.read.json(input)
      case "orc"            => spark.read.orc(input)
      case "dta"            => spark.read.format("graft-stata").load(input)
      case "xlsx"           => spark.read.format("graft-excel").load(input)
      case "xpt"            => spark.read.format("graft-xpt").load(input)
      case "sas7bdat"       => spark.read.format("graft-sas7bdat").load(input)
      case _                => spark.read.parquet(input)
    }

    val cfg0 = if (minimal) ProfileConfig.minimal else ProfileConfig.default
    val cfg = cfg0.copy(
      computeSpearman = cfg0.computeSpearman || spearman,
      exactDistinct = cfg0.exactDistinct && !sketch,
      exactQuantiles = cfg0.exactQuantiles && !sketch)
    val t0 = System.nanoTime()
    val typed = if (infer) TypeInference.castToInferred(df) else df
    val profile = Profiler.profile(typed, cfg)
    val elapsed = (System.nanoTime() - t0) / 1e9

    val rendered =
      if (output.endsWith(".html")) ProfileHtml.toHtml(profile)
      else ProfileJson.toJson(profile)
    Files.writeString(Paths.get(output), rendered)
    println(f"[graft] profiled ${profile.table.n}%d rows x " +
      f"${profile.table.nVar}%d cols in $elapsed%.2fs -> $output")
    println(s"[graft] alerts: ${profile.alerts.size} " +
      profile.alerts.groupBy(_.kind).map { case (k, v) => s"$k=${v.size}" }
        .toSeq.sorted.mkString(", "))
  }
}
