package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.profile.{ProfileConfig, Profiler}
import graft.queries.{PipelineQueries, QueryCatalog}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each entry in `queries` is one operator from SURVEY §2's inventory;
  * `oracleSql` carries the DuckDB-equivalent SQL for the hash compare. */
object SparkEntry {

  /** Flagship: full profile of sf0.001 lineitem, returned as a one-row
    * summary per column (driver smoke-checks rows > 0). */
  def entry(spark: SparkSession): DataFrame = {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val profile = Profiler.profile(df,
      ProfileConfig.default.copy(
        computeSpearman = true, computeKendall = true))
    import spark.implicits._
    profile.columns.map { c =>
      (c.name, c.profileType.name, c.common.n, c.common.count,
        c.common.nDistinct, c.common.nUnique)
    }.toDF("column", "type", "n", "count", "n_distinct", "n_unique")
  }

  /** The flagship profiler as a bench-visible query: full TableProfile of
    * lineitem at the given scale factor, one summary row per column.
    * No SQL oracle (the whole-profile pipeline is not one SQL query) —
    * the driver records a rows-only check; per-stat correctness is
    * covered by q01-q20's oracles over the same aggregates. */
  private val qProfile = graft.queries.Q(
    "q00_profile_lineitem",
    (s, dir) => {
      // Spearman rides the scale-safe distributed prefix-sum ranking and
      // Kendall the hard-capped pair sample, so both are on in the
      // flagship profile (they were off while rank windows were global).
      val profile = Profiler.profile(
        s.read.parquet(s"$dir/lineitem.parquet"),
        ProfileConfig.default.copy(
          computeSpearman = true, computeKendall = true))
      import s.implicits._
      profile.columns.map { c =>
        (c.name, c.profileType.name, c.common.n, c.common.count,
          c.common.nDistinct, c.common.nUnique, profile.nDuplicates,
          profile.alerts.size.toLong)
      }.toDF("column", "type", "n", "count", "n_distinct", "n_unique",
        "n_duplicates", "n_alerts").orderBy("column")
    },
    None)

  /** The 100 TB operating mode as a bench-visible query: the same
    * flagship profile with SKETCH semantics — HLL++ distinct counts and
    * Greenwald-Khanna quantiles instead of the exact groupBy/sort paths
    * (q00 exercises those for oracle parity). Continuously timed so the
    * configuration a large cluster would actually run has a number every
    * round; its error vs exact is bounded by SketchAccuracySpec. No SQL
    * oracle: sketch outputs are approximate by design. */
  private val qProfileSketch = graft.queries.Q(
    "q00b_profile_sketch",
    (s, dir) => {
      val profile = Profiler.profile(
        s.read.parquet(s"$dir/lineitem.parquet"),
        ProfileConfig.default.copy(
          exactDistinct = false, exactQuantiles = false,
          computeSpearman = true, computeKendall = true))
      import s.implicits._
      profile.columns.map { c =>
        (c.name, c.profileType.name, c.common.n, c.common.count,
          c.common.nDistinct, profile.nDuplicates, profile.alerts.size.toLong)
      }.toDF("column", "type", "n", "count", "n_distinct",
        "n_duplicates", "n_alerts").orderBy("column")
    },
    None)

  private def catalog: Seq[graft.queries.Q] =
    Seq(qProfile, qProfileSketch) ++ QueryCatalog.all ++ PipelineQueries.all ++
      graft.queries.ExtraQueries.all ++ graft.queries.TemporalQueries.all ++
      graft.queries.RelationalQueries.all ++ graft.queries.QualityQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.sql.map(q.name -> _)).toMap
}
