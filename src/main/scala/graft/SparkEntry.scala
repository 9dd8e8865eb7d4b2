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

  /** The COMPOSED flagship on the VALUE gate. q00/q00b keep timing the
    * profiler; this row hash-checks the assembled `TableProfile` — the
    * multi-pass fusion in `Profiler.profile` (pass A scalars, pass B
    * value counts, pass D MAD, pass F duplicates, the alert rules, the
    * demotion decision) re-emitted as one wide per-column table — against
    * a DuckDB oracle that recomputes every stat independently per column.
    * A wiring bug (wrong column↔stat pairing, a dropped alert rule, a
    * broken demotion) that q01–q46's per-stat queries cannot see fails
    * here. Reference lifecycle: `model/describe.py:103-190`,
    * `model/summary.py:263-310`.
    *
    * Exactness contract: integers (counts, distinct, unique, zeros,
    * lengths, mode freq, epochs, duplicates, alert counts) compare raw;
    * min/max are order-independent doubles (raw); mean/std round at 4
    * (cross-engine avg-of-60k-doubles divergence is ~1e-9 on the mean —
    * see q04's convention); median/MAD round at 6 (exact interpolated
    * percentiles, q05/q46's convention; q00c sets exactQuantiles=true).
    * n_alerts_basic counts the integer-threshold column alerts
    * (MISSING/CONSTANT/REJECTED/UNIQUE/HIGH_CARDINALITY/ZEROS/INFINITE/
    * CONSTANT_LENGTH/TYPE_DATE) — the float-threshold rules (SKEWED,
    * UNIFORM) and pair rules (HIGH_CORRELATION) stay spec-covered
    * (AlertsSpec). */
  private val qProfileGate: graft.queries.Q = {
    val numerics = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val strings = Seq("l_returnflag", "l_linestatus")
    val dates = Seq("l_shipdate")
    val lowCat = ProfileConfig.default.lowCategoricalThreshold
    val highCard = ProfileConfig.default.highCardinalityThreshold

    def uniqueSub(c: String) =
      s"""(SELECT count(*) FROM (SELECT $c FROM lineitem
         WHERE $c IS NOT NULL GROUP BY $c HAVING count(*) = 1))"""
    // shared alert terms over the per-column aggregate row `s`
    val baseAlerts =
      s"""CASE WHEN t.n - s.cnt > 0 THEN 1 ELSE 0 END
        + CASE WHEN s.cnt > 0 AND s.n_distinct = 1 THEN 2 ELSE 0 END
        + CASE WHEN s.cnt > 0 AND s.n_unique = s.cnt THEN 1 ELSE 0 END"""
    val nullTail =
      """CAST(NULL AS BIGINT) AS len_min, CAST(NULL AS BIGINT) AS len_max,
         CAST(NULL AS DOUBLE) AS len_mean_r, CAST(NULL AS VARCHAR) AS mode_v,
         CAST(NULL AS BIGINT) AS mode_freq"""
    val nullNum =
      """CAST(NULL AS BIGINT) AS n_zeros, CAST(NULL AS DOUBLE) AS mean_r,
         CAST(NULL AS DOUBLE) AS std_r, CAST(NULL AS DOUBLE) AS min_v,
         CAST(NULL AS DOUBLE) AS max_v, CAST(NULL AS DOUBLE) AS median_r,
         CAST(NULL AS DOUBLE) AS mad_r"""

    def numBlock(c: String) = {
      def gated(e: String, as: String) =
        s"CASE WHEN s.n_distinct <= $lowCat THEN NULL ELSE $e END AS $as"
      s"""SELECT '$c' AS col_name,
        CASE WHEN s.n_distinct <= $lowCat THEN 'Categorical' ELSE 'Numeric' END AS ptype,
        t.n AS n, s.cnt AS n_count, t.n - s.cnt AS n_missing,
        s.n_distinct AS n_distinct, s.n_unique AS n_unique,
        ${gated("s.n_zeros", "n_zeros")}, ${gated("s.mean_r", "mean_r")},
        ${gated("s.std_r", "std_r")}, ${gated("s.min_v", "min_v")},
        ${gated("s.max_v", "max_v")}, ${gated("s.median_r", "median_r")},
        ${gated("s.mad_r", "mad_r")}, $nullTail,
        CAST(NULL AS BIGINT) AS epoch_min, CAST(NULL AS BIGINT) AS epoch_max,
        t.ndup AS n_duplicates,
        CAST($baseAlerts
          + CASE WHEN s.n_distinct <= $lowCat AND s.n_distinct > $highCard THEN 1 ELSE 0 END
          + CASE WHEN s.n_distinct > $lowCat AND s.n_zeros > 0 THEN 1 ELSE 0 END
          + CASE WHEN s.n_distinct > $lowCat AND s.n_inf > 0 THEN 1 ELSE 0 END
          AS BIGINT) AS n_alerts_basic
      FROM tot t CROSS JOIN (SELECT
          count($c) AS cnt, count(DISTINCT $c) AS n_distinct,
          ${uniqueSub(c)} AS n_unique,
          count(CASE WHEN $c = 0 THEN 1 END) AS n_zeros,
          count(CASE WHEN isinf(CAST($c AS DOUBLE)) THEN 1 END) AS n_inf,
          round(avg(CAST($c AS DOUBLE)), 4) AS mean_r,
          round(stddev_samp(CAST($c AS DOUBLE)), 4) AS std_r,
          CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v,
          round(quantile_cont(CAST($c AS DOUBLE), 0.5), 6) AS median_r,
          round((SELECT quantile_cont(abs(CAST(l2.$c AS DOUBLE) - m.med), 0.5)
                 FROM lineitem l2 CROSS JOIN
                   (SELECT quantile_cont(CAST($c AS DOUBLE), 0.5) AS med
                    FROM lineitem) m), 6) AS mad_r
        FROM lineitem) s"""
    }
    def strBlock(c: String) =
      s"""SELECT '$c' AS col_name, 'Categorical' AS ptype,
        t.n AS n, s.cnt AS n_count, t.n - s.cnt AS n_missing,
        s.n_distinct AS n_distinct, s.n_unique AS n_unique,
        $nullNum,
        s.len_min AS len_min, s.len_max AS len_max, s.len_mean_r AS len_mean_r,
        s.mode_v AS mode_v, s.mode_freq AS mode_freq,
        CAST(NULL AS BIGINT) AS epoch_min, CAST(NULL AS BIGINT) AS epoch_max,
        t.ndup AS n_duplicates,
        CAST($baseAlerts
          + CASE WHEN s.n_distinct > $highCard THEN 1 ELSE 0 END
          + CASE WHEN s.cnt > 0 AND s.len_min = s.len_max AND s.n_distinct > 1 THEN 1 ELSE 0 END
          AS BIGINT) AS n_alerts_basic
      FROM tot t CROSS JOIN (SELECT
          count($c) AS cnt, count(DISTINCT $c) AS n_distinct,
          ${uniqueSub(c)} AS n_unique,
          min(length($c)) AS len_min, max(length($c)) AS len_max,
          round(avg(CAST(length($c) AS DOUBLE)), 4) AS len_mean_r,
          (SELECT $c FROM lineitem WHERE $c IS NOT NULL
           GROUP BY $c ORDER BY count(*) DESC, $c LIMIT 1) AS mode_v,
          (SELECT count(*) FROM lineitem WHERE $c IS NOT NULL
           GROUP BY $c ORDER BY count(*) DESC, $c LIMIT 1) AS mode_freq
        FROM lineitem) s"""
    def dateBlock(c: String) =
      s"""SELECT '$c' AS col_name, 'DateTime' AS ptype,
        t.n AS n, s.cnt AS n_count, t.n - s.cnt AS n_missing,
        s.n_distinct AS n_distinct, s.n_unique AS n_unique,
        $nullNum, $nullTail,
        s.epoch_min AS epoch_min, s.epoch_max AS epoch_max,
        t.ndup AS n_duplicates,
        CAST($baseAlerts + 1 AS BIGINT) AS n_alerts_basic
      FROM tot t CROSS JOIN (SELECT
          count($c) AS cnt, count(DISTINCT $c) AS n_distinct,
          ${uniqueSub(c)} AS n_unique,
          epoch_us(min($c)) // 1000000 AS epoch_min,
          epoch_us(max($c)) // 1000000 AS epoch_max
        FROM lineitem) s"""
    val sql =
      s"""WITH tot AS (SELECT count(*) AS n,
           count(*) - (SELECT count(*) FROM (SELECT DISTINCT * FROM lineitem)) AS ndup
           FROM lineitem)
         ${(numerics.map(numBlock) ++ strings.map(strBlock) ++
            dates.map(dateBlock)).mkString("\nUNION ALL\n")}
         ORDER BY col_name"""

    val basicKinds = Set("MISSING", "CONSTANT", "REJECTED", "UNIQUE",
      "HIGH_CARDINALITY", "ZEROS", "INFINITE", "CONSTANT_LENGTH", "TYPE_DATE")
    graft.queries.Q(
      "q00c_profile_gate",
      (s, dir) => {
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types._
        val profile = Profiler.profile(
          s.read.parquet(s"$dir/lineitem.parquet"),
          ProfileConfig.default.copy(exactQuantiles = true))
        def rnd(x: Double, scale: Int): java.lang.Double =
          if (x.isNaN || x.isInfinite) null
          else java.math.BigDecimal.valueOf(x)
            .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue
        def jl(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
        val rows: Seq[Row] = profile.columns.sortBy(_.name).map { c =>
          val alerts = jl(profile.alerts.count(a =>
            a.column.contains(c.name) && basicKinds(a.kind)))
          val common = Seq[Any](c.name, c.profileType.name,
            jl(c.common.n), jl(c.common.count), jl(c.common.nMissing),
            jl(c.common.nDistinct), jl(c.common.nUnique))
          val typedCells: Seq[Any] = c.typed match {
            case nst: graft.profile.NumericStats =>
              Seq(jl(nst.nZeros), rnd(nst.mean, 4), rnd(nst.std, 4),
                java.lang.Double.valueOf(nst.min), java.lang.Double.valueOf(nst.max),
                rnd(nst.median, 6), rnd(nst.mad, 6),
                null, null, null, null, null, null, null)
            case cat: graft.profile.CategoricalStats =>
              val lmin: Any = cat.lengths.map(l => jl(l.minLength)).orNull
              val lmax: Any = cat.lengths.map(l => jl(l.maxLength)).orNull
              val lmean: Any = cat.lengths.map(l => rnd(l.meanLength, 4)).orNull
              Seq(null, null, null, null, null, null, null,
                lmin, lmax, lmean,
                cat.topValues.headOption.map(_._1).orNull,
                cat.topValues.headOption.map(t => jl(t._2)).orNull,
                null, null)
            case dt: graft.profile.DateTimeStats =>
              Seq(null, null, null, null, null, null, null,
                null, null, null, null, null,
                jl(dt.minEpochSec), jl(dt.maxEpochSec))
            case _ =>
              Seq(null, null, null, null, null, null, null,
                null, null, null, null, null, null, null)
          }
          Row.fromSeq(common ++ typedCells ++
            Seq(jl(profile.nDuplicates), alerts))
        }
        val schema = StructType(Seq(
          StructField("col_name", StringType), StructField("ptype", StringType),
          StructField("n", LongType), StructField("n_count", LongType),
          StructField("n_missing", LongType), StructField("n_distinct", LongType),
          StructField("n_unique", LongType), StructField("n_zeros", LongType),
          StructField("mean_r", DoubleType), StructField("std_r", DoubleType),
          StructField("min_v", DoubleType), StructField("max_v", DoubleType),
          StructField("median_r", DoubleType), StructField("mad_r", DoubleType),
          StructField("len_min", LongType), StructField("len_max", LongType),
          StructField("len_mean_r", DoubleType), StructField("mode_v", StringType),
          StructField("mode_freq", LongType), StructField("epoch_min", LongType),
          StructField("epoch_max", LongType), StructField("n_duplicates", LongType),
          StructField("n_alerts_basic", LongType)))
        s.createDataFrame(
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
          .orderBy("col_name")
      },
      Some(sql))
  }

  /** The assembled profile over the STRING-HEAVY table: q00c gates the
    * numeric/temporal assembly on lineitem; this row gates what that
    * one cannot reach — the pass-E character rollups (total/distinct
    * characters per string column, exact while a column has ≤ 1000
    * distinct chars), string length stats, and mode selection — wired
    * through the same multi-pass fusion, against per-column DuckDB
    * recomputation over `documents`. */
  private val qProfileDocsGate: graft.queries.Q = {
    val sql = {
      def strBlock(c: String) =
        s"""SELECT '$c' AS col_name, t.n AS n, s.cnt AS n_count,
          s.n_distinct AS n_distinct, s.n_unique AS n_unique,
          s.len_min AS len_min, s.len_max AS len_max,
          s.len_mean_r AS len_mean_r, s.mode_v AS mode_v,
          s.mode_freq AS mode_freq,
          s.n_chars AS n_chars, s.n_chars_distinct AS n_chars_distinct,
          CAST(NULL AS DOUBLE) AS mean_r, CAST(NULL AS DOUBLE) AS min_v,
          CAST(NULL AS DOUBLE) AS max_v
        FROM (SELECT count(*) AS n FROM documents) t CROSS JOIN (SELECT
            count($c) AS cnt, count(DISTINCT $c) AS n_distinct,
            (SELECT count(*) FROM (SELECT $c FROM documents
              WHERE $c IS NOT NULL GROUP BY $c
              HAVING count(*) = 1)) AS n_unique,
            min(length($c)) AS len_min, max(length($c)) AS len_max,
            round(avg(CAST(length($c) AS DOUBLE)), 4) AS len_mean_r,
            (SELECT $c FROM documents WHERE $c IS NOT NULL
             GROUP BY $c ORDER BY count(*) DESC, $c LIMIT 1) AS mode_v,
            (SELECT count(*) FROM documents WHERE $c IS NOT NULL
             GROUP BY $c ORDER BY count(*) DESC, $c LIMIT 1) AS mode_freq,
            CAST(sum(length($c)) AS BIGINT) AS n_chars,
            (SELECT count(DISTINCT ch) FROM (SELECT
              unnest(string_split($c, '')) AS ch FROM documents)
              WHERE length(ch) > 0) AS n_chars_distinct
          FROM documents) s"""
      def numBlock(c: String) =
        s"""SELECT '$c' AS col_name, t.n AS n, s.cnt AS n_count,
          s.n_distinct AS n_distinct, s.n_unique AS n_unique,
          CAST(NULL AS BIGINT) AS len_min, CAST(NULL AS BIGINT) AS len_max,
          CAST(NULL AS DOUBLE) AS len_mean_r,
          CAST(NULL AS VARCHAR) AS mode_v, CAST(NULL AS BIGINT) AS mode_freq,
          CAST(NULL AS BIGINT) AS n_chars,
          CAST(NULL AS BIGINT) AS n_chars_distinct,
          s.mean_r AS mean_r, s.min_v AS min_v, s.max_v AS max_v
        FROM (SELECT count(*) AS n FROM documents) t CROSS JOIN (SELECT
            count($c) AS cnt, count(DISTINCT $c) AS n_distinct,
            (SELECT count(*) FROM (SELECT $c FROM documents
              WHERE $c IS NOT NULL GROUP BY $c
              HAVING count(*) = 1)) AS n_unique,
            round(avg(CAST($c AS DOUBLE)), 4) AS mean_r,
            CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v
          FROM documents) s"""
      (Seq("lang", "source", "text").map(strBlock) ++
        Seq("doc_id", "n_chars").map(numBlock))
        .mkString("\nUNION ALL\n") + "\nORDER BY col_name"
    }
    graft.queries.Q(
      "q00d_profile_docs_gate",
      (s, dir) => {
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types._
        val profile = Profiler.profile(
          s.read.parquet(s"$dir/documents.parquet"),
          ProfileConfig.default.copy(
            computeCorrelations = false, computeCramers = false))
        def rnd4(x: Double): java.lang.Double =
          if (x.isNaN || x.isInfinite) null
          else java.math.BigDecimal.valueOf(x)
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
        def jl(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
        val rows: Seq[Row] = profile.columns.sortBy(_.name).map { c =>
          val common = Seq[Any](c.name, jl(c.common.n), jl(c.common.count),
            jl(c.common.nDistinct), jl(c.common.nUnique))
          val cells: Seq[Any] = c.typed match {
            case cat: graft.profile.CategoricalStats =>
              Seq(
                cat.lengths.map(l => jl(l.minLength)).orNull,
                cat.lengths.map(l => jl(l.maxLength)).orNull,
                cat.lengths.map(l => rnd4(l.meanLength)).orNull,
                cat.topValues.headOption.map(_._1).orNull,
                cat.topValues.headOption.map(t => jl(t._2)).orNull,
                cat.chars.map(ch => jl(ch.nCharacters)).orNull,
                cat.chars.map(ch => jl(ch.nCharactersDistinct)).orNull,
                null, null, null)
            case nst: graft.profile.NumericStats =>
              Seq(null, null, null, null, null, null, null,
                rnd4(nst.mean), java.lang.Double.valueOf(nst.min),
                java.lang.Double.valueOf(nst.max))
            case _ => Seq.fill(10)(null)
          }
          Row.fromSeq(common ++ cells)
        }
        val schema = StructType(Seq(
          StructField("col_name", StringType), StructField("n", LongType),
          StructField("n_count", LongType),
          StructField("n_distinct", LongType),
          StructField("n_unique", LongType),
          StructField("len_min", LongType), StructField("len_max", LongType),
          StructField("len_mean_r", DoubleType),
          StructField("mode_v", StringType),
          StructField("mode_freq", LongType),
          StructField("n_chars", LongType),
          StructField("n_chars_distinct", LongType),
          StructField("mean_r", DoubleType), StructField("min_v", DoubleType),
          StructField("max_v", DoubleType)))
        s.createDataFrame(
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
          .orderBy("col_name")
      },
      Some(sql))
  }

  private def catalog: Seq[graft.queries.Q] =
    Seq(qProfile, qProfileSketch, qProfileGate, qProfileDocsGate) ++
      QueryCatalog.all ++ PipelineQueries.all ++
      graft.queries.ExtraQueries.all ++ graft.queries.TemporalQueries.all ++
      graft.queries.RelationalQueries.all ++ graft.queries.QualityQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** Queries for which an EMPTY result is the correct, separately-proven
    * answer — the ONLY names the zero-row vacuous-gate detector
    * ([[Verify.dumpGated]] on the correctness side, Bench's pass-1 row
    * observation on the timing side) lets through with 0 rows. A
    * zero-row gate hash-matches an empty oracle no matter how wrong the
    * query is (empty-vs-empty certified q326's five-table join for two
    * rounds), so every entry here must say where the operator's
    * NON-EMPTY behavior is exercised instead. */
  val zeroRowAllowlist: Map[String, String] = Map(
    "q27_embed_neardup" -> ("correct-by-construction: the embeddings " +
      "fixture has no near-dup pair at cos >= 0.8 at any scale, and a " +
      "near-dup detector must return nothing on dup-free data; the " +
      "operator's non-empty discriminating behavior (planted-pair " +
      "recall, candidate selectivity) is proven on planted near-dup " +
      "clusters in OpsSpec/DedupSpec."))

  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.sql.map(q.name -> _)).toMap
}
