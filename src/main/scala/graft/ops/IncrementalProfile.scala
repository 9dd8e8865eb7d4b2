package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Incremental (mergeable) profiling — the 100 TB operating pattern the
  * monolithic profiler can't serve: summarize each slice (day, source,
  * partition batch) INDEPENDENTLY, persist the small per-column summary
  * rows, and combine any subset later without touching the data again.
  * profile(A ∪ B) == merge(profile(A), profile(B)) holds exactly for
  * counts/min/max/moments (Pébay's pairwise central-moment composition,
  * the textbook parallel-moments formula) and register-losslessly for
  * distinct counts (HLL union is register-wise max — the union's
  * REGISTERS equal the whole-stream sketch's, though its estimate can
  * drift within the sketch's rsd because a unioned sketch falls back
  * from the path-dependent HIP estimator to the composite one; exact in
  * the sparse/coupon regime). Quantiles/top-K are deliberately absent — they need their own
  * mergeable sketches and the profiler's GK/approx_top_k paths cover the
  * single-pass case.
  *
  * Scale design: `summarize` is ONE scan (column melt → groupBy(column),
  * map-side combined; summary size = O(columns), independent of rows).
  * `merge` reduces summary rows per column — pure JVM arithmetic plus
  * DataSketches HLL union (the library Spark's own hll_sketch_agg uses,
  * already on every executor classpath). Nothing in the merge touches
  * the original data.
  */
object IncrementalProfile {

  /** One column's mergeable summary. Central moments are the UNSCALED
    * sums M2 = Σ(x-mean)², M3, M4 over the numeric (castable) values;
    * `hll` is a DataSketches HLL sketch of the value's string form
    * (null when the slice had no non-null values). */
  final case class ColSummary(
      column: String,
      nRows: Long,
      n: Long, // non-null
      nZeros: Long,
      nNum: Long, // numeric (double-castable) non-null
      vMin: Option[Double],
      vMax: Option[Double],
      mean: Double,
      m2: Double,
      m3: Double,
      m4: Double,
      hll: Array[Byte])

  private val LgK = 12 // Spark's hll_sketch_agg default lgConfigK

  /** One-scan per-column summary of `cols` (all columns when empty). */
  def summarize(df: DataFrame, cols: Seq[String] = Nil): Dataset[ColSummary] = {
    val spark = df.sparkSession
    import spark.implicits._
    val use = if (cols.nonEmpty) cols else df.columns.toSeq
    require(use.nonEmpty, "no columns to summarize")
    val structs = use.map { c =>
      struct(
        lit(c).as("c"),
        // try_cast: ANSI mode makes cast() THROW on non-numeric strings
        expr(s"try_cast(`$c` AS DOUBLE)").as("vd"),
        col(c).cast("string").as("vs"))
    }
    df.select(explode(array(structs: _*)).as("x"))
      .select("x.*")
      .groupBy("c")
      .agg(
        count(lit(1)).as("nRows"),
        count(col("vs")).as("n"),
        count(when(col("vd") === 0.0, 1)).as("nZeros"),
        count(col("vd")).as("nNum"),
        min(col("vd")).as("vMin"),
        max(col("vd")).as("vMax"),
        coalesce(avg(col("vd")), lit(0.0)).as("mean"),
        coalesce(var_pop(col("vd")), lit(0.0)).as("varp"),
        skewness(col("vd")).as("skw"),
        kurtosis(col("vd")).as("krt"),
        hll_sketch_agg(col("vs"), lit(LgK)).as("hll"))
      // invert Spark's population stats into unscaled central moments
      // (exactly: skewness = (M3/n)/varp^1.5, kurtosis = (M4/n)/varp²-3)
      .select(
        col("c").as("column"), col("nRows"), col("n"), col("nZeros"),
        col("nNum"), col("vMin"), col("vMax"), col("mean"),
        (col("varp") * col("nNum")).as("m2"),
        when(col("varp") > 0 && col("skw").isNotNull,
          col("skw") * col("nNum") * pow(col("varp"), 1.5))
          .otherwise(0.0).as("m3"),
        when(col("varp") > 0 && col("krt").isNotNull,
          (col("krt") + 3.0) * col("nNum") * pow(col("varp"), 2.0))
          .otherwise(0.0).as("m4"),
        col("hll"))
      .as[ColSummary]
  }

  /** Pébay pairwise composition of two summaries of the same column. */
  def combine(a: ColSummary, b: ColSummary): ColSummary = {
    require(a.column == b.column, s"column mismatch: ${a.column}/${b.column}")
    val (na, nb) = (a.nNum.toDouble, b.nNum.toDouble)
    val (mean, m2, m3, m4) =
      if (a.nNum == 0) (b.mean, b.m2, b.m3, b.m4)
      else if (b.nNum == 0) (a.mean, a.m2, a.m3, a.m4)
      else {
        val nTot = na + nb
        val d = b.mean - a.mean
        val mean = a.mean + d * nb / nTot
        val m2 = a.m2 + b.m2 + d * d * na * nb / nTot
        val m3 = a.m3 + b.m3 +
          d * d * d * na * nb * (na - nb) / (nTot * nTot) +
          3.0 * d * (na * b.m2 - nb * a.m2) / nTot
        val m4 = a.m4 + b.m4 +
          d * d * d * d * na * nb * (na * na - na * nb + nb * nb) /
            (nTot * nTot * nTot) +
          6.0 * d * d * (na * na * b.m2 + nb * nb * a.m2) / (nTot * nTot) +
          4.0 * d * (na * b.m3 - nb * a.m3) / nTot
        (mean, m2, m3, m4)
      }
    ColSummary(
      a.column,
      a.nRows + b.nRows,
      a.n + b.n,
      a.nZeros + b.nZeros,
      a.nNum + b.nNum,
      (a.vMin.toSeq ++ b.vMin.toSeq)
        .reduceOption((x: Double, y: Double) => math.min(x, y)),
      (a.vMax.toSeq ++ b.vMax.toSeq)
        .reduceOption((x: Double, y: Double) => math.max(x, y)),
      mean, m2, m3, m4,
      hllUnion(a.hll, b.hll))
  }

  /** Merge any number of slice summaries into one summary per column
    * (distributed reduceGroups — JVM arithmetic + HLL union only). */
  def merge(summaries: Dataset[ColSummary]): Dataset[ColSummary] = {
    val spark = summaries.sparkSession
    import spark.implicits._
    summaries.groupByKey(_.column).reduceGroups(combine _).map(_._2)
  }

  /** Derived per-column statistics from a (merged) summary: sample
    * std, bias-corrected G1 skewness / G2 excess kurtosis (the
    * reference's conventions), approximate distinct count from the HLL
    * sketch. */
  def stats(summary: Dataset[ColSummary]): DataFrame = {
    val spark = summary.sparkSession
    import spark.implicits._
    summary
      .map { s =>
        val n = s.nNum.toDouble
        val std =
          if (s.nNum >= 2) Some(math.sqrt(s.m2 / (n - 1))) else None
        val g1 =
          if (s.nNum >= 3 && s.m2 > 0) {
            val pop = (s.m3 / n) / math.pow(s.m2 / n, 1.5)
            Some(math.sqrt(n * (n - 1)) / (n - 2) * pop)
          } else None
        val g2 =
          if (s.nNum >= 4 && s.m2 > 0) {
            val pop = n * s.m4 / (s.m2 * s.m2) - 3.0
            Some(((n + 1) * pop + 6) * (n - 1) / ((n - 2) * (n - 3)))
          } else None
        (s.column, s.nRows, s.n, s.nRows - s.n,
          if (s.nRows > 0) (s.nRows - s.n).toDouble / s.nRows else 0.0,
          s.nZeros, hllEstimate(s.hll), s.vMin, s.vMax,
          if (s.nNum > 0) Some(s.mean) else None, std, g1, g2)
      }
      .toDF("column", "n_rows", "n", "n_missing", "p_missing", "n_zeros",
        "n_distinct_approx", "min", "max", "mean", "std", "skewness",
        "kurtosis")
  }

  private def hllUnion(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    import org.apache.datasketches.hll.{HllSketch, Union}
    if (a == null || a.isEmpty) b
    else if (b == null || b.isEmpty) a
    else {
      val u = new Union(LgK)
      u.update(HllSketch.heapify(a))
      u.update(HllSketch.heapify(b))
      u.getResult.toUpdatableByteArray
    }
  }

  /** Rounded HLL estimate (0 for an absent sketch). */
  def hllEstimate(bytes: Array[Byte]): Long = {
    import org.apache.datasketches.hll.HllSketch
    if (bytes == null || bytes.isEmpty) 0L
    else math.round(HllSketch.heapify(bytes).getEstimate)
  }
}
