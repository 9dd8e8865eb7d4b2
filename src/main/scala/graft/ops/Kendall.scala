package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kendall rank correlation (tau-b, tie-corrected).
  *
  * The reference computes Kendall by pulling ALL numeric columns to one
  * node through a grouped-map pandas UDF (`correlations.py:140-216`, an
  * acknowledged non-distributed fallback citing arXiv:1704.03767 for a
  * future distributed algorithm). Here: exact tau-b by distributed pair
  * counting — a self-join over a (deterministically sampled, when large)
  * input. O(n^2) pairs shuffled across the cluster rather than one
  * node's memory; for full-table tau at 100 TB, sample first (the
  * estimate's s.e. ~ 1/sqrt(n) makes >10^4 rows statistically pointless).
  */
object Kendall {

  /** All-pairs tau-b matrix in ONE pair join: the row-pair product is
    * materialized once and every column pair's concordant/discordant/tie
    * counts ride the same fused aggregate — p*(p-1)/2 separate tauB
    * calls would re-run the O(n^2) join per column pair (28x the work on
    * an 8-column table). Null handling matches [[tauB]]'s pairwise
    * deletion: a row-pair contributes to a column pair's counts only
    * when all four values are non-null (null arithmetic propagates to
    * the `when` guards, which then take the 0 branch). Input should be
    * a bounded sample (see [[graft.ops.Sampling.hashSampleCapped]]);
    * the sample is checkpointed so the self-join's two sides share one
    * materialization. */
  def tauBMatrix(df: DataFrame, cols: Seq[String]): Map[(String, String), Double] = {
    if (cols.size < 2) return Map.empty
    def q(n: String) = "`" + n.replace("`", "``") + "`"
    val base = df
      .select(cols.map(c => col(q(c)).cast("double").as(c)): _*)
      .withColumn("rid", monotonically_increasing_id())
      .localCheckpoint(false)
    val a = base.as("a"); val b = base.as("b")
    val pairIdx = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (i, j)
    val aggExprs = pairIdx.flatMap { case (i, j) =>
      val dx = col(s"a.${q(cols(i))}") - col(s"b.${q(cols(i))}")
      val dy = col(s"a.${q(cols(j))}") - col(s"b.${q(cols(j))}")
      Seq(
        sum(when(dx * dy > 0, 1L).otherwise(0L)).as(s"c_${i}_$j"),
        sum(when(dx * dy < 0, 1L).otherwise(0L)).as(s"d_${i}_$j"),
        sum(when(dx === 0 && dy =!= 0, 1L).otherwise(0L)).as(s"tx_${i}_$j"),
        sum(when(dy === 0 && dx =!= 0, 1L).otherwise(0L)).as(s"ty_${i}_$j"))
    }
    val r = a.join(b, col("a.rid") < col("b.rid"))
      .agg(aggExprs.head, aggExprs.tail: _*)
      .head()
    def g(k: String): Double =
      Option(r.getAs[Any](k)).map(_.asInstanceOf[Number].doubleValue).getOrElse(0.0)
    pairIdx.map { case (i, j) =>
      val c = g(s"c_${i}_$j"); val d = g(s"d_${i}_$j")
      val tx = g(s"tx_${i}_$j"); val ty = g(s"ty_${i}_$j")
      val denom = (c + d + tx) * (c + d + ty)
      val tau =
        if (denom > 0.0)
          BigDecimal((c - d) / math.sqrt(denom))
            .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
        else Double.NaN
      (cols(i), cols(j)) -> tau
    }.toMap
  }

  /** Driver-side exact tau-b in O(n log n) — Knight's algorithm (Knight
    * 1966, the scipy.stats.kendalltau formulation): sort by (x, y), count
    * x-runs and joint ties, merge-sort-count strict y-inversions (= the
    * discordant pairs), then
    *   tau_b = (cnt - xtie - ytie + ntie - 2*dis) /
    *           sqrt((cnt - xtie) * (cnt - ytie)).
    * This is the right tool for the profiler's HARD-CAPPED sample: 10^4
    * rows is <1 MB on the driver and ~10^5 compare ops per pair, vs
    * 5*10^7 shuffled rows per O(n^2) pair join — and the cap (not this
    * routine) is what bounds the cost at 100 TB. Inputs must be
    * null/NaN-filtered; same 8-decimal rounding as [[tauB]]. */
  def tauBLocal(x0: Array[Double], y0: Array[Double]): Double = {
    val n = x0.length
    require(y0.length == n, "length mismatch")
    if (n < 2) return Double.NaN
    val perm = Array.range(0, n).sortBy(i => (x0(i), y0(i)))
    val x = perm.map(x0); val y = perm.map(y0)
    val cnt = n.toLong * (n - 1) / 2
    var xtie = 0L; var ntie = 0L
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && x(j) == x(i)) j += 1 // x-run [i, j), y asc within
      val t = (j - i).toLong; xtie += t * (t - 1) / 2
      var a = i
      while (a < j) {
        var b = a + 1
        while (b < j && y(b) == y(a)) b += 1
        val u = (b - a).toLong; ntie += u * (u - 1) / 2
        a = b
      }
      i = j
    }
    // strict y-inversions across the x-sorted order = discordant pairs
    // (within an x-run y is ascending, so runs contribute none)
    val dis = countInversions(y.clone())
    val ys = y.sorted
    var ytie = 0L
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && ys(j) == ys(i)) j += 1
      val u = (j - i).toLong; ytie += u * (u - 1) / 2
      i = j
    }
    val conMinusDis = (cnt - xtie - ytie + ntie - 2 * dis).toDouble
    val denom = math.sqrt((cnt - xtie).toDouble * (cnt - ytie).toDouble)
    if (denom > 0.0)
      BigDecimal(conMinusDis / denom)
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    else Double.NaN
  }

  /** Merge sort counting STRICT inversions (a(j) < a(i), i < j). */
  private def countInversions(a: Array[Double]): Long = {
    val buf = new Array[Double](a.length)
    def sort(lo: Int, hi: Int): Long = { // [lo, hi)
      if (hi - lo < 2) return 0L
      val mid = (lo + hi) >>> 1
      var inv = sort(lo, mid) + sort(mid, hi)
      var i = lo; var j = mid; var k = lo
      while (i < mid && j < hi) {
        if (a(j) < a(i)) { inv += mid - i; buf(k) = a(j); j += 1 }
        else { buf(k) = a(i); i += 1 }
        k += 1
      }
      while (i < mid) { buf(k) = a(i); i += 1; k += 1 }
      while (j < hi) { buf(k) = a(j); j += 1; k += 1 }
      System.arraycopy(buf, lo, a, lo, hi - lo)
      inv
    }
    sort(0, a.length)
  }

  /** EXACT distributed tau-b in O(n log n) total work — the SURVEY
    * §2.5 stretch the capped-sample path deferred: Knight's algorithm
    * distributed by GRID DECOMPOSITION instead of the O(n²) pair join
    * (the reference's own Spark path collects the whole table to one
    * node, `correlations.py:140-216`).
    *
    * Decomposition: bucket x and y independently into ≤`buckets`
    * VALUE-RESPECTING ranges (equal values always share a bucket, so
    * bucket order implies strict value order). Every pair then falls
    * in exactly one of four classes:
    *   - different x-bucket AND different y-bucket → concordance is
    *     decided by the bucket pair alone, so the whole class is
    *     counted on the driver from the B×B contingency matrix with
    *     2-D suffix/prefix sums (O(B²), no data movement);
    *   - same x-bucket → discordant pairs counted exactly per x-bucket
    *     group by [[graft.functions.DiscordantPairs]] (Knight's
    *     O(m log m) merge count);
    *   - same y-bucket → same, per y-bucket group;
    *   - same x-bucket AND same y-bucket → counted in BOTH group
    *     passes, subtracted once via the per-cell groups.
    * Q = Q_cross + Σ_bx Q − Σ_cell Q + Σ_by Q; ties (T_x, T_y, T_xy)
    * come from three linear map-side-combinable groupBy counts; then
    * Knight's identity
    *   τ_b = (n0 − T_x − T_y + T_xy − 2Q) / √((n0 − T_x)(n0 − T_y)).
    *
    * Scale shape: per-group work is O((n/B) log(n/B)) and per-group
    * MEMORY is 16·n/B bytes (the aggregate holds its group), so B is
    * chosen so a group fits a task — `maxGroup` is require-guarded
    * BEFORE any aggregate runs (the Transitions.stationary
    * discipline), from the same cheap cell-count pass that feeds the
    * driver matrix. Boundaries come from approxQuantile; the RESULT is
    * exact for ANY value-respecting boundaries (the decomposition is
    * an identity, not an approximation), so quantile error only skews
    * group sizes, never the answer. Output: one row
    * (n, n_pairs, t_x, t_y, t_xy, discordant, tau_b). */
  def tauBExactDistributed(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 64, maxGroup: Long = 20000000L): DataFrame = {
    require(buckets >= 1 && buckets <= 1024, "buckets must be in [1, 1024]")
    val spark = df.sparkSession
    import spark.implicits._
    // normalize -0.0 to 0.0 at the projection: DiscordantPairs sorts
    // with java.lang.Double.compare semantics (-0.0 < 0.0) while the
    // tiePairs groupBy normalizes -0.0 == 0.0 — unnormalized, a
    // (-0.0, 0.0) pair would be counted BOTH as discordant and as a
    // tie, double-counting and skewing tau_b.
    def noNegZero(c: Column): Column = when(c === 0.0, 0.0).otherwise(c)
    val base = df
      .select(noNegZero(col(xCol).cast("double")).as("x"),
        noNegZero(col(yCol).cast("double")).as("y"))
      .where(col("x").isNotNull && col("y").isNotNull &&
        !isnan(col("x")) && !isnan(col("y")))
      .localCheckpoint(false) // one materialization feeds all passes
    val n = base.count()
    def out(tx: Long, ty: Long, txy: Long, q: Long, tau: Any) =
      Seq((n, n * (n - 1) / 2, tx, ty, txy, q,
        tau.asInstanceOf[java.lang.Double]))
        .toDF("n", "n_pairs", "t_x", "t_y", "t_xy", "discordant", "tau_b")
    if (n < 2) return out(0L, 0L, 0L, 0L, null)

    // value-respecting bucket boundaries (distinct quantile cuts); a
    // bucket index is a monotone function of the VALUE, so equal
    // values share a bucket and bucket order implies strict value order
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    def cuts(c: String): Array[Double] =
      if (buckets == 1) Array.empty
      else base.stat.approxQuantile(c, probes, 0.001).distinct.sorted
    val (xCuts, yCuts) = (cuts("x"), cuts("y"))
    def bucketOf(c: Column, bnds: Array[Double]): Column =
      bnds.foldLeft(lit(0))((acc, b) =>
        acc + when(c > lit(b), 1).otherwise(0))
    val grid = base
      .withColumn("bx", bucketOf(col("x"), xCuts))
      .withColumn("by", bucketOf(col("y"), yCuts))

    // contingency matrix: bounded (≤ buckets²); also the maxGroup guard
    val cells = grid.groupBy("bx", "by").count()
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
    val xSizes = cells.groupBy(_._1._1).map { case (k, v) => k -> v.map(_._2).sum }
    val ySizes = cells.groupBy(_._1._2).map { case (k, v) => k -> v.map(_._2).sum }
    val biggest = (xSizes.values ++ ySizes.values).max
    require(biggest <= maxGroup,
      s"largest bucket group has $biggest rows > maxGroup=$maxGroup; " +
        "raise `buckets` (value skew: one value's tie group cannot split)")

    // cross-cell discordant pairs on the driver: for each cell (i, j),
    // partners in a STRICTLY GREATER x-bucket and STRICTLY SMALLER
    // y-bucket; O(B²) via a 2-D suffix(x)/prefix(y) sum
    val bxMax = cells.map(_._1._1).max
    val byMax = cells.map(_._1._2).max
    val m = Array.ofDim[Long](bxMax + 2, byMax + 2)
    cells.foreach { case ((i, j), c) => m(i)(j) = c }
    // s(i)(j) = Σ_{i' >= i} Σ_{j' <= j} m(i')(j')
    val s = Array.ofDim[Long](bxMax + 2, byMax + 2)
    for (i <- bxMax to 0 by -1; j <- 0 to byMax)
      s(i)(j) = m(i)(j) + s(i + 1)(j) +
        (if (j > 0) s(i)(j - 1) - s(i + 1)(j - 1) else 0L)
    var qCross = 0L
    cells.foreach { case ((i, j), c) =>
      if (i + 1 <= bxMax && j > 0) qCross += c * s(i + 1)(j - 1)
    }

    // per-group exact discordant counts (Knight kernel per group)
    import graft.functions.DiscordantPairs.discordant
    def sumQ(groups: Column*): Long = grid.groupBy(groups: _*)
      .agg(discordant(col("x"), col("y")).as("q"))
      .agg(sum(col("q"))).head().getLong(0)
    val qX = sumQ(col("bx"))
    val qY = sumQ(col("by"))
    val qCell = sumQ(col("bx"), col("by"))
    val q = qCross + qX + qY - qCell

    // tie terms: three linear map-side-combinable counts
    // c*(c-1) is even: shiftright halves it exactly in Long arithmetic
    // (the `/` operator is DOUBLE division and would lose precision on
    // big tie groups)
    def tiePairs(groups: Column*): Long = grid.groupBy(groups: _*)
      .agg(count(lit(1)).as("c"))
      .agg(sum(shiftright(col("c") * (col("c") - 1), 1)))
      .head().getLong(0)
    val tX = tiePairs(col("x"))
    val tY = tiePairs(col("y"))
    val tXY = tiePairs(col("x"), col("y"))

    val n0 = n * (n - 1) / 2
    val num = (n0 - tX - tY + tXY - 2 * q).toDouble
    val den = math.sqrt((n0 - tX).toDouble * (n0 - tY).toDouble)
    val tau: java.lang.Double =
      if (den > 0.0)
        BigDecimal(num / den)
          .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      else null
    out(tX, tY, tXY, q, tau)
  }

  /** Exact tau-b between two numeric columns of `df` (pair-count join).
    * Output columns: n, concordant, discordant, tau_b (rounded). */
  def tauB(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.select(col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .withColumn("rid", monotonically_increasing_id())
    val a = base.as("a"); val b = base.as("b")
    val pairs = a.join(b, col("a.rid") < col("b.rid"))
      .select(
        (col("a.x") - col("b.x")).as("dx"),
        (col("a.y") - col("b.y")).as("dy"))
    val agg = pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("dx") * col("dy") > 0, 1L).otherwise(0L)).as("c"),
      sum(when(col("dx") * col("dy") < 0, 1L).otherwise(0L)).as("d"),
      sum(when(col("dx") === 0 && col("dy") =!= 0, 1L).otherwise(0L)).as("tx"),
      sum(when(col("dy") === 0 && col("dx") =!= 0, 1L).otherwise(0L)).as("ty"))
    val denom = (col("c") + col("d") + col("tx")).cast("double") *
      (col("c") + col("d") + col("ty")).cast("double")
    agg.select(
      col("n_pairs"), col("c").as("concordant"), col("d").as("discordant"),
      // constant column => all pairs tied => denom 0: tau undefined (null),
      // not an ANSI divide-by-zero failure
      round(
        when(denom > 0.0,
          (col("c") - col("d")).cast("double") / sqrt(denom)),
        8).as("tau_b"))
  }
}
