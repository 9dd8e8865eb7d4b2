package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the whitening / dimension-
  * reduction stage an embedding-dedup pipeline (SemDeDup, IVF coarse
  * quantizer) runs before clustering at scale.
  *
  * Scale design: the covariance matrix is accumulated in ONE pass with
  * `mapPartitions` — each partition folds its vectors into a local
  * (n, sum[d], upper-Gram[d(d+1)/2]) triple, and the per-partition
  * triples (d² doubles each, independent of row count) reduce on the
  * driver. No shuffle of row data at all: bytes moved = partitions × d²
  * × 8, so 100 TB of 1024-dim embeddings ships a few MB per task. The
  * eigen-decomposition runs driver-side (cyclic Jacobi, d ≤ ~2k) — the
  * d×d problem is constant-size, never data-size. This is the genuine
  * per-partition-imperative case where mapPartitions beats expression
  * trees: d(d+1)/2 covar_samp aggregate expressions would blow codegen
  * limits at d = 64 and re-scan the array per pair.
  */
object Pca {

  final case class PcaModel(
      dim: Int,
      n: Long,
      mean: Array[Double],
      eigenvalues: Array[Double], // descending
      varianceExplained: Array[Double], // eigenvalue / trace
      components: Array[Array[Double]]) // row i = i-th principal axis

  /** One-pass sample covariance matrix (and count/mean) of `vecCol`
    * (array<float>/array<double>); rows that are null or wrong-length
    * are skipped. Returns (cov, mean, n). */
  def covarianceMatrix(
      df: DataFrame,
      vecCol: String,
      dim: Int): (Array[Array[Double]], Array[Double], Long) = {
    require(dim > 0, s"dim must be > 0, got $dim")
    val spark = df.sparkSession
    import spark.implicits._
    val d = dim
    val tri = d * (d + 1) / 2
    val (n, sums, gram) = df
      .select(col(vecCol).cast("array<double>"))
      .as[Seq[Double]]
      .rdd
      .mapPartitions { it =>
        var n = 0L
        val s = new Array[Double](d)
        val g = new Array[Double](tri)
        it.foreach { v =>
          if (v != null && v.length == d) {
            n += 1
            var i = 0
            var t = 0
            while (i < d) {
              val vi = v(i)
              s(i) += vi
              var j = i
              while (j < d) { g(t) += vi * v(j); j += 1; t += 1 }
              i += 1
            }
          }
        }
        Iterator.single((n, s, g))
      }
      .treeReduce { (a, b) =>
        val (na, sa, ga) = a; val (nb, sb, gb) = b
        var i = 0
        while (i < d) { sa(i) += sb(i); i += 1 }
        i = 0
        while (i < tri) { ga(i) += gb(i); i += 1 }
        (na + nb, sa, ga)
      }
    require(n >= 2, s"need >= 2 valid vectors, got $n")
    val mean = sums.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (gram(t) - sums(i) * sums(j) / n) / (n - 1)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
        t += 1
      }
      i += 1
    }
    (cov, mean, n)
  }

  /** Dominant principal component by QUANTIZED power iteration — the
    * oracle-exact sibling of [[fit]]'s Jacobi solve (which no second
    * engine reproduces): quantize the covariance to 10⁻⁸ (exactly the
    * rounding q70's gate already pins cross-engine), then run `steps`
    * power iterations where every step is u = C·v with LEFT-ASSOCIATIVE
    * accumulation, n2 = Σu² left-associative, v' = floor(u/√n2 ·10⁹ +
    * 0.5)/10⁹ — all IEEE operations on identical inputs, and the
    * re-quantization between steps stops last-ulp drift from ever
    * compounding (the q221/q231 trainer contract). Deterministic start
    * v₀ = 1⃗ fixes the eigenvector sign. Returns (v, λ) with v the
    * quantized unit-ish vector after the last step and λ its Rayleigh
    * quotient vᵀCv / vᵀv (left-associative). */
  def topComponentQuantized(cov: Array[Array[Double]], steps: Int = 3)
      : (Array[Double], Double) = {
    require(steps >= 1, "steps must be >= 1")
    val d = cov.length
    // decimal HALF_UP, NOT floor(x·1e8+0.5): the oracle quantizes the
    // covariance with SQL round(·, 8), and q70 pins this exact pairing
    def q8(x: Double) = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val c = Array.tabulate(d, d)((i, j) => q8(cov(i)(j)))
    var v = Array.fill(d)(1.0)
    // reduceLeft (not foldLeft-from-zero) so the float sequence is the
    // SAME tree the generated oracle SQL spells out: ((t0 + t1) + t2)…
    def matvec(x: Array[Double]): Array[Double] =
      Array.tabulate(d)(i =>
        (0 until d).map(j => c(i)(j) * x(j)).reduceLeft(_ + _))
    for (_ <- 1 to steps) {
      val u = matvec(v)
      val n2 = u.map(x => x * x).reduceLeft(_ + _)
      val nm = math.sqrt(n2)
      v = u.map(x => math.floor(x / nm * 1e9 + 0.5) / 1e9)
    }
    val cv = matvec(v)
    val num = (0 until d).map(i => v(i) * cv(i)).reduceLeft(_ + _)
    val den = v.map(x => x * x).reduceLeft(_ + _)
    (v, num / den)
  }

  /** Full PCA: covariance pass + driver-side cyclic Jacobi eigen-solve.
    * `k` keeps the top-k components (default: all). */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int = -1): PcaModel = {
    val (cov, mean, n) = covarianceMatrix(df, vecCol, dim)
    val (values, vectors) = eigenSymmetric(cov)
    val keep = if (k <= 0 || k > dim) dim else k
    val trace = values.sum.max(Double.MinPositiveValue)
    PcaModel(
      dim, n, mean,
      values.take(keep),
      values.take(keep).map(_ / trace),
      vectors.take(keep))
  }

  /** Project `vecCol` onto the model's components: emits (id, scores)
    * with scores(i) = (v - mean) · component_i. Per-partition imperative
    * matrix multiply against the broadcast (small, driver-sized)
    * component matrix — map-only, no shuffle. */
  def project(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: PcaModel): Dataset[(Long, Array[Double])] = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((model.mean, model.components))
    val d = model.dim
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val (mean, comps) = bc.value
        it.collect {
          case (id, v) if v != null && v.length == d =>
            val centered = new Array[Double](d)
            var i = 0
            while (i < d) { centered(i) = v(i) - mean(i); i += 1 }
            val out = new Array[Double](comps.length)
            var c = 0
            while (c < comps.length) {
              val axis = comps(c)
              var s = 0.0
              var j = 0
              while (j < d) { s += axis(j) * centered(j); j += 1 }
              out(c) = s
              c += 1
            }
            (id, out)
        }
      }
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix: returns
    * (eigenvalues descending, eigenvectors as rows, matching order).
    * O(d³) per sweep, converges quadratically; fine to d ~ 2000 on the
    * driver, which is far beyond any embedding width in use. */
  def eigenSymmetric(
      m: Array[Array[Double]],
      maxSweeps: Int = 64,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    val scale = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = 0; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s.max(Double.MinPositiveValue)
    }
    var sweep = 0
    while (sweep < maxSweeps && offDiag() / scale > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s0 => s0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map(i => Array.tabulate(d)(r => v(r)(i))).toArray
    (values, vectors)
  }
}
