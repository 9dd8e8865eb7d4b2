package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double = 1e-9) =
    math.abs(a - b) <= tol * (1.0 + math.abs(a) + math.abs(b))

  // deterministic pseudo-random vectors with correlated dims
  private lazy val vecs: Seq[(Long, Seq[Double])] = (0 until 300).map { i =>
    val r1 = math.sin(i * 12.9898) * 43758.5453 % 1.0
    val r2 = math.sin(i * 78.233) * 12543.853 % 1.0
    val r3 = math.sin(i * 3.1415) * 9631.7 % 1.0
    // dim0 dominates variance; dim1 correlates with dim0; dim2/3 small
    (i.toLong, Seq(10.0 * r1, 5.0 * r1 + r2, r3, 0.1 * r2))
  }
  private lazy val df = vecs.toDF("id", "v")

  test("covarianceMatrix matches covar_samp entry-for-entry") {
    val (cov, mean, n) = Pca.covarianceMatrix(df, "v", 4)
    assert(n == 300)
    val exact = df.select(
      (0 until 4).map(i => avg(element_at(col("v"), i + 1)).as(s"m$i")) ++
        (for { i <- 0 until 4; j <- i until 4 } yield covar_samp(
          element_at(col("v"), i + 1), element_at(col("v"), j + 1))
          .as(s"c_${i}_$j")): _*).head()
    for (i <- 0 until 4) assert(approx(mean(i), exact.getDouble(i)),
      s"mean $i: ${mean(i)} vs ${exact.getDouble(i)}")
    var k = 4
    for { i <- 0 until 4; j <- i until 4 } {
      assert(approx(cov(i)(j), exact.getDouble(k)),
        s"cov($i,$j): ${cov(i)(j)} vs ${exact.getDouble(k)}")
      k += 1
    }
  }

  test("covarianceMatrix skips null and wrong-length vectors") {
    val messy = (vecs.map { case (i, v) => (i, v) } ++
      Seq((1000L, null.asInstanceOf[Seq[Double]]), (1001L, Seq(1.0, 2.0))))
      .toDF("id", "v")
    val (cov, _, n) = Pca.covarianceMatrix(messy, "v", 4)
    val (cov0, _, n0) = Pca.covarianceMatrix(df, "v", 4)
    assert(n == n0)
    // partition boundaries shift with the extra rows -> ulp-level drift
    assert(approx(cov(0)(0), cov0(0)(0), 1e-12))
  }

  test("eigenSymmetric solves a known 2x2 exactly") {
    val (values, vectors) = Pca.eigenSymmetric(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(approx(values(0), 3.0) && approx(values(1), 1.0))
    val s = 1.0 / math.sqrt(2.0)
    // eigenvector signs are arbitrary: compare absolute components
    assert(approx(math.abs(vectors(0)(0)), s) &&
      approx(math.abs(vectors(0)(1)), s))
    assert(approx(math.abs(vectors(1)(0)), s) &&
      approx(math.abs(vectors(1)(1)), s))
  }

  test("eigen decomposition reconstructs the covariance matrix") {
    val (cov, _, _) = Pca.covarianceMatrix(df, "v", 4)
    val (values, vectors) = Pca.eigenSymmetric(cov)
    // descending, non-negative (covariance is PSD)
    assert(values.sameElements(values.sortBy(-_)))
    assert(values.forall(_ >= -1e-9))
    // orthonormal rows
    for { a <- 0 until 4; b <- 0 until 4 } {
      val dot = (0 until 4).map(i => vectors(a)(i) * vectors(b)(i)).sum
      assert(approx(dot, if (a == b) 1.0 else 0.0, 1e-8))
    }
    // V^T diag(l) V == cov
    for { i <- 0 until 4; j <- 0 until 4 } {
      val r = (0 until 4).map(k => values(k) * vectors(k)(i) * vectors(k)(j)).sum
      assert(approx(r, cov(i)(j), 1e-8), s"recon($i,$j)")
    }
  }

  test("fit finds the dominant direction and normalizes variance") {
    val model = Pca.fit(df, "v", 4)
    assert(approx(model.varianceExplained.sum, 1.0, 1e-9))
    // dim0/dim1 carry nearly all variance: top component lives there
    val c = model.components(0)
    assert(math.abs(c(0)) > 0.5 && math.abs(c(2)) < 0.2 &&
      math.abs(c(3)) < 0.2)
    assert(model.varianceExplained(0) > 0.5)
  }

  test("project with all components is an isometry on centered data") {
    val model = Pca.fit(df, "v", 4)
    val proj = Pca.project(df, "id", "v", model).collect().toMap
    val orig = vecs.toMap
    // distances between row pairs are preserved under the rotation
    for (Seq(a, b) <- Seq(Seq(0L, 1L), Seq(5L, 17L), Seq(100L, 250L))) {
      val d0 = math.sqrt((0 until 4)
        .map(i => math.pow(orig(a)(i) - orig(b)(i), 2)).sum)
      val d1 = math.sqrt((0 until 4)
        .map(i => math.pow(proj(a)(i) - proj(b)(i), 2)).sum)
      assert(approx(d0, d1, 1e-8), s"distance $a-$b: $d0 vs $d1")
    }
    // projections of centered data average to ~0 per component
    val n = proj.size
    for (i <- 0 until 4) {
      val m = proj.values.map(_(i)).sum / n
      assert(math.abs(m) < 1e-9, s"component $i mean $m")
    }
  }
}
