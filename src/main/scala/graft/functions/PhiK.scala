package graft.functions

import org.apache.commons.math3.analysis.solvers.BrentSolver
import org.apache.commons.math3.distribution.NormalDistribution

/** The phi-k correlation coefficient (Baak, Koopman, Snoek, Klous,
  * "A new correlation coefficient between categorical, ordinal and
  * interval variables with Pearson characteristics", arXiv:1811.11440 —
  * public algorithm).
  *
  * phik is defined through a bivariate-normal model: given an observed
  * r x k contingency table, find the correlation rho for which a
  * standard bivariate normal, discretized on bins matching the observed
  * marginals, reproduces the observed chi-square. The reference computes
  * this by shipping all columns to one node through a pandas UDF
  * (`correlations.py:416-521`); here the contingency table comes from a
  * distributed groupBy and only the (tiny) numerics run on the driver.
  *
  * Numerics: marginal bin edges via the normal quantile function;
  * bivariate-normal rectangle probabilities via the single-integral
  * identity Phi2(h,k,rho) = Phi(h)Phi(k) +
  * (1/2pi) Int_0^rho exp(-(h^2 - 2 t h k + k^2)/(2(1-t^2)))/sqrt(1-t^2) dt
  * evaluated with fixed Gauss-Legendre quadrature; rho solved by Brent.
  * The sample-noise pedestal is subtracted as E[chi2 | independence] =
  * (r-1)(k-1), the paper's leading-order correction.
  */
object PhiK {

  private val stdNormal = new NormalDistribution(0.0, 1.0)

  // 48-point Gauss-Legendre nodes/weights on [-1, 1], generated from
  // commons-math at first use (deterministic).
  private lazy val (glNodes, glWeights): (Array[Double], Array[Double]) = {
    val factory =
      new org.apache.commons.math3.analysis.integration.gauss.GaussIntegratorFactory()
    val gi = factory.legendre(48, -1.0, 1.0)
    (Array.tabulate(48)(gi.getPoint), Array.tabulate(48)(gi.getWeight))
  }

  /** P(X <= h, Y <= k) for standard bivariate normal with correlation rho. */
  def bvnCdf(h: Double, k: Double, rho: Double): Double = {
    if (h.isPosInfinity && k.isPosInfinity) return 1.0
    if (h.isNegInfinity || k.isNegInfinity) return 0.0
    if (h.isPosInfinity) return stdNormal.cumulativeProbability(k)
    if (k.isPosInfinity) return stdNormal.cumulativeProbability(h)
    val base = stdNormal.cumulativeProbability(h) * stdNormal.cumulativeProbability(k)
    if (math.abs(rho) < 1e-12) return base
    // integrate t from 0 to rho
    val half = rho / 2.0
    var integral = 0.0
    var i = 0
    while (i < glNodes.length) {
      val t = half * (glNodes(i) + 1.0) // map [-1,1] -> [0, rho]
      val omt2 = 1.0 - t * t
      integral += glWeights(i) *
        math.exp(-(h * h - 2.0 * t * h * k + k * k) / (2.0 * omt2)) /
        math.sqrt(omt2)
      i += 1
    }
    base + integral * half / (2.0 * math.Pi)
  }

  /** Expected chi-square of the discretized bivariate normal at
    * correlation rho, for marginal probabilities pRow/pCol, n samples. */
  def chi2FromRho(rho: Double, pRow: Array[Double], pCol: Array[Double],
      n: Double): Double = {
    def edges(p: Array[Double]): Array[Double] = {
      val e = new Array[Double](p.length + 1)
      e(0) = Double.NegativeInfinity
      var cum = 0.0
      var i = 0
      while (i < p.length - 1) {
        cum += p(i)
        e(i + 1) = stdNormal.inverseCumulativeProbability(math.min(cum, 1.0 - 1e-12))
        i += 1
      }
      e(p.length) = Double.PositiveInfinity
      e
    }
    val re = edges(pRow); val ce = edges(pCol)
    var chi2 = 0.0
    for (i <- pRow.indices; j <- pCol.indices) {
      val pij = bvnCdf(re(i + 1), ce(j + 1), rho) -
        bvnCdf(re(i), ce(j + 1), rho) -
        bvnCdf(re(i + 1), ce(j), rho) +
        bvnCdf(re(i), ce(j), rho)
      val e = pRow(i) * pCol(j)
      if (e > 1e-14) {
        val d = pij - e
        chi2 += d * d / e
      }
    }
    n * chi2
  }

  /** The PORTABLE stages of phik — observed chi-square, the sample-noise
    * pedestal E[chi2 | independence] = (r−1)(k−1), and their clamped
    * difference (the BVN-inversion target) — factored out so they can
    * sit on the value-equality oracle gate (the inversion itself has no
    * second engine and stays spec-covered by PhiKSpec identities).
    * Returns (n, chi2Obs, pedestal, target). */
  def chi2Stages(cells: Seq[(Int, Int, Long)], nRows: Int,
      nCols: Int): (Double, Double, Double, Double) = {
    val n = cells.map(_._3).sum.toDouble
    if (n <= 0) return (0.0, 0.0, 0.0, 0.0)
    val rowTot = new Array[Double](nRows)
    val colTot = new Array[Double](nCols)
    cells.foreach { case (i, j, c) => rowTot(i) += c; colTot(j) += c }
    // index once: the r*k loop below must be O(1) per cell, not a scan of
    // the (possibly r*k-sized) cell list per iteration
    val cellMap: Map[(Int, Int), Long] =
      cells.map { case (i, j, c) => (i, j) -> c }.toMap
    var chi2Obs = 0.0
    for (i <- 0 until nRows; j <- 0 until nCols) {
      val e = rowTot(i) * colTot(j) / n
      if (e > 1e-14) {
        val o = cellMap.getOrElse((i, j), 0L).toDouble
        val d = o - e
        chi2Obs += d * d / e
      }
    }
    // noise pedestal: E[chi2] under independence
    val pedestal = (nRows - 1.0) * (nCols - 1.0)
    (n, chi2Obs, pedestal, math.max(0.0, chi2Obs - pedestal))
  }

  /** phik from an observed contingency table given as (rowIdx, colIdx,
    * count) triples. */
  def phikFromCounts(cells: Seq[(Int, Int, Long)], nRows: Int, nCols: Int): Double = {
    if (nRows < 2 || nCols < 2) return 0.0
    val (n, _, _, target) = chi2Stages(cells, nRows, nCols)
    if (n <= 0) return 0.0
    if (target <= 0.0) return 0.0
    val rowTot = new Array[Double](nRows)
    val colTot = new Array[Double](nCols)
    cells.foreach { case (i, j, c) => rowTot(i) += c; colTot(j) += c }
    val pRow = rowTot.map(_ / n); val pCol = colTot.map(_ / n)
    val maxChi2 = chi2FromRho(0.9999, pRow, pCol, n)
    if (target >= maxChi2) return 1.0
    val solver = new BrentSolver(1e-5)
    solver.solve(200,
      new org.apache.commons.math3.analysis.UnivariateFunction {
        def value(rho: Double): Double =
          chi2FromRho(rho, pRow, pCol, n) - target
      },
      0.0, 0.9999)
  }
}
