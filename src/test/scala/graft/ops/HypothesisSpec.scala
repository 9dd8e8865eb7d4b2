package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class HypothesisSpec extends SparkSpec {
  import spark.implicits._

  test("mannWhitneyU: hand-computed small case, no ties") {
    // A = {1, 2}, B = {3}: ranks 1,2,3 -> R1 = 3, U1 = 0,
    // mu = 1, sig2 = (2*1/12)*4 = 2/3, z = -1/sqrt(2/3)
    val df = Seq((1.0, "a"), (2.0, "a"), (3.0, "b")).toDF("v", "g")
    val r = Hypothesis.mannWhitneyU(df, "v", col("g") === "a").head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 1)
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == BigDecimal(-1.0 / math.sqrt(2.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("mannWhitneyU: all values tied -> degenerate variance, z null") {
    val df = Seq((1.0, "a"), (1.0, "a"), (1.0, "b")).toDF("v", "g")
    val r = Hypothesis.mannWhitneyU(df, "v", col("g") === "a").head()
    // avgrank = 2 for everyone: R1 = 4, U1 = 4 - 3 = 1
    assert(r.getDouble(2) == 1.0)
    assert(r.isNullAt(3))
  }

  test("mannWhitneyU: tie correction matches closed form") {
    // A = {1, 2, 2}, B = {2, 3}: ranks 1, 3, 3, 3, 5
    // R1 = 7, U1 = 7 - 6 = 1, mu = 3,
    // T = 3^3 - 3 = 24, sig2 = (6/12) * (6 - 24/20) = 2.4
    val df = Seq((1.0, true), (2.0, true), (2.0, true),
      (2.0, false), (3.0, false)).toDF("v", "a")
    val r = Hypothesis.mannWhitneyU(df, "v", col("a")).head()
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == BigDecimal(-2.0 / math.sqrt(2.4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // null values / null groups dropped
    val withNulls = df.union(Seq((Double.NaN, true)).toDF("v", "a"))
      .union(Seq((None: Option[Double], Some(true))).toDF("v", "a"))
    val r2 = Hypothesis.mannWhitneyU(withNulls, "v", col("a")).head()
    assert(r2.getLong(0) == 3 && r2.getLong(1) == 2)
    assert(r2.getDouble(2) == r.getDouble(2))
  }

  test("auc: perfect separation 1.0, full tie 0.5, mixed hand case") {
    val perfect = Seq((2.0, true), (3.0, true), (1.0, false))
      .toDF("s", "y")
    assert(Hypothesis.auc(perfect, "s", col("y")).head().getDouble(2)
      == 1.0)
    val tied = Seq((1.0, true), (1.0, false)).toDF("s", "y")
    assert(Hypothesis.auc(tied, "s", col("y")).head().getDouble(2)
      == 0.5)
    // pos {1, 3}, neg {2}: pairs (1<2), (3>2) -> AUC = 1/2
    val mixed = Seq((1.0, true), (3.0, true), (2.0, false))
      .toDF("s", "y")
    val r = Hypothesis.auc(mixed, "s", col("y")).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 1)
    assert(r.getDouble(2) == 0.5)
  }

  test("kruskalWallis: textbook no-tie case and degenerate ties") {
    // groups {1,2,3}, {4,5,6}, {7,8,9}: H = 12/90 * 279 - 30 = 7.2
    val df = (1 to 9).map(i => (i.toDouble, s"g${(i - 1) / 3}"))
      .toDF("v", "g")
    val r = Hypothesis.kruskalWallis(df, "v", "g").head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 9)
    assert(r.getDouble(2) == 7.2)
    // all values identical: tie factor 0 -> h null
    val flat = Seq((1.0, "a"), (1.0, "b"), (1.0, "c")).toDF("v", "g")
    assert(Hypothesis.kruskalWallis(flat, "v", "g").head().isNullAt(2))
  }

  test("anovaF: hand-computed F and eta2") {
    // A = {1,2,3}, B = {2,4}: SSB = 1.2, SSW = 4.0, F = 1.2/(4/3) = 0.9
    val df = Seq((1.0, "a"), (2.0, "a"), (3.0, "a"),
      (2.0, "b"), (4.0, "b")).toDF("v", "g")
    val r = Hypothesis.anovaF(df, "v", "g").head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 5)
    assert(r.getDouble(2) == 0.9)
    assert(r.getDouble(3) == BigDecimal(1.2 / 5.2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // zero within-group variance: F null
    val flat = Seq((1.0, "a"), (1.0, "a"), (2.0, "b"), (2.0, "b"))
      .toDF("v", "g")
    assert(Hypothesis.anovaF(flat, "v", "g").head().isNullAt(2))
  }

  test("propZTest: hand-computed pooled z, degenerate cases") {
    // A: 3 of 4 succeed; B: 1 of 4: p=0.5, se2=0.25*0.5=0.125
    val df = (Seq.fill(3)((true, true)) ++ Seq((false, true)) ++
      Seq((true, false)) ++ Seq.fill(3)((false, false)))
      .toDF("y", "a")
    val r = Hypothesis.propZTest(df, col("y"), col("a")).head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 4)
    assert(r.getDouble(2) == 0.75 && r.getDouble(3) == 0.25)
    assert(r.getDouble(4) == BigDecimal(0.5 / math.sqrt(0.125))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // all success: pooled p = 1 -> z null
    val allPos = Seq((true, true), (true, false)).toDF("y", "a")
    assert(Hypothesis.propZTest(allPos, col("y"), col("a"))
      .head().isNullAt(4))
  }

  test("olsFit: exact slope/intercept/r2 on a known line plus noise") {
    // y = 2x + 1 exactly: slope 2, intercept 1, r2 = 1
    val exact = Seq((1.0, 3.0), (2.0, 5.0), (3.0, 7.0)).toDF("x", "y")
    val r = Hypothesis.olsFit(exact, "x", "y").head()
    assert(r.getLong(0) == 3)
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 1.0 &&
      r.getDouble(3) == 1.0)
    // textbook: x=1..4, y={2,1,4,3}: slope 0.6, intercept 1.0, r2 0.36
    val noisy = Seq((1.0, 2.0), (2.0, 1.0), (3.0, 4.0), (4.0, 3.0))
      .toDF("x", "y")
    val r2 = Hypothesis.olsFit(noisy, "x", "y").head()
    assert(r2.getDouble(1) == 0.6 && r2.getDouble(2) == 1.0 &&
      r2.getDouble(3) == 0.36)
    // constant x: undefined fit
    val flat = Seq((1.0, 2.0), (1.0, 3.0)).toDF("x", "y")
    assert(Hypothesis.olsFit(flat, "x", "y").head().isNullAt(1))
  }

  test("welchT: hand-computed two-group case") {
    // A = {1,2,3}: m=2, v=1; B = {2,4}: m=3, v=2
    // se2 = 1/3 + 1 = 4/3, t = -1/sqrt(4/3), df = (4/3)^2 / (1/18 + 1)
    val df = Seq((1.0, true), (2.0, true), (3.0, true),
      (2.0, false), (4.0, false)).toDF("v", "a")
    val r = Hypothesis.welchT(df, "v", col("a")).head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 3.0)
    val se2 = 1.0 / 3.0 / 3.0 * 3.0 + 2.0 / 2.0 // v1/n1 + v2/n2
    assert(r.getDouble(4) == BigDecimal(-1.0 / math.sqrt(se2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val dfExp = se2 * se2 /
      ((1.0 / 3.0) * (1.0 / 3.0) / 2.0 + 1.0 * 1.0 / 1.0)
    assert(r.getDouble(5) == BigDecimal(dfExp)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("welchT: singleton group or zero variance -> t/df null") {
    val single = Seq((1.0, true), (2.0, false), (3.0, false))
      .toDF("v", "a")
    val r1 = Hypothesis.welchT(single, "v", col("a")).head()
    assert(r1.isNullAt(4) && r1.isNullAt(5))
    val flat = Seq((1.0, true), (1.0, true), (1.0, false), (1.0, false))
      .toDF("v", "a")
    val r2 = Hypothesis.welchT(flat, "v", col("a")).head()
    assert(r2.isNullAt(4) && r2.isNullAt(5))
    assert(r2.getDouble(2) == 1.0 && r2.getDouble(3) == 1.0)
  }

  // ---------------------------------------------------------------- cuped

  test("cuped: Y == X gives theta 1, zero adjusted diff, full reduction") {
    val units = Seq((1.0, 1.0, true), (3.0, 3.0, true),
      (2.0, 2.0, false), (6.0, 6.0, false)).toDF("pre", "post", "g")
    val r = Hypothesis.cuped(units, "pre", "post", col("g")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.0)   // theta = cov/var = 1
    assert(r.getDouble(3) == -2.0)  // raw: mean 2 - mean 4
    assert(r.getDouble(4) == 0.0)   // covariate explains the whole gap
    assert(r.getDouble(5) == 1.0)   // var_reduction = corr² = 1
  }

  test("cuped: empty group or constant covariate -> null stats") {
    val oneSided = Seq((1.0, 2.0, true), (3.0, 4.0, true))
      .toDF("pre", "post", "g")
    val r1 = Hypothesis.cuped(oneSided, "pre", "post", col("g")).head()
    assert(r1.getLong(1) == 0L && r1.isNullAt(2) && r1.isNullAt(4))
    val constX = Seq((5.0, 2.0, true), (5.0, 4.0, false))
      .toDF("pre", "post", "g")
    val r2 = Hypothesis.cuped(constX, "pre", "post", col("g")).head()
    assert(r2.isNullAt(2) && r2.isNullAt(3) && r2.isNullAt(4))
  }

  // --------------------------------------------------------- effectSizes

  test("effectSizes: hand-computed Cliff's delta and Cohen's d") {
    // A = {1, 2}, B = {3, 4}: every A < every B -> delta = -1.
    // means 1.5 vs 3.5; pooled SS = 0.5 + 0.5, sp = sqrt(1/2)
    val df = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, false))
      .toDF("v", "a")
    val r = Hypothesis.effectSizes(df, "v", col("a")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == -1.0)
    assert(r.getDouble(3) == math.rint(-2.0 / math.sqrt(0.5) * 1e6) / 1e6)
  }

  test("effectSizes: empty group or zero variance -> nulls") {
    val oneSided = Seq((1.0, true), (2.0, true)).toDF("v", "a")
    val r1 = Hypothesis.effectSizes(oneSided, "v", col("a")).head()
    assert(r1.getLong(1) == 0L && r1.isNullAt(2) && r1.isNullAt(3))
    val const = Seq((5.0, true), (5.0, false), (5.0, false)).toDF("v", "a")
    val r2 = Hypothesis.effectSizes(const, "v", col("a")).head()
    assert(r2.getDouble(2) == 0.0) // full tie: U1 = n1*n2/2 -> delta 0
    assert(r2.isNullAt(3)) // pooled variance 0
  }

  // ---------------------------------------------------------- olsTrendBy

  test("olsTrendBy: exact line per group; constant x group -> nulls") {
    val df = Seq(
      ("a", 0.0, 1.0), ("a", 1.0, 3.0), ("a", 2.0, 5.0), // y = 2x + 1
      ("b", 4.0, 9.0), ("b", 4.0, 7.0)) // constant x
      .toDF("g", "x", "y")
    val rows = Hypothesis.olsTrendBy(df, "g", "x", "y",
      xScale = 0, yScale = 2).orderBy("g").collect()
    val a = rows(0)
    assert(a.getLong(1) == 3L && a.getDouble(2) == 2.0 &&
      a.getDouble(3) == 1.0 && a.getDouble(4) == 1.0)
    val b = rows(1)
    assert(b.getLong(1) == 2L && b.isNullAt(2) && b.isNullAt(3) &&
      b.isNullAt(4))
  }

  test("ridgeFit2: recovers an exact plane at lambda 0, shrinks at high lambda") {
    import spark.implicits._
    // y = 2 + 3*x1 - 1.5*x2 on a non-degenerate grid
    val pts = for { a <- 0 to 5; b <- 0 to 5 }
      yield (a.toDouble, b.toDouble, 2.0 + 3.0 * a - 1.5 * b)
    val df = pts.toDF("x1", "x2", "y")
    val fit = Hypothesis.ridgeFit2(df, "x1", "x2", "y", lambda = 0.0).head()
    assert(fit.getLong(0) == 36L)
    assert(math.abs(fit.getDouble(1) - 2.0) < 1e-5)
    assert(math.abs(fit.getDouble(2) - 3.0) < 1e-5)
    assert(math.abs(fit.getDouble(3) + 1.5) < 1e-5)
    // heavy regularization pulls slopes toward zero, intercept absorbs
    val heavy = Hypothesis.ridgeFit2(df, "x1", "x2", "y",
      lambda = 1e6).head()
    assert(math.abs(heavy.getDouble(2)) < 0.1 &&
      math.abs(heavy.getDouble(3)) < 0.1)
    // collinear features at lambda 0: singular -> nulls; ridge rescues
    val col2 = (0 to 5).map(i => (i.toDouble, 2.0 * i, 1.0 + i))
      .toDF("x1", "x2", "y")
    val sing = Hypothesis.ridgeFit2(col2, "x1", "x2", "y", 0.0).head()
    val rescued = Hypothesis.ridgeFit2(col2, "x1", "x2", "y", 1.0).head()
    assert(!rescued.isNullAt(2))
    // det may be ~0 but not exactly 0 in floats; accept either null or
    // a wildly unstable estimate at lambda 0 - the ridge one is finite
    assert(sing.isNullAt(2) || rescued.getDouble(2).abs < 10.0)
  }

  test("benfordFirstDigit: exact digit extraction, shares sum to 1") {
    import spark.implicits._
    // first digits by cents string: 1.23->123->1, 0.05->5->5,
    // 999.994->99999->9, 12.0->1200->1, negative/zero/null dropped
    val df = Seq(Some(1.23), Some(0.05), Some(999.994), Some(12.0),
      Some(-4.0), Some(0.0), None).toDF("x")
    val rows = Hypothesis.benfordFirstDigit(df, "x").collect()
    val byDigit = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDigit === Map(1 -> 2L, 5 -> 1L, 9 -> 1L))
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-5)
    // digit-1 Benford expectation is log10(2)
    val d1 = rows.find(_.getInt(0) == 1).get
    assert(math.abs(d1.getAs[Double]("benford") - 0.30103) < 1e-5)
    assert(rows.forall(_.getAs[Double]("chi2_term") >= 0.0))
  }

  test("leveneBrownForsythe: unequal spreads flagged, equal not") {
    import spark.implicits._
    // group a tight around 10, group b spread wide around 10
    val uneq = ((1 to 50).map(i => (10.0 + (i % 3 - 1) * 0.1, "a")) ++
      (1 to 50).map(i => (10.0 + (i % 11 - 5) * 3.0, "b"))).toDF("v", "g")
    val f1 = Hypothesis.leveneBrownForsythe(uneq, "v", "g").head()
    assert(f1.getAs[Double]("f") > 10.0)
    // identical distributions -> tiny F (or null if deviations vanish)
    val eq = ((1 to 50).map(i => ((i % 5).toDouble, "a")) ++
      (1 to 50).map(i => ((i % 5).toDouble, "b"))).toDF("v", "g")
    val f2 = Hypothesis.leveneBrownForsythe(eq, "v", "g").head()
    assert(f2.isNullAt(2) || f2.getAs[Double]("f") < 1e-6)
  }

  test("logisticGd2: learns the sign on separable data, loss drops") {
    import spark.implicits._
    // y = 1 iff x1 large; x2 pure noise constant
    val df = (0 until 200).map { i =>
      val x1 = i / 100.0
      (x1, 0.5, if (x1 > 1.0) 1.0 else 0.0)
    }.toDF("x1", "x2", "y")
    val r = Hypothesis.logisticGd2(df, col("x1"), col("x2"), col("y"),
      lr = 1.0, steps = 5).head()
    assert(r.getLong(0) == 200L)
    assert(r.getAs[Double]("b1") > 0.0) // x1 positively predictive
    // better than the chance model (loss ln 2 at beta = 0)
    assert(r.getAs[Double]("log_loss") < math.log(2.0))
    // coefficients are exact multiples of 1e-9 (the quantized grid)
    val b1 = BigDecimal(r.getAs[Double]("b1"))
    assert((b1 * BigDecimal(1e9)).setScale(3,
      BigDecimal.RoundingMode.HALF_UP).isWhole ||
      math.abs(r.getAs[Double]("b1")) < 10.0)
  }

  test("jackknifeGroupInfluence: hand-computed deletions, single-group NULL") {
    import spark.implicits._
    // a: 4 rows sum 40; b: 2 rows sum 4; c: 2 rows sum 16. N=8, S=60.
    val df = (Seq.fill(4)(("a", 10L)) ++ Seq(("b", 1L), ("b", 3L)) ++
      Seq(("c", 7L), ("c", 9L))).toDF("g", "x")
    val out = Hypothesis.jackknifeGroupInfluence(df, "g", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("a") == ((4L, 10.0, 5.0, -2.5)))    // (60-40)/4 vs 7.5
    assert(out("b") == ((2L, 2.0, r6(56.0 / 6), r6(56.0 / 6 - 7.5))))
    assert(out("c") == ((2L, 8.0, r6(44.0 / 6), r6(44.0 / 6 - 7.5))))
    // a single group covering the corpus: loo/influence NULL
    val one = Hypothesis.jackknifeGroupInfluence(
      Seq(("z", 5L), ("z", 7L)).toDF("g", "x"), "g", "x").head()
    assert(one.getLong(1) == 2L && one.isNullAt(3) && one.isNullAt(4))
  }

  test("cohenKappa: textbook 2x2 table, degenerate single label, null exclusion") {
    import spark.implicits._
    // confusion [[20,5],[10,15]]: po = 0.7, pe = 0.5, kappa = 0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n")) ++
      Seq((null, "y"), ("y", null)) // unrated rows drop
    val r = Hypothesis.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .head()
    assert(r.getLong(0) == 50L && r.getLong(1) == 35L)
    assert(r.getDouble(2) == 0.7 && r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == 0.4)
    // both raters constant and agreeing: pe = 1 -> kappa NULL, po = 1
    val deg = Hypothesis.cohenKappa(
      Seq.fill(9)(("x", "x")).toDF("a", "b"), col("a"), col("b")).head()
    assert(deg.getLong(0) == 9L && deg.getDouble(2) == 1.0)
    assert(deg.getDouble(3) == 1.0 && deg.isNullAt(4))
    // perfect disagreement on swapped labels: po = 0, kappa < 0
    val sw = Hypothesis.cohenKappa(
      (Seq.fill(6)(("y", "n")) ++ Seq.fill(6)(("n", "y")))
        .toDF("a", "b"), col("a"), col("b")).head()
    assert(sw.getDouble(2) == 0.0 && sw.getDouble(4) == -1.0)
  }

  test("poissonCdf1: Poisson(1) CDF thresholds, monotone, near-total mass") {
    val c = Hypothesis.poissonCdf1
    assert(c.size == 8)
    assert(math.abs(c(0) - math.exp(-1.0)) < 1e-15)
    assert(math.abs(c(1) - 2 * math.exp(-1.0)) < 1e-15)
    assert(c.zip(c.drop(1)).forall { case (a, b) => a < b })
    assert(c.last > 0.999989 && c.last < 1.0)
  }

  test("poissonBootstrapMeanCI: constant metric collapses CI; deterministic; brackets mean") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = ((0 until 300).map(i => ("a", i.toLong, 40L + rnd.nextInt(21))) ++
      (0 until 250).map(i => ("c", 1000L + i, 7L))) // constant group
      .toDF("g", "id", "x")
    def run() = Hypothesis.poissonBootstrapMeanCI(df, "g", "id", "x",
        b = 64, alpha = 0.05)
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val out = run()
    // constant group: every replicate mean is exactly the constant
    val (nc, mc, bc, loC, hiC) = out("c")
    assert(nc == 250L && mc == 7.0 && loC == 7.0 && hiC == 7.0)
    assert(bc <= 64L && bc >= 60L) // zero-total-weight replicates are rare
    // varying group: interval is ordered, brackets the point mean, and
    // is non-degenerate
    val (na, ma, ba, loA, hiA) = out("a")
    assert(na == 300L && ba <= 64L)
    assert(loA < hiA && loA <= ma && ma <= hiA)
    assert(math.abs(ma - 50.0) < 1.5) // mean of uniform {40..60}
    // the whole pipeline is hash-deterministic: a second run is identical
    assert(run() == out)
    intercept[IllegalArgumentException] {
      Hypothesis.poissonBootstrapMeanCI(df, "g", "id", "x", b = 2)
    }
  }
}
