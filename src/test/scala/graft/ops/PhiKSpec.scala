package graft.ops

import graft.SparkSpec
import graft.functions.PhiK

class PhiKSpec extends SparkSpec {
  import spark.implicits._

  test("bvnCdf sanity: rho=0 factorizes; symmetric quadrant at rho=0.5") {
    assert(math.abs(PhiK.bvnCdf(0.0, 0.0, 0.0) - 0.25) < 1e-10)
    // Known closed form: P(X<0, Y<0) = 1/4 + asin(rho)/(2*pi)
    val expected = 0.25 + math.asin(0.5) / (2 * math.Pi)
    assert(math.abs(PhiK.bvnCdf(0.0, 0.0, 0.5) - expected) < 1e-8)
    assert(math.abs(PhiK.bvnCdf(Double.PositiveInfinity, 1.2, 0.7) -
      new org.apache.commons.math3.distribution.NormalDistribution()
        .cumulativeProbability(1.2)) < 1e-12)
  }

  test("phik ~ 0 for independent columns") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 4000)
      .map(_ => (s"a${rnd.nextInt(4)}", s"b${rnd.nextInt(4)}"))
      .toDF("x", "y")
    val v = PhiKOp.phik(df, "x", "y")
    assert(v < 0.15, s"expected ~0, got $v")
  }

  test("phik ~ 1 for perfectly dependent columns") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 4000).map { _ =>
      val k = rnd.nextInt(4); (s"a$k", s"b$k")
    }.toDF("x", "y")
    val v = PhiKOp.phik(df, "x", "y")
    assert(v > 0.95, s"expected ~1, got $v")
  }

  test("phikFromCounts at 100x100 is O(r*k): sparse cells, sub-second") {
    // diagonal-heavy sparse table: 100 diagonal cells + 200 off-diagonal
    val cells = (0 until 100).map(i => (i, i, 1000L)) ++
      (0 until 200).map(k => (k % 100, (k * 37 + 1) % 100, 3L))
    val t0 = System.nanoTime()
    val v = graft.functions.PhiK.phikFromCounts(cells, 100, 100)
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(v > 0.9) // near-diagonal table = strong association
    // the old collectFirst-in-loop scan was O(r*k*|cells|) ~ 3e6 * scan;
    // the indexed loop is ~1e4 map lookups + the Brent solve
    assert(elapsed < 2.0, f"phikFromCounts took $elapsed%.2fs")
  }

  test("phik monotone in association strength") {
    val rnd = new scala.util.Random(13)
    def gen(noise: Double) = (1 to 3000).map { _ =>
      val k = rnd.nextInt(4)
      val j = if (rnd.nextDouble() < noise) rnd.nextInt(4) else k
      (s"a$k", s"b$j")
    }.toDF("x", "y")
    val strong = PhiKOp.phik(gen(0.1), "x", "y")
    val weak = PhiKOp.phik(gen(0.6), "x", "y")
    assert(strong > weak, s"strong=$strong weak=$weak")
  }
}
