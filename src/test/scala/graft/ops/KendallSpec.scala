package graft.ops

import graft.SparkSpec

class KendallSpec extends SparkSpec {
  import spark.implicits._

  test("tau-b on untied data matches hand computation") {
    // x=[1,2,3,4], y=[1,3,2,4]: one discordant pair (2,3) -> tau = 4/6
    val df = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 4.0)).toDF("x", "y")
    val r = Kendall.tauB(df, "x", "y").head()
    assert(r.getAs[Long]("n_pairs") == 6)
    assert(r.getAs[Long]("concordant") == 5)
    assert(r.getAs[Long]("discordant") == 1)
    assert(math.abs(r.getAs[Double]("tau_b") - 4.0 / 6.0) < 1e-8)
  }

  test("tau-b with ties: C=4, D=0, tx=ty=1 -> 4/sqrt(25) = 0.8") {
    val df = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (3.0, 3.0)).toDF("x", "y")
    val r = Kendall.tauB(df, "x", "y").head()
    assert(math.abs(r.getAs[Double]("tau_b") - 0.8) < 1e-8)
  }

  test("perfect inverse relation gives tau = -1") {
    val df = (1 to 20).map(i => (i.toDouble, -i.toDouble)).toDF("x", "y")
    val r = Kendall.tauB(df, "x", "y").head()
    assert(r.getAs[Double]("tau_b") == -1.0)
  }

  test("tauBMatrix matches per-pair tauB, incl. nulls and constants") {
    val df = Seq(
      (Some(1.0), Some(1.0), Some(5.0), Some(7.0)),
      (Some(2.0), Some(3.0), None, Some(7.0)),
      (Some(3.0), Some(2.0), Some(1.0), Some(7.0)),
      (None, Some(4.0), Some(2.0), Some(7.0)),
      (Some(4.0), Some(4.0), Some(9.0), Some(7.0)),
      (Some(5.0), None, Some(3.0), Some(7.0))
    ).toDF("w", "x", "y", "k")
    val cols = Seq("w", "x", "y", "k")
    val m = Kendall.tauBMatrix(df, cols)
    assert(m.size == 6)
    for (i <- cols.indices; j <- (i + 1) until cols.size) {
      val expected = Option(
        Kendall.tauB(df, cols(i), cols(j)).head().getAs[Any]("tau_b"))
        .map(_.asInstanceOf[Double]).getOrElse(Double.NaN)
      val got = m((cols(i), cols(j)))
      assert(
        (expected.isNaN && got.isNaN) || math.abs(expected - got) < 1e-12,
        s"(${cols(i)},${cols(j)}): matrix=$got pairwise=$expected")
    }
    // constant column k: every pair fully tied -> undefined
    assert(m(("w", "k")).isNaN)
  }

  test("tauBLocal (Knight O(n log n)) matches distributed tauB exactly") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 60 + trial * 37
      // heavy ties: values drawn from a small integer set
      val xs = Array.fill(n)(rnd.nextInt(7).toDouble)
      val ys = Array.fill(n)(
        if (trial % 2 == 0) rnd.nextInt(5).toDouble
        else xs(rnd.nextInt(n)) + rnd.nextInt(3)) // correlated + tied
      val df = xs.zip(ys).toSeq.toDF("x", "y")
      val expected = Option(Kendall.tauB(df, "x", "y").head().getAs[Any]("tau_b"))
        .map(_.asInstanceOf[Double]).getOrElse(Double.NaN)
      val got = Kendall.tauBLocal(xs, ys)
      assert(
        (expected.isNaN && got.isNaN) || math.abs(expected - got) < 1e-12,
        s"trial $trial: local=$got distributed=$expected")
    }
    // constant input: undefined
    assert(Kendall.tauBLocal(Array(1.0, 1.0, 1.0), Array(1.0, 2.0, 3.0)).isNaN)
  }

  test("tauBExactDistributed (grid Knight) matches tauB across bucket counts and ties") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 4) {
      val n = 80 + trial * 53
      val xs = Array.fill(n)(rnd.nextInt(9).toDouble) // heavy x-ties
      val ys = Array.fill(n)(
        if (trial % 2 == 0) rnd.nextInt(6).toDouble // heavy y-ties
        else xs(rnd.nextInt(n)) * 2 + rnd.nextGaussian())
      val df = xs.zip(ys).toSeq.toDF("x", "y")
      val expected = Option(
        Kendall.tauB(df, "x", "y").head().getAs[Any]("tau_b"))
        .map(_.asInstanceOf[Double]).getOrElse(Double.NaN)
      // the decomposition is an identity: ANY bucket count (1 = the
      // whole table in one Knight group; more = real grid splits)
      // yields the identical exact tau
      for (b <- Seq(1, 4, 16)) {
        val r = Kendall.tauBExactDistributed(df, "x", "y", buckets = b)
          .head()
        val got = Option(r.getAs[Any]("tau_b"))
          .map(_.asInstanceOf[Double]).getOrElse(Double.NaN)
        assert(
          (expected.isNaN && got.isNaN) || math.abs(expected - got) < 1e-12,
          s"trial $trial buckets $b: grid=$got pairjoin=$expected")
        // the tie terms are exact too, so check the discordant count
        // against the O(n^2) join's direct count
        val d = Kendall.tauB(df, "x", "y").head().getAs[Long]("discordant")
        assert(r.getAs[Long]("discordant") == d,
          s"trial $trial buckets $b: Q mismatch")
      }
    }
    // constant x: every pair x-tied, tau undefined (null, not NaN div)
    val const = Seq((1.0, 1.0), (1.0, 2.0), (1.0, 3.0)).toDF("x", "y")
    assert(Kendall.tauBExactDistributed(const, "x", "y", buckets = 4)
      .head().isNullAt(6))
  }

  test("tauBExactDistributed guards oversized groups before aggregating") {
    // one value = one un-splittable tie group: with maxGroup below the
    // table size and buckets=1 the require must fire BEFORE any
    // DiscordantPairs buffer is built
    val df = (1 to 100).map(i => (1.0, i.toDouble)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Kendall.tauBExactDistributed(df, "x", "y", buckets = 1, maxGroup = 10L)
    }
    assert(e.getMessage.contains("maxGroup"))
  }

  test("hashSampleCapped hard-bounds the pair join at any rowcount") {
    import org.apache.spark.sql.functions._
    // 200k rows where the 50% rate alone would keep ~100k rows (5e9
    // pairs); the absolute cap must cut that to exactly 500 rows.
    val big = spark.range(200000)
      .select(col("id"), (col("id") % 97).cast("double").as("x"),
        (col("id") % 31).cast("double").as("y"))
    val sampled = Sampling.hashSampleCapped(big, "id", 50, 500, col("id"))
    assert(sampled.count() == 500)
    val r = Kendall.tauB(sampled, "x", "y").head()
    assert(r.getAs[Long]("n_pairs") == 500L * 499 / 2)
    // deterministic: same cap, same rows, same tau
    val r2 = Kendall.tauB(
      Sampling.hashSampleCapped(big.repartition(17), "id", 50, 500, col("id")),
      "x", "y").head()
    assert(r2.getAs[Double]("tau_b") == r.getAs[Double]("tau_b"))
  }
}
