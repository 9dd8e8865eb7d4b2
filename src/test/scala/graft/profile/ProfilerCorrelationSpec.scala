package graft.profile

import graft.SparkSpec

class ProfilerCorrelationSpec extends SparkSpec {
  import spark.implicits._

  test("opt-in kendall + phik appear in the profile and JSON") {
    val rnd = new scala.util.Random(5)
    val df = (1 to 500).map { i =>
      val x = rnd.nextDouble() * 100
      val k = rnd.nextInt(3)
      (x, x * 2 + rnd.nextDouble(), s"a$k", s"b$k", i.toLong)
    }.toDF("x", "y", "ca", "cb", "id")
    val p = Profiler.profile(df,
      ProfileConfig.default.copy(
        persist = false, computeCharStats = false,
        computeKendall = true, kendallSamplePct = 100,
        computePhik = true))
    assert(p.kendall.nonEmpty)
    val tau = p.kendall(("x", "y"))
    assert(tau > 0.95, s"x,y strongly concordant, got $tau")
    assert(p.phik.nonEmpty)
    assert(p.phik(("ca", "cb")) > 0.95)
    val json = ProfileJson.toJson(p)
    assert(json.contains("\"kendall\"") && json.contains("\"phik\""))
  }

  test("kendallExact: exact grid path agrees with the full-sample path") {
    // heavy ties + nulls + a duplicate-valued column: the shapes where
    // sample-vs-exact and grid-vs-local could diverge. With
    // kendallSamplePct=100 and cap above n, the SAMPLE path computes
    // exact tau on the full table too (Knight's local kernel), so the
    // two paths must agree to the exact kernel's 8-dp rounding.
    val rnd = new scala.util.Random(7)
    val df = (1 to 800).map { i =>
      val x = rnd.nextInt(12).toDouble // heavy ties
      val y = x * 3 + rnd.nextInt(5)
      val z = if (i % 7 == 0) None else Some(rnd.nextDouble() * 10)
      (x, y, z, i.toLong)
    }.toDF("x", "y", "z", "id")
    val base = ProfileConfig.default.copy(
      persist = false, computeCharStats = false,
      computeKendall = true, kendallSamplePct = 100,
      kendallSampleCap = 100000)
    val sampled = Profiler.profile(df, base)
    val exact = Profiler.profile(df, base.copy(kendallExact = true))
    assert(exact.kendall.keySet == sampled.kendall.keySet)
    exact.kendall.foreach { case (k, tExact) =>
      val tSample = sampled.kendall(k)
      assert(math.abs(tExact - tSample) < 1e-8,
        s"$k: exact=$tExact sample(full)=$tSample")
    }
    // (degenerate/constant inputs are covered at the kernel level in
    // KendallSpec — the profiler demotes constant columns before the
    // correlation pass ever sees them)
  }

  test("poolSize=1: full profile with Spearman on completes (no deadlock)") {
    // spearmanRanksF awaits numStatsF FROM a pool thread — FIFO-safe by
    // creation order today, but the same nested-await shape that once
    // deadlocked the chunked-Pearson path at poolSize=1. Pin the shape:
    // the whole profile, every correlation on, one pool thread. A
    // deadlock surfaces as the time limit interrupting the Await.
    import org.scalatest.concurrent.TimeLimits._
    import org.scalatest.concurrent.{Signaler, ThreadSignaler}
    import org.scalatest.time.{Seconds, Span}
    implicit val signaler: Signaler = ThreadSignaler
    val rnd = new scala.util.Random(11)
    val df = (1 to 300).map { i =>
      (rnd.nextDouble() * 10, rnd.nextDouble() * 5, rnd.nextGaussian(),
        s"c${rnd.nextInt(4)}", i.toLong)
    }.toDF("x", "y", "z", "cat", "id")
    val p1 = failAfter(Span(300, Seconds)) {
      Profiler.profile(df, ProfileConfig.default.copy(
        poolSize = 1, computeSpearman = true, computeKendall = true))
    }
    val p8 = Profiler.profile(df, ProfileConfig.default.copy(
      poolSize = 8, computeSpearman = true, computeKendall = true))
    // serial schedule must also COMPUTE the same things
    def corr(p: TableProfile, name: String) =
      p.correlations.find(_.method == name).map(_.values.map(_.toVector).toVector)
    assert(corr(p1, "spearman").isDefined)
    assert(corr(p1, "spearman") == corr(p8, "spearman"))
    assert(corr(p1, "pearson") == corr(p8, "pearson"))
    assert(p1.kendall == p8.kendall)
  }
}
