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
}
