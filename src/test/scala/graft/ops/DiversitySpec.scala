package graft.ops

import graft.SparkSpec

class DiversitySpec extends SparkSpec {
  import spark.implicits._

  test("keyEntropyHistogram: single-state keys bin 0, uniform mix ln2") {
    // u1: one type (H = 0); u2: 2+2 uniform (H = ln 2 ~ 0.693, bin 2);
    // u3: single event (H = 0); null key dropped
    val df = (Seq.fill(5)(("u1", "a")) ++
      Seq(("u2", "a"), ("u2", "a"), ("u2", "b"), ("u2", "b")) ++
      Seq(("u3", "x")) ++ Seq((null: String, "y")))
      .toDF("k", "st")
    val got = Diversity.keyEntropyHistogram(df, "k", "st")
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2),
        r.getLong(3))).toMap
    assert(got == Map(
      0 -> ((0.0, 0.25, 2L)),   // u1, u3
      2 -> ((0.5, 0.75, 1L)))) // u2 at ln 2 = 0.6931
  }

  test("keyEntropyHistogram: top bin clamps, counts stay exact") {
    // 16 distinct states, one event each: H = ln 16 = 2.77 -> bin 11
    val df = (0 until 16).map(i => ("u", s"s$i")).toDF("k", "st")
    val got = Diversity.keyEntropyHistogram(df, "k", "st").collect()
    assert(got.length == 1 && got(0).getInt(0) == 11 &&
      got(0).getLong(3) == 1L)
  }
}
