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
}
