package graft.ops

import graft.SparkSpec

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  test("independent columns: MI ~ 0; identical columns: U = 1") {
    // perfectly independent: full cross product, uniform counts
    val indep = for { x <- 'a' to 'd'; y <- 1 to 3 }
      yield (x.toString, y.toString)
    val ri = Association
      .categoricalAssociation(indep.toDF("x", "y"), "x", "y").head()
    assert(ri.getDouble(0) == 0.0, s"independent MI should be 0: $ri")

    // identical: MI = H(X) = H(Y), both U = 1
    val same = Seq("a", "a", "b", "c", "c", "c").map(v => (v, v))
    val rs = Association
      .categoricalAssociation(same.toDF("x", "y"), "x", "y").head()
    assert(rs.getDouble(1) == 1.0 && rs.getDouble(2) == 1.0, s"U: $rs")
    assert(rs.getLong(3) == 6)
  }

  test("matches naive contingency computation on random data") {
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(1000)(s"x${rnd.nextInt(5)}")
    val ys = xs.map(x => if (rnd.nextBoolean()) x.replace('x', 'y')
      else s"y${rnd.nextInt(4)}") // partial dependence
    val r = Association
      .categoricalAssociation(xs.zip(ys).toDF("x", "y"), "x", "y").head()

    def h(groups: Map[String, Int]): Double = {
      val n = groups.values.sum.toDouble
      groups.values.map(c => -(c / n) * math.log(c / n)).sum
    }
    val hx = h(xs.groupBy(identity).view.mapValues(_.size).toMap)
    val hy = h(ys.groupBy(identity).view.mapValues(_.size).toMap)
    val hxy = h(xs.zip(ys).map(p => p._1 + "|" + p._2)
      .groupBy(identity).view.mapValues(_.size).toMap)
    val mi = hx + hy - hxy
    assert(math.abs(r.getDouble(0) - mi) < 1e-7, s"mi: $r vs $mi")
    assert(math.abs(r.getDouble(1) - mi / hx) < 1e-7)
    assert(math.abs(r.getDouble(2) - mi / hy) < 1e-7)
  }

  test("constant column: zero entropy yields null U, MI = 0") {
    val df = Seq(("k", "a"), ("k", "b"), ("k", "b")).toDF("x", "y")
    val r = Association.categoricalAssociation(df, "x", "y").head()
    assert(r.getDouble(0) == 0.0) // MI with a constant is 0
    assert(r.isNullAt(1), s"U(X|Y) undefined when H(X)=0: $r")
    assert(r.getDouble(2) == 0.0) // MI/H(Y) = 0
  }

  test("null categories are kept as their own level") {
    val df = Seq((Some("a"), "u"), (None, "v"), (None, "v"))
      .toDF("x", "y")
    val r = Association.categoricalAssociation(df, "x", "y").head()
    assert(r.getLong(3) == 3) // all rows counted
    assert(r.getDouble(1) == 1.0) // null-x perfectly predicts y=v
  }

  test("binnedMutualInfo: V-shape scores high MI where Pearson is 0") {
    // y = |x|: perfectly dependent, but correlation ~0
    val xs = (-50 to 50).map(_.toDouble)
    val df = xs.map(x => (x, math.abs(x))).toDF("x", "y")
    val r = Association.binnedMutualInfo(df, "x", "y", bins = 10).head()
    assert(r.getDouble(0) > 0.5, s"V-shape MI should be high: $r")
    assert(r.getLong(3) == 101)
    // independent uniform grid: MI exactly 0 (every cell uniform)
    val grid = (for (a <- 0 until 10; b <- 0 until 10)
      yield (a.toDouble, b.toDouble)).toDF("x", "y")
    val r2 = Association.binnedMutualInfo(grid, "x", "y", bins = 10)
      .head()
    assert(math.abs(r2.getDouble(0)) < 1e-9)
    // NaN / null rows dropped
    val withBad = df.union(Seq((Double.NaN, 1.0)).toDF("x", "y"))
    assert(Association.binnedMutualInfo(withBad, "x", "y", 10)
      .head().getLong(3) == 101)
  }
}
