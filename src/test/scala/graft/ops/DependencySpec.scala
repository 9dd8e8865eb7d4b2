package graft.ops

import graft.SparkSpec

class DependencySpec extends SparkSpec {
  import spark.implicits._

  test("holding FD: zero violations; broken FD: counted exactly") {
    val df = Seq(
      ("k1", "r1", "x"), ("k1", "r1", "y"), // k1 -> r1 consistent
      ("k2", "r2", "x"),
      ("k3", "r2", "x"), ("k3", "r3", "x") // k3 maps to two rhs
    ).toDF("k", "r", "other")

    val hold = Dependency.fdViolations(df.where($"k" =!= "k3"), Seq("k"), "r")
      .head()
    assert(hold.getLong(0) == 2 && hold.getLong(1) == 0)
    assert(hold.getDouble(2) == 0.0 && hold.getLong(3) == 1)

    val broken = Dependency.fdViolations(df, Seq("k"), "r").head()
    assert(broken.getLong(0) == 3, s"groups: $broken")
    assert(broken.getLong(1) == 1, s"violating: $broken")
    assert(broken.getDouble(2) == 0.33333333)
    assert(broken.getLong(3) == 2) // k3 has 2 distinct rhs
    assert(broken.getLong(4) == 5)
  }

  test("null rhs is no evidence against the FD") {
    val df = Seq(
      ("k1", Some("a")), ("k1", None), // null doesn't violate
      ("k2", None), ("k2", None) // all-null group: nd = 0, holds
    ).toDF("k", "r")
    val r = Dependency.fdViolations(df, Seq("k"), "r").head()
    assert(r.getLong(1) == 0, s"violations: $r")
    assert(r.getLong(0) == 2)
  }

  test("composite determinant") {
    val df = Seq(
      ("a", 1, "u"), ("a", 2, "v"), // (a,1) and (a,2) distinct groups
      ("a", 1, "u"), ("a", 2, "w") // (a,2) violates
    ).toDF("x", "y", "r")
    val r = Dependency.fdViolations(df, Seq("x", "y"), "r").head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 1)
  }
}
