package graft.ops

import graft.SparkSpec

class JoinHealthSpec extends SparkSpec {
  import spark.implicits._

  test("orphans counted both directions; null child key is an orphan") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = JoinHealth.orphanStats(child, "fk", parent, "pk").head()
    assert(r.getLong(0) == 5) // n_child
    assert(r.getLong(1) == 2, s"orphans: $r") // 9 and null
    assert(r.getDouble(2) == 0.4)
    assert(r.getLong(3) == 3) // n_parent
    assert(r.getLong(4) == 1) // parent 3 childless
  }

  test("clean FK: zero orphans") {
    val child = Seq(1L, 2L, 2L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = JoinHealth.orphanStats(child, "fk", parent, "pk").head()
    assert(r.getLong(1) == 0 && r.getLong(4) == 0)
  }

  test("fanout: childless parents as 0, orphan children excluded") {
    val parent = Seq(10L, 20L, 30L, 40L).toDF("pk")
    val child = (Seq.fill(6)(10L) ++ Seq.fill(2)(20L) ++ Seq(99L))
      .toDF("fk") // 99 matches no parent
    val r = JoinHealth.fanout(parent, "pk", child, "fk").head()
    assert(r.getLong(0) == 4)
    assert(r.getLong(1) == 2) // 30, 40
    assert(r.getLong(2) == 0) // min
    assert(r.getDouble(3) == 1.0) // p50 of (6,2,0,0)
    assert(r.getDouble(4) == 2.0) // avg (6+2+0+0)/4
    assert(r.getLong(5) == 6) // max
  }
}
