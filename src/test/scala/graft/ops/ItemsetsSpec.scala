package graft.ops

import graft.SparkSpec

class ItemsetsSpec extends SparkSpec {
  import spark.implicits._

  test("support, confidence, lift from a crafted basket set") {
    // baskets: 1:{a,b} 2:{a,b} 3:{a} 4:{b,c} 5:{c}
    val rows = Seq((1, "a"), (1, "b"), (1, "b"), (2, "a"), (2, "b"),
      (3, "a"), (4, "b"), (4, "c"), (5, "c"))
    val r = Itemsets.pairRules(rows.toDF("bk", "it"), "bk", "it")
      .collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getDouble(3), x.getDouble(4), x.getDouble(5)))
      .toMap
    // |a|=3, |b|=3, |c|=2, n=5, |ab|=2, |bc|=1
    val ab = r(("a", "b"))
    assert(ab._1 == 2 && ab._2 == 0.4)
    assert(math.abs(ab._3 - 2.0 / 3) < 1e-8) // conf a->b
    assert(math.abs(ab._4 - 2.0 * 5 / 9) < 1e-8) // lift
    val ba = r(("b", "a"))
    assert(ba._3 == ab._3) // |a|=|b| here -> same confidence
    assert(ba._4 == ab._4) // lift symmetric
    val bc = r(("b", "c"))
    assert(bc._1 == 1 && math.abs(bc._3 - 1.0 / 3) < 1e-8)
    val cb = r(("c", "b"))
    assert(math.abs(cb._3 - 0.5) < 1e-8) // conf c->b = 1/2
    assert(!r.contains(("a", "c"))) // never co-occur
    assert(r.size == 4)
  }

  test("minSupportCount filters pairs; duplicates in a basket ignored") {
    val rows = Seq((1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y"))
    val all = Itemsets.pairRules(rows.toDF("bk", "it"), "bk", "it")
    assert(all.count() == 2) // x->y and y->x, support_cnt 2
    assert(all.head().getLong(2) == 2)
    val none = Itemsets.pairRules(rows.toDF("bk", "it"), "bk", "it",
      minSupportCount = 3)
    assert(none.count() == 0)
  }

  test("null baskets/items dropped; empty input rejected") {
    val rows = Seq((Some(1), Some("a")), (Some(1), Some("b")),
      (None, Some("a")), (Some(2), None))
    val r = Itemsets.pairRules(rows.toDF("bk", "it"), "bk", "it")
    assert(r.count() == 2) // only basket 1's a<->b
    // n_baskets counts basket 2 (it has a null item but exists)? No:
    // null items are dropped first, so basket 2 vanishes -> n = 1
    assert(r.head().getDouble(3) == 1.0) // support = 1/1
    intercept[IllegalArgumentException] {
      Itemsets.pairRules(Seq.empty[(Int, String)].toDF("bk", "it"),
        "bk", "it")
    }
  }
}
