package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("avgRanks matches window tie-averaged ranks across many partitions") {
    // Heavy ties + several keys, spread over more partitions than keys so
    // the per-(partition,key) offset bookkeeping is actually exercised.
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { _ =>
      val k = s"c${rnd.nextInt(3)}"
      (k, rnd.nextInt(40).toDouble)
    }
    val kv = rows.toDF("k", "v").repartition(13)

    val got = Ranking.avgRanks(kv, "k", "v", parts = 7)
      .collect()
      .map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(2)))
      .toMap

    val w = Window.partitionBy("k").orderBy("v")
    val want = kv
      .withColumn("r",
        rank().over(w).cast("double") +
          (count(lit(1)).over(Window.partitionBy("k", "v")).cast("double") - 1) / 2.0)
      .select("k", "v", "r")
      .distinct()
      .collect()
      .map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(2)))
      .toMap

    assert(got.keySet == want.keySet)
    want.foreach { case (k, r) => assert(got(k) == r, s"rank mismatch at $k") }
  }

  test("avgRanks releases its persisted intermediate (no storage growth)") {
    val rnd = new scala.util.Random(11)
    val kv = (1 to 2000).map(_ => ("k", rnd.nextDouble())).toDF("k", "v")
    def persisted() = spark.sparkContext.getPersistentRDDs.size
    // the SparkContext is shared JVM-wide and suites run in parallel, so
    // assert NON-ACCUMULATION relative to a baseline rather than an
    // absolute count (other suites' transient persists come and go)
    val baseline = persisted()
    // repeated invocations must not accumulate persisted RDDs: avgRanks
    // localCheckpoints its (small) result and unpersists the count table
    (1 to 3).foreach { _ =>
      val out = Ranking.avgRanks(kv, "k", "v", parts = 5)
      assert(out.count() > 0)
      out.unpersist(true)
    }
    // checkpoint RDDs are reaped by the ContextCleaner once unreferenced;
    // poll instead of a fixed sleep (cleanup is async); allow +1 slack
    // for a concurrent suite's in-flight persist
    val deadline = System.currentTimeMillis() + 15000
    while (persisted() > baseline + 1 && System.currentTimeMillis() < deadline) {
      System.gc(); Thread.sleep(200)
    }
    assert(persisted() <= baseline + 1,
      s"expected no accumulated persisted RDDs beyond baseline $baseline, " +
        s"found ${persisted()}")
  }

  test("avgRankTable: single column, all ties, singleton") {
    val allTies = Seq(5.0, 5.0, 5.0, 5.0).toDF("x")
    val t = Ranking.avgRankTable(allTies, "x").collect()
    assert(t.length == 1 && t.head.getDouble(1) == 2.5)

    val one = Seq(42.0).toDF("x")
    val t1 = Ranking.avgRankTable(one, "x").collect()
    assert(t1.length == 1 && t1.head.getDouble(1) == 1.0)

    // nulls and NaNs are excluded from ranking
    val withNulls = Seq[java.lang.Double](1.0, null, Double.NaN, 2.0).toDF("x")
    val t2 = Ranking.avgRankTable(withNulls, "x")
      .orderBy("x").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(t2.toSeq == Seq((1.0, 1.0), (2.0, 2.0)))
  }

  test("pctRankTable == pandas rank(pct=True) incl. ties") {
    // values: 10 x1, 20 x2, 30 x1 -> avgranks 1, 2.5 (tie), 4
    val df = Seq(10.0, 20.0, 20.0, 30.0).toDF("x")
    val t = Ranking.pctRankTable(df, "x")
      .orderBy("x").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(t.toSeq == Seq((10.0, 0.25), (20.0, 0.625), (30.0, 1.0)))

    // nulls/NaNs excluded from both the ranks and the denominator
    val withNulls = Seq[java.lang.Double](5.0, null, Double.NaN).toDF("x")
    val t2 = Ranking.pctRankTable(withNulls, "x").collect()
    assert(t2.length == 1 && t2.head.getDouble(1) == 1.0)

    intercept[IllegalArgumentException] {
      Ranking.pctRankTable(Seq.empty[Double].toDF("x"), "x")
    }
  }
  test("weightedQuantiles: lower weighted quantile, boundaries exact") {
    import spark.implicits._
    // values 1,2,3 with weights 1,2,1 -> W=4; cum: 1->1, 2->3, 3->4
    val df = Seq((1.0, 1L), (2.0, 2L), (3.0, 1L)).toDF("v", "w")
    val got = graft.ops.Ranking
      .weightedQuantiles(df, "v", "w", Seq(0.0, 0.25, 0.5, 0.75, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // q=0.25: qW=1, first v with cum>=1 is 1; q=0.5: qW=2 -> 2;
    // q=0.75: qW=3 -> 2 (cum hits exactly 3); q=1 -> 3
    assert(got == Map(0.0 -> 1.0, 0.25 -> 1.0, 0.5 -> 2.0,
      0.75 -> 2.0, 1.0 -> 3.0))
    // zero/negative weights must not be selectable
    val z = graft.ops.Ranking.weightedQuantiles(
      Seq((0.5, 0L), (1.0, 3L), (9.0, -2L)).toDF("v", "w"),
      "v", "w", Seq(0.5)).head()
    assert(z.getDouble(1) == 1.0)
    // fractional weights round to nearest (0.4 drops, 0.6 counts as 1)
    val fr = graft.ops.Ranking.weightedQuantiles(
      Seq((1.0, 0.4), (2.0, 0.6), (3.0, 2.4)).toDF("v", "w"),
      "v", "w", Seq(0.0, 1.0)).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(fr == Map(0.0 -> 2.0, 1.0 -> 3.0))
    // weighted median equals plain median when weights are all 1
    val rnd = new scala.util.Random(5)
    val xs = Seq.fill(101)(rnd.nextInt(50).toDouble)
    val wq = graft.ops.Ranking.weightedQuantiles(
      xs.map((_, 1L)).toDF("v", "w"), "v", "w", Seq(0.5)).head().getDouble(1)
    assert(wq == xs.sorted.apply(50))
  }
}
