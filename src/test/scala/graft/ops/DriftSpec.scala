package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def ks(a: Seq[Double], b: Seq[Double]): Double =
    Drift.ksTwoSample(a.toDF("v"), b.toDF("v"), "v")
      .head().getDouble(0)

  private def naiveKs(a: Seq[Double], b: Seq[Double]): Double = {
    val vs = (a ++ b).distinct.sorted
    vs.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.size -
        b.count(_ <= v).toDouble / b.size)
    }.max
  }

  test("identical distributions: statistic 0; disjoint: statistic 1") {
    val xs = (1 to 100).map(_.toDouble)
    assert(ks(xs, xs) == 0.0)
    assert(ks(xs, xs.map(_ + 1000.0)) == 1.0)
  }

  test("matches the naive empirical-CDF max gap on random data") {
    val rnd = new scala.util.Random(9)
    val a = Seq.fill(500)(rnd.nextGaussian())
    val b = Seq.fill(300)(rnd.nextGaussian() * 1.5 + 0.3)
    assert(math.abs(ks(a, b) - naiveKs(a, b)) < 1e-12)
    // heavy ties
    val ta = Seq.fill(200)(rnd.nextInt(5).toDouble)
    val tb = Seq.fill(300)(rnd.nextInt(7).toDouble)
    assert(math.abs(ks(ta, tb) - naiveKs(ta, tb)) < 1e-12)
  }

  test("nulls and NaNs are dropped; counts reported per side") {
    val a = Seq(Some(1.0), None, Some(Double.NaN), Some(2.0))
      .toDF("v")
    val b = Seq(Some(1.0), Some(3.0)).toDF("v")
    val r = Drift.ksTwoSample(a, b, "v").head()
    assert(r.getLong(1) == 2 && r.getLong(2) == 2)
  }

  test("psi: ~0 for identical slices, grows with shift, matches naive") {
    val rnd = new scala.util.Random(21)
    val a = Seq.fill(2000)(rnd.nextGaussian())
    val same = Drift.psi(a.toDF("v"), a.toDF("v"), "v").head().getDouble(0)
    assert(same == 0.0) // identical bin counts -> every term is 0
    val b = a.map(_ + 1.0)
    val shifted = Drift.psi(a.toDF("v"), b.toDF("v"), "v", 10).head()
    assert(shifted.getDouble(0) > 0.25, s"shift should score: $shifted")
    // naive replication with the same binning + smoothing
    val all0 = a ++ b
    val (mn, mx) = (all0.min, all0.max)
    val w = (mx - mn) / 10
    def bin(x: Double) = math.min(math.floor((x - mn) / w), 9).toInt
    val c1 = a.groupBy(bin).view.mapValues(_.size.toLong).toMap
    val c2 = b.groupBy(bin).view.mapValues(_.size.toLong).toMap
    val present = (c1.keySet ++ c2.keySet).toSeq.sorted
    val naive = present.map { k =>
      val p1 = (c1.getOrElse(k, 0L) + 0.5) / (a.size + 5.0)
      val p2 = (c2.getOrElse(k, 0L) + 0.5) / (b.size + 5.0)
      (p1 - p2) * math.log(p1 / p2)
    }.sum
    assert(math.abs(shifted.getDouble(0) - naive) < 1e-7)
  }

  test("jsd: 0 for identical, ln2 for disjoint, matches naive") {
    val a = Seq.tabulate(300)(i => (i % 30).toDouble)
    val same = Drift.jsd(a.toDF("v"), a.toDF("v"), "v").head().getDouble(0)
    assert(same == 0.0)
    // fully disjoint supports -> every bin one-sided -> JSD = ln 2
    val lo = Seq.fill(100)(0.0) ++ Seq.fill(100)(1.0)
    val hi = Seq.fill(100)(9.0) ++ Seq.fill(100)(10.0)
    val dis = Drift.jsd(lo.toDF("v"), hi.toDF("v"), "v", 10)
      .head().getDouble(0)
    assert(math.abs(dis - math.log(2)) < 1e-8, s"disjoint: $dis")
    // naive replication on shifted gaussians
    val rnd = new scala.util.Random(31)
    val g1 = Seq.fill(1500)(rnd.nextGaussian())
    val g2 = g1.map(_ * 1.3 + 0.4)
    val r = Drift.jsd(g1.toDF("v"), g2.toDF("v"), "v", 12).head()
    val all0 = g1 ++ g2
    val (mn, mx) = (all0.min, all0.max)
    val w = (mx - mn) / 12
    def bin(x: Double) = math.min(math.floor((x - mn) / w), 11).toInt
    val c1 = g1.groupBy(bin).view.mapValues(_.size.toLong).toMap
    val c2 = g2.groupBy(bin).view.mapValues(_.size.toLong).toMap
    val naive = (c1.keySet ++ c2.keySet).toSeq.map { k =>
      val p1 = c1.getOrElse(k, 0L).toDouble / g1.size
      val p2 = c2.getOrElse(k, 0L).toDouble / g2.size
      val m = (p1 + p2) / 2
      (if (p1 > 0) p1 * math.log(p1 / m) / 2 else 0.0) +
        (if (p2 > 0) p2 * math.log(p2 / m) / 2 else 0.0)
    }.sum
    assert(math.abs(r.getDouble(0) - naive) < 1e-7, s"$r vs $naive")
    assert(r.getLong(1) == 1500 && r.getLong(2) == 1500)
  }

  test("wasserstein: 0 for identical, shift distance for shifted") {
    val a = Seq.tabulate(200)(i => (i % 20).toDouble)
    val same = Drift.wasserstein(a.toDF("v"), a.toDF("v"), "v").head()
    assert(same.getDouble(0) == 0.0)
    // pure translation by d: W1 = d exactly
    val b = a.map(_ + 7.0)
    val shifted = Drift.wasserstein(a.toDF("v"), b.toDF("v"), "v").head()
    assert(shifted.getDouble(0) == 7.0, s"shifted: $shifted")
    assert(shifted.getLong(2) == 200 && shifted.getLong(3) == 200)
    // naive integral on random data
    val rnd = new scala.util.Random(17)
    val g1 = Seq.fill(800)(rnd.nextInt(40).toDouble)
    val g2 = Seq.fill(900)((rnd.nextInt(40) + rnd.nextInt(10)).toDouble)
    val r = Drift.wasserstein(g1.toDF("v"), g2.toDF("v"), "v").head()
    val vs = (g1 ++ g2).distinct.sorted
    val naive = vs.sliding(2).collect { case Seq(v, nxt) =>
      math.abs(g1.count(_ <= v).toDouble / g1.size -
        g2.count(_ <= v).toDouble / g2.size) * (nxt - v)
    }.sum
    assert(math.abs(r.getDouble(0) - naive) < 1e-6, s"$r vs $naive")
  }

  test("wasserstein: partition-boundary gaps are not dropped") {
    // values spread so range partitioning splits them across several
    // partitions; sum of gap terms must still cover every adjacency
    val a = (1 to 64).map(_.toDouble * 10)
    val b = a.map(_ + 130.0) // translation -> W1 = 130 exactly
    val r = Drift.wasserstein(a.toDF("v"), b.toDF("v"), "v").head()
    assert(r.getDouble(0) == 130.0, s"boundary handling: $r")
  }

  test("chi2 homogeneity: 0 for identical shares, matches naive") {
    val a = Seq.fill(40)("x") ++ Seq.fill(60)("y")
    val same = Drift
      .chiSquareHomogeneity(a.toDF("v"), a.toDF("v"), "v").head()
    assert(same.getDouble(0) == 0.0 && same.getLong(1) == 1)

    val b = Seq.fill(70)("x") ++ Seq.fill(25)("y") ++ Seq.fill(5)("z")
    val r = Drift.chiSquareHomogeneity(a.toDF("v"), b.toDF("v"), "v")
      .head()
    // naive: full contingency incl. the a-side-empty 'z' level
    val levels = Seq("x", "y", "z")
    val c1 = Map("x" -> 40.0, "y" -> 60.0, "z" -> 0.0)
    val c2 = Map("x" -> 70.0, "y" -> 25.0, "z" -> 5.0)
    val (n1, n2) = (100.0, 100.0)
    val naive = levels.map { l =>
      val tot = c1(l) + c2(l)
      val e1 = n1 * tot / (n1 + n2); val e2 = n2 * tot / (n1 + n2)
      (c1(l) - e1) * (c1(l) - e1) / e1 + (c2(l) - e2) * (c2(l) - e2) / e2
    }.sum
    assert(math.abs(r.getDouble(0) - naive) < 1e-7, s"$r vs $naive")
    assert(r.getLong(1) == 2) // 3 levels - 1
    assert(r.getLong(2) == 100 && r.getLong(3) == 100)
  }

  test("psiSweep: per-column scores equal psi(); empty columns null") {
    val rnd = new scala.util.Random(41)
    val rows = Seq.fill(600)((rnd.nextGaussian(),
      rnd.nextDouble() * 10, Option.empty[Double]))
    val rows2 = Seq.fill(500)((rnd.nextGaussian() + 0.8,
      rnd.nextDouble() * 10, Option.empty[Double]))
    val d1 = rows.toDF("a", "b", "dead")
    val d2 = rows2.toDF("a", "b", "dead")
    val sweep = Drift.psiSweep(d1, d2, Seq("a", "b", "dead"), bins = 8)
      .collect().map(r => r.getString(0) -> r).toMap
    val pa = Drift.psi(d1, d2, "a", 8).head().getDouble(0)
    val pb = Drift.psi(d1, d2, "b", 8).head().getDouble(0)
    assert(sweep("a").getDouble(1) == pa, s"a: ${sweep("a")} vs $pa")
    assert(sweep("b").getDouble(1) == pb)
    assert(sweep("a").getLong(2) == 600 && sweep("a").getLong(3) == 500)
    assert(sweep("dead").isNullAt(1) && sweep("dead").getLong(2) == 0)

    // one-side-empty column: psi null, counts name the empty side
    val d3 = d1.withColumn("c", lit(1.0))
    val d4 = d2.withColumn("c", lit(null).cast("double"))
    val s2 = Drift.psiSweep(d3, d4, Seq("c"), bins = 8).head()
    assert(s2.isNullAt(1) && s2.getLong(2) == 600 && s2.getLong(3) == 0)

    // a swept column literally named "s" must not shadow the side tag
    val e1 = d1.withColumnRenamed("a", "s")
    val e2 = d2.withColumnRenamed("a", "s")
    val bys = Drift.psiSweep(e1, e2, Seq("s", "b"), bins = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(bys("s") == pa && bys("b") == pb)
  }

  test("symmetry: every two-sample statistic is invariant under swap") {
    val rnd = new scala.util.Random(53)
    val a = Seq.fill(400)(rnd.nextGaussian())
    val b = Seq.fill(300)(rnd.nextGaussian() * 1.4 + 0.3)
    val (da, db) = (a.toDF("v"), b.toDF("v"))
    assert(Drift.ksTwoSample(da, db, "v").head().getDouble(0) ==
      Drift.ksTwoSample(db, da, "v").head().getDouble(0))
    // PSI term (p-q)ln(p/q) is symmetric under swap
    assert(Drift.psi(da, db, "v").head().getDouble(0) ==
      Drift.psi(db, da, "v").head().getDouble(0))
    assert(Drift.jsd(da, db, "v").head().getDouble(0) ==
      Drift.jsd(db, da, "v").head().getDouble(0))
    assert(Drift.wasserstein(da, db, "v").head().getDouble(0) ==
      Drift.wasserstein(db, da, "v").head().getDouble(0))
    val (ca, cb) = (a.map(x => (x * 3).toInt.toString).toDF("v"),
      b.map(x => (x * 3).toInt.toString).toDF("v"))
    assert(Drift.chiSquareHomogeneity(ca, cb, "v").head().getDouble(0) ==
      Drift.chiSquareHomogeneity(cb, ca, "v").head().getDouble(0))
  }

  test("qqTable: identical slices gap 0; shift appears in every row") {
    val a = Seq.tabulate(500)(i => i.toDouble)
    val same = Drift.qqTable(a.toDF("v"), a.toDF("v"), "v").collect()
    assert(same.length == 9)
    assert(same.forall(_.getDouble(3) == 0.0))
    val b = a.map(_ + 42.0)
    val sh = Drift.qqTable(a.toDF("v"), b.toDF("v"), "v",
      Seq(0.25, 0.5, 0.75)).collect()
    assert(sh.map(_.getDouble(0)).toSeq == Seq(0.25, 0.5, 0.75))
    assert(sh.forall(_.getDouble(3) == 42.0), sh.mkString(";"))
    // exact interpolated median of 0..499 on the q1 side
    assert(sh(1).getDouble(1) == 249.5)
  }

  test("ranges: ks∈[0,1], jsd∈[0,ln2], psi/w1/chi2 ≥ 0 on random data") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val a = Seq.fill(200 + rnd.nextInt(100))(
        rnd.nextGaussian() * (1 + rnd.nextInt(3)))
      val b = Seq.fill(150 + rnd.nextInt(100))(
        rnd.nextGaussian() * (1 + rnd.nextInt(3)) + rnd.nextInt(3))
      val (da, db) = (a.toDF("v"), b.toDF("v"))
      val ks = Drift.ksTwoSample(da, db, "v").head().getDouble(0)
      assert(ks >= 0 && ks <= 1, s"seed $seed ks $ks")
      val jsd = Drift.jsd(da, db, "v").head().getDouble(0)
      assert(jsd >= 0 && jsd <= math.log(2) + 1e-9, s"seed $seed jsd $jsd")
      assert(Drift.psi(da, db, "v").head().getDouble(0) >= 0)
      assert(Drift.wasserstein(da, db, "v").head().getDouble(0) >= 0)
      val (ca, cb) = (a.map(x => x.toInt.toString).toDF("v"),
        b.map(x => x.toInt.toString).toDF("v"))
      assert(Drift.chiSquareHomogeneity(ca, cb, "v")
        .head().getDouble(0) >= 0)
    }
  }

  test("empty slice rejected loudly by every statistic") {
    val a = Seq(1.0, 2.0).toDF("v")
    val empty = Seq.empty[Double].toDF("v")
    intercept[IllegalArgumentException](Drift.ksTwoSample(a, empty, "v"))
    intercept[IllegalArgumentException](Drift.psi(a, empty, "v"))
    intercept[IllegalArgumentException](Drift.jsd(empty, a, "v"))
    intercept[IllegalArgumentException](Drift.wasserstein(a, empty, "v"))
    intercept[IllegalArgumentException](
      Drift.chiSquareHomogeneity(a.selectExpr("CAST(v AS STRING) v"),
        empty.selectExpr("CAST(v AS STRING) v"), "v"))
  }

  test("plan shape: no global-window single-partition cumsum") {
    // the statistic is computed via mapPartitions over range partitions;
    // assert the value-count plan itself has no SinglePartition exchange
    val counts = (1 to 100).map(_.toDouble).toDF("v")
      .select(col("v"), lit(0).as("s"))
      .groupBy("v").agg(count(lit(1)).as("c"))
    assert(!counts.queryExecution.executedPlan.toString
      .contains("SinglePartition"))
  }
  test("segmentPsi: equal-size identical segments exactly 0; shifted flagged") {
    // two segments, same distribution, same size -> every term cancels
    val vals = Seq.tabulate(200)(i => (i % 100).toDouble)
    val even = vals.map(("a", _)) ++ vals.map(("b", _))
    val zero = Drift.segmentPsi(even.toDF("s", "v"), "s", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(zero("a") == 0.0 && zero("b") == 0.0)
    // one shifted segment dominates the scores; all psi >= 0
    val mixed = vals.map(("a", _)) ++ vals.map(("b", _)) ++
      vals.map { case v => ("c", v + 500.0) }
    val got = Drift.segmentPsi(mixed.toDF("s", "v"), "s", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.values.forall(_ >= 0.0))
    assert(got("c") > got("a") && got("c") > got("b"))
    assert(got("c") > 1.0, got.toString)
    // a lone segment has no complement: psi must be null, not a
    // smoothing artifact
    val lone = Drift.segmentPsi(
      vals.map(("only", _)).toDF("s", "v"), "s", "v").head()
    assert(lone.getLong(1) == 200 && lone.isNullAt(2))
  }

  test("sequentialPsi: stable days ~0, shifted day alarms, gaps skip") {
    // days 1 and 2 identical uniform; day 4 (gap at 3) all top-bin
    val d1 = (0 until 10).map(i => (1L, i + 0.5))
    val d2 = (0 until 10).map(i => (2L, i + 0.5))
    val d4 = Seq.fill(10)((4L, 9.5))
    val df = (d1 ++ d2 ++ d4).toDF("day", "v")
    val got = Drift.sequentialPsi(df, "day", "v", bins = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(2L, 4L)) // day 1 has no predecessor
    val (p2prev, n2, psi2) = got(2L)
    assert(p2prev == 1L && n2 == 10L && psi2 == 0.0) // identical dists
    val (p4prev, _, psi4) = got(4L)
    assert(p4prev == 2L) // gap day 3 skipped, compares to day 2
    assert(psi4 > 1.0, s"shifted day should alarm: $psi4")
  }
}
