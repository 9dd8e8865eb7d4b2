package graft.profile

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Error bounds for the 100 TB operating mode (q00b_profile_sketch):
  * HLL++ distinct counts and Greenwald-Khanna quantiles vs the exact
  * paths, on real sf0.01 data. These are the properties that make the
  * sketch profile TRUSTWORTHY at scale, where exact is unaffordable. */
class SketchAccuracySpec extends SparkSpec {

  private lazy val df =
    spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")

  // only the count/distinct/quantile machinery under test — the other
  // passes are identical between modes and only slow the spec down
  private def cfg(exact: Boolean) = ProfileConfig.default.copy(
    exactDistinct = exact, exactQuantiles = exact,
    computeCorrelations = false, computeCharStats = false,
    computeHistograms = false, computeMad = false,
    computeDuplicates = false)

  private lazy val exactP = Profiler.profile(df, cfg(exact = true))
  private lazy val sketchP = Profiler.profile(df, cfg(exact = false))

  test("HLL++ distinct counts within 3 rsd of exact on every column") {
    // the bound derives from whatever rsd the profiler requests
    // (ProfileConfig.distinctRsd, 0.02 at the time of writing -> 6%);
    // deterministic for a given corpus, so this cannot flake
    val exact = exactP.columns.map(c => c.name -> c.common.nDistinct).toMap
    sketchP.columns.foreach { c =>
      val e = exact(c.name)
      if (e > 0) {
        val rel = math.abs(c.common.nDistinct - e).toDouble / e
        assert(rel <= 3 * ProfileConfig.default.distinctRsd,
          s"${c.name}: approx=${c.common.nDistinct} exact=$e rel=$rel")
      }
    }
  }

  test("GK quantiles land inside the exact [p-2eps, p+2eps] envelope") {
    // Greenwald-Khanna guarantees the returned value's RANK is within
    // eps*n of the target rank (eps = quantileRelativeError). Verified
    // value-wise: each sketch quantile must lie between the exact
    // quantiles at p +- 2eps (2x: the envelope endpoints interpolate
    // between order statistics, so a 1-eps band can clip a legal value)
    val eps = ProfileConfig.default.quantileRelativeError
    val numeric = sketchP.columns.collect {
      case c if c.typed.isInstanceOf[NumericStats] =>
        c.name -> c.typed.asInstanceOf[NumericStats].quantiles
    }
    assert(numeric.nonEmpty)
    numeric.foreach { case (name, qs) =>
      val ps = qs.keys.toSeq.sorted
      val los = ps.map(p => math.max(0.0, p - 2 * eps))
      val his = ps.map(p => math.min(1.0, p + 2 * eps))
      val row = df.select(
        expr(s"percentile(cast(`$name` as double), array(${los.mkString(",")}))"),
        expr(s"percentile(cast(`$name` as double), array(${his.mkString(",")}))"))
        .head()
      val lo = row.getSeq[Double](0)
      val hi = row.getSeq[Double](1)
      ps.zipWithIndex.foreach { case (p, i) =>
        val v = qs(p)
        assert(v >= lo(i) - 1e-9 && v <= hi(i) + 1e-9,
          s"$name q$p: sketch=$v outside exact envelope [${lo(i)}, ${hi(i)}]")
      }
    }
  }

  test("sketch-mode Spearman equals exact-mode (ranks are exact either way)") {
    // only the DISTINCT/QUANTILE estimates are approximate; Spearman
    // ranks come from an exact melt-groupBy in sketch mode, and the
    // HLL-gated broadcast plan must produce the same matrix as exact
    // mode's counts-derived ranks
    def spearman(exact: Boolean) = Profiler.profile(df,
      cfg(exact).copy(computeCorrelations = true, computeSpearman = true))
      .correlations.find(_.method == "spearman").get
    val e = spearman(exact = true)
    val s = spearman(exact = false)
    assert(e.columns == s.columns)
    e.values.flatten.zip(s.values.flatten).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"spearman drift: $a vs $b")
    }
  }

  test("sketch-mode report omits uniqueness instead of emitting -1") {
    val json = ProfileJson.toJson(sketchP)
    assert(!json.contains("\"n_unique\":-1"))
    assert(!json.contains("\"n_unique\""), "uniqueness not computed in sketch mode")
    // exact mode still reports it
    assert(ProfileJson.toJson(exactP).contains("\"n_unique\""))
  }

  test("sketch-mode top-K: exact values+counts while cardinality fits the sketch") {
    // approx_top_k (DataSketches frequent-items) is EXACT until a
    // column's cardinality exceeds the sketch map (~1.5x maxTracked).
    // Every low-cardinality lineitem column must therefore match exact
    // mode's pass-B top-K bit-for-bit, proving the 100 TB mode now ships
    // real top values (it used to ship none).
    def tops(p: TableProfile) = p.columns.collect {
      case c if c.typed.isInstanceOf[CategoricalStats] =>
        c.name -> ((c.common.nDistinct,
          c.typed.asInstanceOf[CategoricalStats].topValues))
    }.toMap
    val exact = tops(exactP)
    var checked = 0
    tops(sketchP).foreach { case (name, (_, skTop)) =>
      val (eDistinct, eTop) = exact(name)
      if (eDistinct <= ProfileConfig.default.sketchTopKMaxTracked) {
        assert(skTop.nonEmpty, s"$name: sketch top-K empty")
        val e = eTop.toMap
        skTop.foreach { case (v, cnt) =>
          assert(e.get(v).contains(cnt),
            s"$name: sketch ($v, $cnt) vs exact ${e.get(v)}")
          checked += 1
        }
      }
    }
    assert(checked > 0)
  }

  test("sketch-mode top-K: planted heavy hitter survives above-capacity cardinality") {
    import spark.implicits._
    // 60k distinct tail values >> maxTracked=256, one value at ~14% of
    // the stream: the frequent-items guarantee (error <= 3.5n/mapSize)
    // must surface it at rank 1 with a count within that bound
    val n = 70000
    val planted = (0 until n).map(i =>
      if (i % 7 == 0) "HEAVY" else s"tail-$i").toDF("v")
    val p = Profiler.profile(planted, ProfileConfig.default.copy(
      exactDistinct = false, exactQuantiles = false,
      sketchTopKMaxTracked = 256,
      computeCorrelations = false, computeCharStats = false,
      computeHistograms = false, computeMad = false,
      computeDuplicates = false))
    val topK = p.columns.head.typed.asInstanceOf[CategoricalStats].topValues
    assert(topK.nonEmpty)
    val (topV, topCnt) = topK.head
    val trueCnt = n / 7
    assert(topV == "HEAVY", s"top value was $topV")
    // mapSize = nextPow2(256/0.75) = 512; bound 3.5*n/512 ~ 479
    assert(math.abs(topCnt - trueCnt) <= 3.5 * n / 512,
      s"count $topCnt vs true $trueCnt")
  }

  test("sketch mode: n/count identical to exact (only estimates differ)") {
    val exact = exactP.columns.map(c => c.name -> c.common).toMap
    sketchP.columns.foreach { c =>
      assert(c.common.n == exact(c.name).n)
      assert(c.common.count == exact(c.name).count)
    }
  }
}
