package graft.profile

import graft.SparkSpec
import org.scalatest.prop.TableDrivenPropertyChecks
import org.scalacheck.Gen

/** Property tests per SURVEY §5: structural invariants that must hold for
  * any input (n = count + n_missing, ratios in [0,1], histogram mass
  * conservation, duplicate monotonicity under union). Uses a handful of
  * generated frames rather than per-test Spark jobs for wall-clock. */
class ProfilerPropertySpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private val gen = Gen.listOfN(40,
    Gen.option(Gen.chooseNum(-1e6, 1e6, 0.0, 1.0, -1.0)))

  private def sample(i: Int): List[Option[Double]] =
    gen(org.scalacheck.Gen.Parameters.default,
      org.scalacheck.rng.Seed(i.toLong)).get

  test("invariants hold across generated numeric frames") {
    val cfg = ProfileConfig.default.copy(
      persist = false, computeCorrelations = false, computeCramers = false,
      computeCharStats = false)
    (1 to 5).foreach { i =>
      val data = sample(i)
      val p = Profiler.profile(data.toDF("v"), cfg)
      val c = p.columns.head
      val s = c.common
      assert(s.n == data.size)
      assert(s.count == data.count(_.isDefined))
      assert(s.n == s.count + s.nMissing)
      assert(s.pMissing >= 0 && s.pMissing <= 1)
      assert(s.pDistinct >= 0 && s.pDistinct <= 1)
      assert(s.pUnique >= 0 && s.pUnique <= 1)
      assert(s.nUnique <= s.nDistinct)
      c.typed match {
        case n: NumericStats =>
          n.histogram.foreach { h =>
            assert(h.counts.sum == s.count, s"histogram mass for seed $i")
            assert(h.binEdges.size == h.counts.size + 1)
          }
          if (s.count > 0) {
            assert(n.min <= n.max)
            assert(n.nZeros <= s.count)
          }
        case _ => () // low-cardinality draws demote to Categorical
      }
    }
  }

  test("union with self doubles duplicates monotonically") {
    val df = (1 to 30).map(i => (i % 7, s"v${i % 5}")).toDF("a", "b")
    val cfg = ProfileConfig.minimal.copy(
      exactDistinct = true, computeDuplicates = true, persist = false)
    val single = Profiler.profile(df, cfg)
    val doubled = Profiler.profile(df.union(df), cfg)
    assert(doubled.nDuplicates >= single.nDuplicates + 30)
    assert(doubled.table.n == 60)
  }
}
