package graft.profile

import org.scalatest.funsuite.AnyFunSuite

/** Pure rule-engine tests over hand-built profiles — one per MessageType
  * (reference: model/messages.py:13-57). No Spark involved. */
class AlertsSpec extends AnyFunSuite {
  private val cfg = ProfileConfig.default

  private def numCol(name: String, n: Long = 100, count: Long = 100,
      nDistinct: Long = 50, nUnique: Long = 10,
      stats: NumericStats = numStats()): ColumnProfile =
    ColumnProfile(name, "double", ProfileType.Numeric,
      CommonStats(n, count, nDistinct, nUnique), stats)

  private def numStats(
      skew: Double = 0.0, zeros: Long = 0, inf: Long = 0,
      chi2P: Option[Double] = None): NumericStats =
    NumericStats(1, 1, 1, 0, 10, 100, skew, 0.0, Map(0.5 -> 5.0), 1.0,
      zeros, inf, 100, None, chi2P)

  private def profileOf(cols: ColumnProfile*): TableProfile =
    TableProfile(
      TableStats(100, cols.size, 0, 0.0, Map.empty),
      cols.toSeq, Map.empty, 0, Seq.empty, Seq.empty, Seq.empty,
      Seq.empty, Seq.empty)

  private def kinds(p: TableProfile): Set[String] =
    Alerts.compute(p, cfg).map(_.kind).toSet

  test("ZEROS / INFINITE / SKEWED / UNIFORM fire on numeric stats") {
    val c = numCol("x", stats = numStats(skew = 25.0, zeros = 3, inf = 2,
      chi2P = Some(0.9999)))
    val ks = kinds(profileOf(c))
    assert(Set("ZEROS", "INFINITE", "SKEWED", "UNIFORM").subsetOf(ks))
  }

  test("CONSTANT + REJECTED on single-valued column") {
    val ks = kinds(profileOf(numCol("c", nDistinct = 1, nUnique = 0)))
    assert(ks.contains("CONSTANT") && ks.contains("REJECTED"))
  }

  test("UNIQUE when every value distinct") {
    val ks = kinds(profileOf(numCol("u", nDistinct = 100, nUnique = 100)))
    assert(ks.contains("UNIQUE"))
  }

  test("MISSING on null counts") {
    val ks = kinds(profileOf(numCol("m", count = 90)))
    assert(ks.contains("MISSING"))
  }

  test("HIGH_CARDINALITY only for categorical columns") {
    val cat = ColumnProfile("hc", "string", ProfileType.Categorical,
      CommonStats(100, 100, 80, 60),
      CategoricalStats(Seq("a" -> 2L), None, None, None))
    assert(kinds(profileOf(cat)).contains("HIGH_CARDINALITY"))
    assert(!kinds(profileOf(numCol("n", nDistinct = 80)))
      .contains("HIGH_CARDINALITY"))
  }

  test("CONSTANT_LENGTH for fixed-width strings") {
    val cat = ColumnProfile("cl", "string", ProfileType.Categorical,
      CommonStats(100, 100, 10, 5),
      CategoricalStats(Seq("aa" -> 20L),
        Some(LengthStats(2.0, 2, 2, 2.0)), None, None))
    assert(kinds(profileOf(cat)).contains("CONSTANT_LENGTH"))
  }

  test("UNSUPPORTED + REJECTED for unsupported types") {
    val u = ColumnProfile("arr", "array<int>", ProfileType.Unsupported,
      CommonStats(100, 0, 0, 0), UnsupportedStats)
    val ks = kinds(profileOf(u))
    assert(ks.contains("UNSUPPORTED") && ks.contains("REJECTED"))
  }

  test("TYPE_DATE for datetime columns") {
    val d = ColumnProfile("d", "timestamp", ProfileType.DateTime,
      CommonStats(100, 100, 90, 80), DateTimeStats(0, 1000, None))
    assert(kinds(profileOf(d)).contains("TYPE_DATE"))
  }

  test("DUPLICATES above the row-fraction threshold") {
    val p = profileOf(numCol("x")).copy(nDuplicates = 5)
    assert(kinds(p).contains("DUPLICATES"))
    val below = profileOf(numCol("x")).copy(nDuplicates = 0)
    assert(!kinds(below).contains("DUPLICATES"))
  }

  test("HIGH_CORRELATION from matrices and Cramer's V") {
    val p = profileOf(numCol("a"), numCol("b")).copy(
      correlations = Seq(CorrelationMatrix("pearson", Seq("a", "b"),
        Seq(Seq(1.0, 0.95), Seq(0.95, 1.0)))),
      cramers = Seq(CramersResult("c1", "c2", 50.0, 0.0, 0.93)))
    val alerts = Alerts.compute(p, cfg).filter(_.kind == "HIGH_CORRELATION")
    assert(alerts.size == 2)
  }
}
