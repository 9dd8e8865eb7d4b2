package graft

import org.scalatest.funsuite.AnyFunSuite

/** Stress-trend tripwire (verdict r9 task #3) — pure helpers, no Spark. */
class BenchTrendSpec extends AnyFunSuite {

  private val prevLine =
    """{"round":"r9","epoch_ms":1,"stress":{"base_dir":"/b","reps":10.0,""" +
      """"queries":{"q165_mutual_knn":[1.56,58.2,37.3],""" +
      """"q22_ngram_jaccard":[1.83,10.2,5.60],""" +
      """"q00c_profile_gate":[7.4,45.2,6.10]},"suspects":[]}}"""

  test("parseStressRow extracts [base, stress, ratio] triples") {
    val m = Bench.parseStressRow(prevLine)
    assert(m.size === 3)
    assert(m("q165_mutual_knn") === ((1.56, 58.2, 37.3)))
    assert(Bench.parseStressRow("not json at all").isEmpty)
  }

  test("parseStressRow tolerates the round-12 retry (4th) element") {
    // a tripped query's row carries [base, stress, ratio, retry_s];
    // the NEXT round's trend comparison must still see its triple
    val line = """{"queries":{"q185_lsh_cand_clusters":[3.1,57.0,18.4,12.9],""" +
      """"q67_range_join":[2.4,31.5,13.1]}}"""
    val m = Bench.parseStressRow(line)
    assert(m.size === 2)
    assert(m("q185_lsh_cand_clusters") === ((3.1, 57.0, 18.4)))
    assert(m("q67_range_join") === ((2.4, 31.5, 13.1)))
  }

  test("trendSuspects trips on >1.5x normalized-ratio move above linear") {
    val prev = Bench.parseStressRow(prevLine)
    // q165 ratio 37.3 -> 161.0 (norm 3.73 -> 16.1): trips even though
    // it carries a waiver in Bench's absolute check
    val rows = Seq(
      ("q165_mutual_knn", 1.56, 251.8, 161.0),
      ("q22_ngram_jaccard", 1.80, 9.85, 5.47), // stable: no trip
      ("q00c_profile_gate", 7.6, 39.2, 5.16)) // improved: no trip
    assert(Bench.trendSuspects(prev, rows, 10.0) === Seq("q165_mutual_knn"))
  }

  test("trendSuspects ignores sub-linear jitter and unknown queries") {
    val prev = Map(
      "qA" -> ((1.0, 3.0, 3.0)), // norm 0.3
      "qB" -> ((0.01, 0.02, 2.0))) // base too small to trust
    val rows = Seq(
      ("qA", 1.0, 5.0, 5.0), // 0.3 -> 0.5 of linear: healthy, no trip
      ("qB", 0.01, 0.9, 90.0), // prev base under floor: no trip
      ("qNew", 1.0, 80.0, 80.0)) // no history: no trip
    assert(Bench.trendSuspects(prev, rows, 10.0).isEmpty)
  }

  test("trendSuspects normalizes by each round's reps; failed excluded") {
    val prev = Map("qA" -> ((1.0, 20.0, 20.0))) // reps 10: norm 2.0
    // current round at reps=20: raw ratio 42 is norm 2.1 — NOT a trip
    val rows = Seq(("qA", 1.0, 42.0, 42.0))
    assert(Bench.trendSuspects(prev, rows, 20.0, 10.0).isEmpty)
    // same raw ratio read at reps=10 IS a trip (norm 4.2 > 1.5*2.0)
    assert(Bench.trendSuspects(prev, rows, 10.0, 10.0) === Seq("qA"))
    // a stress-failed query never trips on its time-to-failure ratio
    assert(Bench.trendSuspects(prev, rows, 10.0, 10.0,
      failed = Set("qA")).isEmpty)
    assert(Bench.parseStressReps("""{"reps":20.0,"x":1}""") === 20.0)
    assert(Bench.parseStressReps("""{"x":1}""") === 10.0)
  }

  test("lastUsableStressRow skips polluted and killed-run garbage rows") {
    val good = prevLine
    val polluted = prevLine.replace("\"round\":\"r9\"",
      "\"round\":\"r9x\",\"polluted\":true")
    val killed =
      """{"round":"k","stress":{"queries":{"qA":[0.004,0.004,1.0],""" +
        """"qB":[0.003,0.004,1.3]}}}"""
    assert(Bench.lastUsableStressRow(Seq(good, polluted, killed))
      .exists(_.contains("q165_mutual_knn")))
    assert(Bench.lastUsableStressRow(Seq(killed)).isEmpty)
    assert(Bench.lastUsableStressRow(Nil).isEmpty)
  }

  test("lastUsableStressRow skips subset rows (targeted 100x " +
    "evidence must not become the trend baseline)") {
    val good = prevLine
    val subset =
      """{"round":"r15x100","subset":true,"polluted":false,"stress":""" +
        """{"reps":100,"queries":{"q392_link_graph_scale":""" +
        """[0.5,10.0,20.0]}}}"""
    // a later subset row must NOT shadow the last full row
    assert(Bench.lastUsableStressRow(Seq(good, subset))
      .exists(_.contains("q165_mutual_knn")))
    assert(Bench.lastUsableStressRow(Seq(subset)).isEmpty)
  }
}
