package graft

/** The zero-row vacuous-gate detector (round-11, the q326 lesson): a
  * gate whose Spark result is EMPTY hash-matches an empty oracle no
  * matter how wrong the query is, so both harnesses must refuse a
  * 0-row result unless the query carries an allowlist reason. */
class ZeroRowGateSpec extends SparkSpec {

  test("vacuous predicate: 0 rows without allowlist entry is flagged") {
    assert(Verify.vacuous("q999_seeded_empty", 0L))
    assert(!Verify.vacuous("q999_seeded_empty", 1L))
    // the one legitimate empty gate passes through
    assert(SparkEntry.zeroRowAllowlist.contains("q27_embed_neardup"))
    assert(!Verify.vacuous("q27_embed_neardup", 0L))
  }

  test("allowlist hygiene: every entry names a real query and a reason") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.zeroRowAllowlist.foreach { case (name, reason) =>
      assert(qs.contains(name), s"allowlist entry $name is not a query")
      assert(reason.trim.length > 20,
        s"allowlist entry $name must carry a substantive reason")
    }
  }

  test("dumpGated WITHHOLDS a seeded empty result so the gate fails red") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft-zerorow").toString
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val r = Verify.dumpGated(spark, "q999_seeded_empty", empty, out)
    assert(r == -1L, "vacuous result must be withheld")
    assert(!new java.io.File(s"$out/q999_seeded_empty").exists(),
      "withheld output dir must be deleted (driver then records FAIL)")
    Verify.deleteRecursively(new java.io.File(out))
  }

  test("dumpGated keeps a non-empty result and an allowlisted empty one") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft-zerorow2").toString
    val nonEmpty = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    assert(Verify.dumpGated(spark, "q999_nonempty", nonEmpty, out) == 2L)
    assert(new java.io.File(s"$out/q999_nonempty").exists())
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    assert(Verify.dumpGated(spark, "q27_embed_neardup", empty, out) == 0L)
    assert(new java.io.File(s"$out/q27_embed_neardup").exists(),
      "allowlisted empty gate keeps its output (compares empty-vs-empty)")
    Verify.deleteRecursively(new java.io.File(out))
  }
}
