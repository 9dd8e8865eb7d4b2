package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // reference values pinned against DuckDB's jaro_winkler_similarity
  private val pinned = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("CRATE", "TRACE", 0.7333333333333334), // > 0.7 but prefix 0
    ("DwAyNE", "DuANE", 0.8400000000000001),
    // below the 0.7 boost threshold: prefix 2 must NOT boost
    ("ABCD", "ABZZZZZZZZZZZZZZZZZZZZ", 0.5303030303030303),
    ("AB", "ABCDEFGHIJKLMNOP", 0.7666666666666667),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("a", "", 0.0))

  test("similarity matches the DuckDB reference values bit-for-bit") {
    pinned.foreach { case (a, b, want) =>
      assert(JaroWinkler.similarity(a, b) === want, s"($a, $b)")
      assert(JaroWinkler.similarity(b, a) === want, s"($b, $a) symmetric")
    }
  }

  test("codegen'd column path agrees with the static method") {
    val got = pinned.map { case (a, b, _) => (a, b) }
      .toDF("a", "b")
      .select(JaroWinkler.jw(col("a"), col("b")).as("jw"))
      .as[Double].collect().toSeq
    assert(got === pinned.map(_._3))
  }

  test("SQL surface registered, null in -> null out") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA', 'MARHTA'), " +
        "graft_jaro_winkler(CAST(NULL AS STRING), 'x')").head()
    assert(r.getDouble(0) === 0.9611111111111111)
    assert(r.isNullAt(1))
  }
}
