package graft.functions

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions match the Column API") {
    GraftFunctions.register(spark)
    val d = spark.sql(
      """SELECT graft_dot(cast(array(1.0, 2.0) as array<double>),
                          cast(array(3.0, 4.0) as array<double>)) AS d""")
      .head().getDouble(0)
    assert(d == 11.0)
    val g = spark.sql(
      "SELECT graft_word_ngrams('The quick the QUICK', 2, true) AS g")
      .head().getSeq[String](0)
    assert(g == Seq("the quick", "quick the"))
    // defaults: n = 1, multiplicity kept
    val w = spark.sql("SELECT graft_word_ngrams('A b a') AS w")
      .head().getSeq[String](0)
    assert(w == Seq("a", "b", "a"))
    // null-safe
    assert(spark.sql("SELECT graft_word_ngrams(cast(null as string)) AS w")
      .head().isNullAt(0))
  }

  test("non-literal n is rejected with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_word_ngrams('a b', 1 + 1) AS g").collect()
    }
    assert(e.getMessage.contains("graft_word_ngrams") ||
      e.getMessage.contains("literal"))
  }
}
