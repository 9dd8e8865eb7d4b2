package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity of the codegen'd WordNgramsExpr against the higher-order-
  * function construction it replaced, plus edge cases. */
class WordNgramsSpec extends SparkSpec {
  import spark.implicits._

  private def hofNgrams(c: org.apache.spark.sql.Column, n: Int,
      dedupe: Boolean): org.apache.spark.sql.Column = {
    val ws = filter(split(lower(c), "\\s+"), w => length(w) > 0)
    val grams = transform(
      sequence(lit(1), size(ws) - lit(n - 1)),
      i => concat_ws(" ", slice(ws, i, lit(n))))
    val g = when(size(ws) >= n, grams).otherwise(array().cast("array<string>"))
    if (dedupe) array_distinct(g) else g
  }

  private val docs = Seq(
    "The Quick brown FOX jumps over the quick brown fox",
    "  leading and   multiple   spaces\ttabs\nnewlines  ",
    "one",
    "",
    "Élysée ÉLYSéE unicode CASE",
    "a b a b a b" // heavy repeats: distinct vs multiplicity diverge
  ).toDF("text")

  test("expression == HOF form for n = 1, 2, 3, distinct and not") {
    for (n <- Seq(1, 2, 3); d <- Seq(true, false)) {
      val got = docs.select(
        WordNgramsExpr.ngrams(col("text"), n, d).as("g")).collect()
        .map(_.getSeq[String](0))
      val want = docs.select(hofNgrams(col("text"), n, d).as("g")).collect()
        .map(_.getSeq[String](0))
      assert(got.toSeq == want.toSeq, s"mismatch at n=$n distinct=$d")
    }
  }

  test("null text yields null; short docs yield empty arrays") {
    val df = Seq[Option[String]](None, Some("only two")).toDF("text")
    val r = df.select(WordNgramsExpr.ngrams(col("text"), 3, false).as("g"))
      .collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getSeq[String](0).isEmpty)
  }

  test("distinct keeps first-occurrence order (array_distinct parity)") {
    val r = Seq("b a b c a").toDF("t")
      .select(WordNgramsExpr.ngrams(col("t"), 1, distinct = true))
      .head().getSeq[String](0)
    assert(r == Seq("b", "a", "c"))
  }
}
