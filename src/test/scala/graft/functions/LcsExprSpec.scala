package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LcsExprSpec extends SparkSpec {
  import spark.implicits._

  private def lcsOf(a: String, b: String): (Long, Long) = {
    val r = Seq((a, b)).toDF("a", "b")
      .select(LcsExpr.lcs(col("a"), col("b")).as("s"))
      .select(col("s.len"), col("s.b_start")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Brute reference: longest L with some length-L substring of b
    * contained in a; ties resolved to the earliest END in b. */
  private def brute(a: String, b: String): (Long, Long) = {
    var best = 0; var bStart = 0
    var e = 0
    while (e < b.length) { // e = end index (inclusive)
      var l = math.min(best + 1, e + 1)
      // grow l while the suffix of length l ending at e occurs in a
      var grown = true
      while (grown && l <= e + 1) {
        if (a.contains(b.substring(e - l + 1, e + 1))) {
          if (l > best) { best = l; bStart = e - l + 2 }
          l += 1
        } else grown = false
      }
      e += 1
    }
    (best.toLong, if (best == 0) 0L else bStart.toLong)
  }

  test("known values and the earliest-end tie-break") {
    assert(lcsOf("abcdef", "zcdez") === ((3L, 2L))) // "cde" at b pos 2
    assert(lcsOf("xy ab", "ab xy") === ((2L, 1L))) // "ab" ends first in b
    assert(lcsOf("aaaa", "aa") === ((2L, 1L)))
    assert(lcsOf("abc", "xyz") === ((0L, 0L)))
    assert(lcsOf("", "abc") === ((0L, 0L)))
    assert(lcsOf("abc", "") === ((0L, 0L)))
    assert(lcsOf("banana", "ananas") === ((5L, 1L))) // "anana"
  }

  test("null propagates; struct schema is <len, b_start> bigint") {
    val df = Seq((Some("ab"), None: Option[String])).toDF("a", "b")
      .select(LcsExpr.lcs(col("a"), col("b")).as("s"))
    assert(df.head().isNullAt(0))
    assert(df.schema("s").dataType === LcsExpr.OutType)
  }

  test("fuzz against the quadratic reference (small alphabet, heavy repeats)") {
    val rnd = new scala.util.Random(1234)
    def randStr(n: Int, k: Int) =
      (1 to n).map(_ => ('a' + rnd.nextInt(k)).toChar).mkString
    val cases = (1 to 120).map { i =>
      (randStr(1 + rnd.nextInt(60), 2 + rnd.nextInt(3)),
        randStr(1 + rnd.nextInt(60), 2 + rnd.nextInt(3)))
    }
    cases.foreach { case (a, b) =>
      val got = lcsOf(a, b)
      val want = brute(a, b)
      assert(got === want, s"a=$a b=$b")
      // the reported span really is a common substring
      if (got._1 > 0) {
        val sub = b.substring(got._2.toInt - 1, got._2.toInt - 1 + got._1.toInt)
        assert(a.contains(sub))
      }
    }
  }
}
