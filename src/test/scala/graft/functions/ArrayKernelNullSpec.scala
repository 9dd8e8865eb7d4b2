package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Null-ELEMENT contract of the codegen'd array kernels (round-10
  * review finding): a null slot nulls the result instead of silently
  * reading 0.0 off the unsafe array. */
class ArrayKernelNullSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Seq(Some(1.0), Some(2.0)), Seq(Some(3.0), Some(4.0))),
    (2L, Seq(Some(1.0), None), Seq(Some(3.0), Some(4.0))),
    (3L, Seq(Some(1.0), Some(2.0)), Seq(None, Some(4.0))))
    .toDF("id", "a", "b")

  test("ArrayDot: null element -> null result (codegen and interpreted)") {
    val out = df.select(col("id"),
        StatFunctions.dotProduct(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) === Some(11.0))
    assert(out(2L).isEmpty && out(3L).isEmpty)
  }

  test("QuantizedSqDist: null element -> null result") {
    val out = df.select(col("id"),
        QuantizedSqDist.qsqdist(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L) === Some(8L * 1000000000000L)) // 4 + 4 quantized
    assert(out(2L).isEmpty && out(3L).isEmpty)
  }

  test("QuantizedSqDist: oversized diffs fail loudly instead of wrapping") {
    // ADVICE r10: floor(d*d*1e12) wraps Long once |d| reaches ~3e3,
    // silently corrupting the ranking. Both the per-element guard and
    // the addExact accumulation must throw instead.
    // local mode surfaces the task failure either wrapped in a
    // SparkException or as the raw ArithmeticException — walk the chain
    def rootMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.toString).mkString(" | ")
    val big = Seq((1L, Seq(0.0), Seq(4.0e3))).toDF("id", "a", "b")
    val e = intercept[Throwable] {
      big.select(QuantizedSqDist.qsqdist(col("a"), col("b"))).collect()
    }
    assert(rootMsg(e).contains("graft_qsqdist overflow"), rootMsg(e))
    // accumulation overflow (each term fits, the sum does not):
    // 32 elements x diff 2e3 -> 32 x 4e18 quantized, sum > 2^63
    val acc = Seq((1L, Seq.fill(32)(0.0), Seq.fill(32)(2.0e3)))
      .toDF("id", "a", "b")
    val e2 = intercept[Throwable] {
      acc.select(QuantizedSqDist.qsqdist(col("a"), col("b"))).collect()
    }
    assert(rootMsg(e2).toLowerCase.contains("overflow"), rootMsg(e2))
    // the documented in-range regime is untouched
    val ok = Seq((1L, Seq(0.0, 1.0), Seq(3.0, 1.5)))
      .toDF("id", "a", "b")
      .select(QuantizedSqDist.qsqdist(col("a"), col("b")).as("d"))
      .head().getLong(0)
    assert(ok === 9L * 1000000000000L + 250000000000L)
  }

  test("knnGraph: zero-norm vectors excluded from both sides") {
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 0f)), // zero norm: cosine undefined
      (4L, Array(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val knn = graft.ops.Similarity.knnGraph(emb, "vec_id", "embedding", 3)
      .collect()
    assert(!knn.exists(r => r.getLong(0) == 3L || r.getLong(2) == 3L),
      "zero-norm vector must appear on neither side")
    // negative-cosine neighbors still rank (no fabricated 0.0 above them)
    val n1 = knn.filter(_.getLong(0) == 1L).sortBy(_.getInt(1))
    assert(n1.map(_.getLong(2)).toSeq === Seq(2L, 4L))
    assert(n1.last.getDouble(3) === -1.0)
  }
}
