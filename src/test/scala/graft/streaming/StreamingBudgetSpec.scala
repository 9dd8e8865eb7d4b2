package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingBudgetSpec extends SparkSpec {
  import spark.implicits._

  private def drive(budget: Long,
      batches: Seq[(String, Long, Long)]*): Seq[(String, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-budget-ckpt").toString
    val sink = "budget_" + java.util.UUID.randomUUID.toString.take(8)
    val out = StreamingBudget.admitByBudget(
      mem.toDF.toDF("source", "doc_id", "tk"),
      "source", "doc_id", "tk", budget)
    val query = out.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b =>
        mem.addData(b.toIndexedSeq)
        query.processAllAvailable()
      }
      spark.table(sink)
        .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
        .toSeq
    } finally {
      query.stop()
      spark.sql(s"DROP VIEW IF EXISTS $sink")
    }
  }

  test("budget carries across micro-batches and closes the source") {
    // batch 1: a consumes 900 of 1000; batch 2: 90 fits, the NEXT doc
    // overflows and every later doc is rejected (greedy prefix: the
    // running total includes rejected docs, so a smaller later doc
    // cannot reopen the source). Source b is independent.
    val got = drive(1000L,
      Seq(("a", 1L, 500L), ("a", 2L, 400L), ("b", 3L, 999L)),
      Seq(("a", 4L, 90L), ("a", 5L, 100L), ("a", 6L, 5L), ("b", 7L, 1L)))
    assert(got == Seq(
      ("a", 1L, 500L, 500L), ("a", 2L, 400L, 900L), ("a", 4L, 90L, 990L),
      ("b", 3L, 999L, 999L), ("b", 7L, 1L, 1000L)))
  }

  test("within-batch admission is ascending-id regardless of arrival order") {
    // ids arrive reversed within the batch; admission must process 1,2,3
    val got = drive(250L,
      Seq(("s", 3L, 100L), ("s", 1L, 100L), ("s", 2L, 100L)))
    assert(got == Seq(("s", 1L, 100L, 100L), ("s", 2L, 100L, 200L)))
  }

  test("zero budget admits nothing but still tracks state") {
    val got = drive(0L, Seq(("s", 1L, 1L)), Seq(("s", 2L, 0L)))
    // cum after doc 1 is 1 > 0, and even the zero-token doc 2 sits at
    // cum 1 > 0 -> rejected
    assert(got.isEmpty)
  }
}
