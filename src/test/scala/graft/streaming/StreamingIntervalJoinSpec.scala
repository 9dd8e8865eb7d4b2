package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingIntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("stream-stream interval join matches keyed events within the span") {
    implicit val sqlCtx = spark.sqlContext
    val errors = MemoryStream[(Long, java.sql.Timestamp, String)]
    val actions = MemoryStream[(Long, java.sql.Timestamp, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-sij-ckpt").toString
    val joined = StreamingIntervalJoin.intervalJoin(
      actions.toDF.toDF("a_user", "a_ts", "action"),
      errors.toDF.toDF("e_user", "e_ts", "err"),
      "a_user", "e_user", "a_ts", "e_ts", spanSeconds = 100L)
    val query = joined
      .selectExpr("action", "err")
      .writeStream.format("memory").queryName("sij")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()

    // error at t=100 for user 1; actions in and out of [100, 200]
    errors.addData((1L, ts(100), "boom"))
    actions.addData(
      (1L, ts(150), "in_window"),
      (1L, ts(100), "at_start"), // inclusive lower bound
      (1L, ts(200), "at_end"),   // inclusive upper bound
      (1L, ts(250), "too_late"),
      (1L, ts(50), "before"),
      (2L, ts(150), "other_user"))
    query.processAllAvailable()
    // a second batch can still match the SAME error (right row sits in
    // the join state until the watermark passes its window)
    actions.addData((1L, ts(180), "second_batch"))
    query.processAllAvailable()
    val rows = spark.sql("SELECT action, err FROM sij")
      .as[(String, String)].collect().toSet
    query.stop()

    assert(rows == Set(
      ("in_window", "boom"), ("at_start", "boom"), ("at_end", "boom"),
      ("second_batch", "boom")))
  }
}
