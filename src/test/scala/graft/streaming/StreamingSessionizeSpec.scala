package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("sessions split on gap, merge out-of-order events, emit when final") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ssess-ckpt").toString
    val out = StreamingSessionize.sessionStats(
      mem.toDF.toDF("user", "ts", "v"), "user", "ts", "10 seconds", "v")
    val query = out.writeStream.format("memory").queryName("ssess")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()

    // user 1: events at 0s and 5s (one session), then 100s (a new one);
    // the 3s event arrives LATE in the second batch but still merges into
    // the first session (watermark hasn't closed it in batch 1)
    mem.addData((1L, ts(0), 1.0), (1L, ts(5), 2.0))
    query.processAllAvailable()
    mem.addData((1L, ts(3), 4.0), (1L, ts(100), 8.0))
    query.processAllAvailable()
    // nothing final yet at watermark=100: session [0,15) is closed by the
    // watermark only in the NEXT trigger; push it + finalize session @100
    mem.addData((2L, ts(500), 16.0))
    query.processAllAvailable()
    mem.addData((2L, ts(1000), 32.0))
    query.processAllAvailable()
    val rows = spark
      .sql("SELECT user, session_start, session_end, n_events, sum_value FROM ssess")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
      .collect().sortBy(r => (r._1, r._2.getTime))
    query.stop()

    // session 1: events 0,3,5 -> window [0, 15), 3 events, sum 7
    // session 2: event 100 -> [100, 110), 1 event, sum 8
    // user 2's t=500 session finalizes when watermark reaches 1000
    assert(rows.map(r => (r._1, r._2.getTime / 1000, r._3.getTime / 1000,
      r._4, r._5)).toSeq == Seq(
      (1L, 0L, 15L, 3L, 7.0),
      (1L, 100L, 110L, 1L, 8.0),
      (2L, 500L, 510L, 1L, 16.0)))
  }

  test("batch-mode session_window agrees with ops.Sessionize off-boundary") {
    // same timeline through both engines: gaps 4,20 (split), 3
    val events = Seq((1L, 100L), (1L, 104L), (1L, 124L), (1L, 127L))
    val batch = StreamingSessionize.sessionStats(
      events.map { case (u, t) => (u, ts(t), 1.0) }.toDF("user", "ts", "v"),
      "user", "ts", "10 seconds", "v")
      .select("n_events").as[Long].collect().sorted.toSeq
    val exact = graft.ops.Sessionize.sessionize(
      events.toDF("user", "t"), "user", "t", gap = 10L)
      .groupBy("session_id").count()
      .select("count").as[Long].collect().sorted.toSeq
    assert(batch == Seq(2L, 2L) && exact == Seq(2L, 2L))
  }
}
