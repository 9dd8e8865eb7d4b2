package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("windowed approx distinct: per-window sketch within HLL error") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = StreamingDistinct.windowedApproxDistinct(
      mem.toDF.toDF("ts", "k"), "ts", "k", "10 minutes", "1 minute",
      relativeSD = 0.02)
    val q = out.writeStream.format("memory").queryName("sdistinct")
      .outputMode(OutputMode.Update()).start()

    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 09:$min%02d:00")
    // window 1: 1000 distinct keys, each twice; window 2: 10 distinct
    val w1 = (0 until 1000).flatMap(i =>
      Seq((t(1), s"u$i"), (t(5), s"u$i")))
    val w2 = (0 until 10).map(i => (t(12), s"v$i"))
    mem.addData(w1 ++ w2: _*)
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT * FROM sdistinct ORDER BY w_start").collect()
    q.stop()

    assert(rows.length == 2)
    val d1 = rows(0).getLong(2)
    // HLL++ at rsd 0.02: 1000 true distinct, allow a generous 5x rsd
    assert(math.abs(d1 - 1000) <= 100, s"window1 estimate off: $d1")
    assert(rows(1).getLong(2) == 10) // small cardinalities are exact
  }
}
