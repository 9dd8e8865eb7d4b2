package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("windowed streaming profile matches batch aggregates per window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double, String)]
    val df = mem.toDF.toDF("ts", "value", "kind")

    val profiled = StreamingProfiler.windowedProfile(
      df, "ts", "10 minutes", "1 minute")
    val query = profiled.writeStream
      .format("memory").queryName("prof").outputMode(OutputMode.Update())
      .start()

    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    mem.addData(
      (t(1), 1.0, "a"), (t(2), 2.0, "b"), (t(3), 0.0, "a"), // window 10:00
      (t(12), 10.0, "c"))                                   // window 10:10
    query.processAllAvailable()
    val rows = spark.sql(
      "SELECT * FROM prof ORDER BY w.start").collect()
    query.stop()

    assert(rows.length == 2)
    val w1 = rows(0)
    assert(w1.getAs[Long]("n") == 3)
    assert(w1.getAs[Long]("value_count") == 3)
    assert(w1.getAs[Double]("value_sum") == 3.0)
    assert(w1.getAs[Double]("value_mean") == 1.0)
    assert(w1.getAs[Double]("value_min") == 0.0)
    assert(w1.getAs[Double]("value_max") == 2.0)
    assert(w1.getAs[Long]("value_zeros") == 1)
    assert(w1.getAs[Int]("kind_len_max") == 1)
    val w2 = rows(1)
    assert(w2.getAs[Long]("n") == 1)
    assert(w2.getAs[Double]("value_sum") == 10.0)
  }
}
