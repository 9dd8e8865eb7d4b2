package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingEnrichSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static join enriches, drops orphans, aggregates windows") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("k", "tier")
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val src = mem.toDF.toDF("k", "ts", "v")
    val out = StreamingEnrich.enrichedWindowStats(
      src, dim, "k", "ts", "v", "tier", "10 minutes", "0 seconds")
    val q = out.writeStream.format("memory").queryName("enrich")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("genrich").toString)
      .outputMode(OutputMode.Append()).start()

    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 09:$min%02d:00")
    // window 09:00-09:10: gold 2 events, silver 1; key 99 is an orphan
    mem.addData((1L, t(1), 1.0), (1L, t(2), 2.5),
      (2L, t(3), 10.0), (99L, t(4), 999.0))
    q.processAllAvailable()
    // watermark-advancing batch far in the future flushes the window
    mem.addData((1L, t(50), 0.0))
    q.processAllAvailable()
    mem.addData((1L, t(55), 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.sql(
      "SELECT attr, n_events, CAST(sum_value AS DOUBLE) FROM enrich " +
        "WHERE window.start = '2024-01-01 09:00:00' ORDER BY attr")
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "gold" && rows(0).getLong(1) == 2 &&
      rows(0).getDouble(2) == 3.5)
    assert(rows(1).getString(0) == "silver" && rows(1).getLong(1) == 1 &&
      rows(1).getDouble(2) == 10.0)
    // the orphan (key 99) must not appear anywhere
    val all = spark.sql("SELECT DISTINCT attr FROM enrich").collect()
    assert(all.forall(r => Set("gold", "silver")(r.getString(0))))
  }
}
