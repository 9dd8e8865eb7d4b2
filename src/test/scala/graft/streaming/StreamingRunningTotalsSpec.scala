package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingRunningTotalsSpec extends SparkSpec {
  import spark.implicits._

  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("transformWithState running totals accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocksdb)
    try {
      val mem = MemoryStream[(String, Double)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-srt-ckpt").toString
      val out = StreamingRunningTotals.runningTotals(
        mem.toDF.toDF("k", "v"), "k", "v")
      val q = out.writeStream.format("memory").queryName("srt_spec")
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      try {
        mem.addData(("a", 1.0), ("a", 2.0), ("b", 5.0))
        q.processAllAvailable()
        mem.addData(("a", 3.0), ("c", 7.0))
        q.processAllAvailable()
        // update mode re-emits touched keys; latest snapshot per key =
        // max n (counts are monotone)
        val rows = spark.sql(
            "SELECT key, max(n), max(sum) FROM srt_spec GROUP BY key")
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getDouble(2))).toMap
        assert(rows("a") == ((3L, 6.0)))
        assert(rows("b") == ((1L, 5.0)))
        assert(rows("c") == ((1L, 7.0)))
        // batch-1 snapshot for "a" was (2, 3.0): both snapshots present
        val aSnaps = spark.sql(
            "SELECT n, sum FROM srt_spec WHERE key = 'a' ORDER BY n")
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(aSnaps == Seq((2L, 3.0), (3L, 6.0)))
      } finally q.stop()
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
