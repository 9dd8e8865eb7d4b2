package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("stream dedup keeps first occurrence across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-dedup-ckpt").toString
    val out = StreamingDedup.dedupByFingerprint(
      mem.toDF.toDF("text"), "text")
    val query = out.writeStream.format("memory").queryName("dedup")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()

    mem.addData("hello world", "foo bar", "hello world")
    query.processAllAvailable()
    // same fingerprint arriving in a LATER batch must also be suppressed
    mem.addData("hello  WORLD", "new doc") // normalizes to same fingerprint
    query.processAllAvailable()
    val rows = spark.sql("SELECT payload FROM dedup").as[String].collect()
    query.stop()

    assert(rows.sorted.toSeq == Seq("foo bar", "hello world", "new doc"))
  }

  test("event-time TTL expires state: same key re-emits after expiry") {
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-dedup-ttl-ckpt").toString
    val out = StreamingDedup.dedupByFingerprintEventTime(
      mem.toDF.toDF("text", "ts"), "text", "ts", ttlMs = 30000L)
    val query = out.writeStream.format("memory").queryName("dedup_ttl")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()

    // batch 1: first arrival at t=10s -> emitted; TTL set to t=40s
    mem.addData(("dup doc", ts(10)))
    query.processAllAvailable()
    // batch 2: repeat BEFORE expiry (t=15s) -> suppressed; an unrelated
    // event at t=100s will push the watermark past the 40s deadline
    mem.addData(("dup doc", ts(15)), ("advance one", ts(100)))
    query.processAllAvailable()
    // NOTE: the t=15 repeat reset the key's deadline to 45s — still well
    // below the 100s watermark that batch 2 establishes.
    // batch 3: watermark is now 100s > 45s -> the key's state times out
    // and is removed during this batch (no data for it)
    mem.addData(("advance two", ts(101)))
    query.processAllAvailable()
    // batch 4: same fingerprint arrives after expiry -> re-emitted
    mem.addData(("dup doc", ts(102)))
    query.processAllAvailable()

    val rows = spark.sql("SELECT payload FROM dedup_ttl")
      .as[String].collect().sorted.toSeq
    query.stop()
    assert(rows == Seq("advance one", "advance two", "dup doc", "dup doc"))
  }
}
