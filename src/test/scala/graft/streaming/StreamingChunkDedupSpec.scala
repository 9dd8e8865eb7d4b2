package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** [[StreamingChunkDedup]] state disciplines (q390 gates the NoTimeout
  * values against the python twin; q398 gates the TTL protocol —
  * this pins the expiry mechanics and the O(n) deterministic-first
  * marking at unit scale). Texts stay under minSize so each doc is
  * exactly one tail chunk: chunking itself is q384's domain. */
class StreamingChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("event-time TTL: chunk state expires and the chunk re-reads " +
    "as novel; a refresh re-arms the deadline") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-scnk-ttl-ckpt").toString
    val out = StreamingChunkDedup.novelChunksEventTime(
      mem.toDF.toDF("doc_id", "text", "ts"), "doc_id", "text", "ts",
      ttlMs = 30000L, minSize = 16, avgBits = 5, maxSize = 96)
    val query = out.toDF.writeStream.format("memory")
      .queryName("scnk_ttl").option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()

    // batch 1: alpha novel at t=10 (deadline 40); within-batch dup
    mem.addData((0L, "alpha", ts(10)), (1L, "alpha", ts(11)))
    query.processAllAvailable()
    // batch 2: spacer advances the watermark far past the deadline
    mem.addData((2L, "spacer", ts(100)))
    query.processAllAvailable()
    // batch 3: alpha state timed out during the watermark advance ->
    // novel AGAIN
    mem.addData((3L, "alpha", ts(101)))
    query.processAllAvailable()
    query.stop()

    val got = spark.sql("SELECT doc_id, novel FROM scnk_ttl")
      .as[(Long, Boolean)].collect().toMap
    assert(got(0L) === true, "first occurrence novel")
    assert(got(1L) === false, "within-batch dup on the non-minimal row")
    assert(got(2L) === true, "spacer is its own novel chunk")
    assert(got(3L) === true, "post-expiry recurrence reads novel again")
  }

  test("NoTimeout form: cross-batch suppression never expires") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-scnk-nt-ckpt").toString
    val out = StreamingChunkDedup.novelChunks(
      mem.toDF.toDF("doc_id", "text"), "doc_id", "text",
      minSize = 16, avgBits = 5, maxSize = 96)
    val query = out.toDF.writeStream.format("memory")
      .queryName("scnk_nt").option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    mem.addData((0L, "alpha"))
    query.processAllAvailable()
    mem.addData((1L, "alpha"), (2L, "beta"))
    query.processAllAvailable()
    query.stop()
    val got = spark.sql("SELECT doc_id, novel FROM scnk_nt")
      .as[(Long, Boolean)].collect().toMap
    assert(got === Map(0L -> true, 1L -> false, 2L -> true))
  }
}
