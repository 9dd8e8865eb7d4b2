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
}
