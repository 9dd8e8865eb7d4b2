package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** [[StreamingRevalidation]] at unit scale (q416 gates the
  * corpus-scale drive): the four online classes, 304 wire-byte
  * zeroing, hostile-event drop, and statelessness across batches. */
class StreamingRevalidationSpec extends SparkSpec {
  import spark.implicits._

  test("dispositions: four classes online, 304 rows carry zero wire " +
    "bytes, null events drop") {
    implicit val sqlCtx = spark.sqlContext
    val prev = Seq(
      ("http://a.example/1", "h1", Some("e1")),
      ("http://a.example/2", "h2", None),
      ("http://a.example/3", "h3old", Some("e3"))
    ).toDF("url", "hash", "validator")
    val mem = MemoryStream[(String, String, Long)]
    val src = mem.toDF.toDF("url", "hash", "bytes")
    val out = StreamingRevalidation.dispositions(
      src, "url", "hash", "bytes", prev, "url", "hash", "validator")
    val q = out.writeStream.format("memory").queryName("sreval")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("gsreval").toString)
      .outputMode(OutputMode.Append()).start()
    // batch 1: revalidated + unchanged_refetch; batch 2: modified +
    // new + a hostile null-hash event that must drop, not throw
    mem.addData(("http://a.example/1", "h1", 100L),
      ("http://a.example/2", "h2", 200L))
    q.processAllAvailable()
    mem.addData(("http://a.example/3", "h3", 300L),
      ("http://a.example/9", "h9", 400L),
      ("http://a.example/1", null, 1L))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql(
      "SELECT url, disposition, bytes_on_wire FROM sreval")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2)))
    assert(got.length === 4, "the null-hash event dropped")
    val m = got.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m("http://a.example/1") === (("revalidated", 0L)))
    assert(m("http://a.example/2") === (("unchanged_refetch", 200L)))
    assert(m("http://a.example/3") === (("modified", 300L)))
    assert(m("http://a.example/9") === (("new", 400L)))
  }
}
