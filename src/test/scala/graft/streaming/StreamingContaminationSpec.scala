package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val (k, w) = (4, 4)
  private val benchText = (1 to 20).map(n => s"bench$n").mkString(" ")

  private def benchHashes: Array[Long] =
    graft.ops.Dedup.winnowFingerprints(
        Seq((0L, benchText)).toDF("doc_id", "text"), "doc_id", "text", k, w)
      .select("h").distinct().collect().map(_.getLong(0))

  test("flagContaminated: stateless two-batch drive flags only true overlaps") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val src = mem.toDF.toDF("doc_id", "text")
    val out = StreamingContamination.flagContaminated(
      src, "doc_id", "text", benchHashes, k, w, minShared = 2)
    val sink = "sc_test_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-scontam-spec").toString
    val query = out.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: one contaminated (full copy), one clean
      mem.addData(Seq(
        (1L, s"aa bb $benchText cc dd"),
        (2L, "completely unrelated words that share nothing at all")))
      query.processAllAvailable()
      // batch 2: contamination arriving later is flagged with NO state
      // carried from batch 1 (the operator is a pure map)
      mem.addData(Seq(
        (3L, s"xx yy zz $benchText"),
        (4L, "more clean content in the second batch entirely")))
      query.processAllAvailable()
    } finally query.stop()
    val rows = graft.queries.StreamGate.finish(spark, sink, ckpt,
        spark.table(sink))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set(1L, 3L))
    assert(rows.values.forall(_ >= 2L))
    // the streaming answer matches the batch operator on the same docs
    val batch = graft.ops.Dedup.winnowContamination(
        Seq((1L, s"aa bb $benchText cc dd"),
          (2L, "completely unrelated words that share nothing at all"),
          (3L, s"xx yy zz $benchText"),
          (4L, "more clean content in the second batch entirely"))
          .toDF("doc_id", "text"),
        Seq((0L, benchText)).toDF("doc_id", "text"),
        "doc_id", "text", k, w, minCoverage = 0.0, maxDf = 1000)
      .where($"n_shared" >= 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows == batch)
    intercept[IllegalArgumentException] {
      StreamingContamination.flagContaminated(
        src, "doc_id", "text", Array.empty[Long], k, w, 2)
    }
  }
}
