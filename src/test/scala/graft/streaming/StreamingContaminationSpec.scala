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

  test("flagContaminatedBloom: no false negatives; measured doc fp rate small") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bench = benchHashes
    val bloom = org.apache.spark.util.sketch.BloomFilter
      .create(bench.length.toLong, 0.03)
    bench.foreach(bloom.putLong)
    // corpus: 2 contaminated + 200 clean docs of distinct random words
    // (enough clean fingerprint probes that the 3% per-hash fpp gets a
    // real chance to produce doc-level false flags)
    val rnd = new scala.util.Random(42)
    val clean = (10L until 210L).map(i =>
      (i, (1 to 40).map(_ => s"w${rnd.nextInt(1000000)}").mkString(" ")))
    val docs = Seq(
      (1L, s"aa bb $benchText cc dd"),
      (2L, s"xx $benchText yy")) ++ clean
    val mem = MemoryStream[(Long, String)]
    val src = mem.toDF.toDF("doc_id", "text")
    val out = StreamingContamination.flagContaminatedBloom(
      src, "doc_id", "text", bloom, k, w, minShared = 2)
    val sink = "scb_test_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-scontamb-spec").toString
    val query = out.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(docs)
      query.processAllAvailable()
    } finally query.stop()
    val bloomRows = graft.queries.StreamGate.finish(spark, sink, ckpt,
        spark.table(sink))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact gate on the same docs (batch form of the same stateless op)
    val exactRows = StreamingContamination.flagContaminated(
        docs.toDF("doc_id", "text"), "doc_id", "text", bench, k, w, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no false negatives: every exactly-flagged doc is bloom-flagged,
    // with at least the exact shared count
    exactRows.foreach { case (id, n) =>
      assert(bloomRows.contains(id), s"bloom missed exact hit $id")
      assert(bloomRows(id) >= n, s"doc $id: bloom ${bloomRows(id)} < exact $n")
    }
    assert(exactRows.keySet == Set(1L, 2L))
    // measured doc-level false-positive rate vs the exact gate: with
    // fpp=3% and minShared=2 over ~37 probes/doc the binomial bound is
    // ~20% worst case; assert the measured rate is sane, and REPORT it
    val fps = bloomRows.keySet -- exactRows.keySet
    val fpRate = fps.size.toDouble / clean.size
    info(f"bloom doc-level fp rate vs exact gate: $fpRate%.4f " +
      s"(${fps.size}/${clean.size} clean docs)")
    assert(fpRate <= 0.25, s"fp rate $fpRate implausibly high")
  }
}
