package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** [[StreamingRecrawl]] state mechanics at unit scale (q407 gates the
  * full-corpus drive against the batch oracle): cross-batch count
  * merges, hash comparison across the batch boundary, the
  * single-fetch null estimator, and the null-ts drop contract. */
class StreamingRecrawlSpec extends SparkSpec {
  import spark.implicits._

  test("counts merge across batches; change detection crosses the " +
    "batch boundary; single-fetch urls carry null lambda") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-srcr-ckpt").toString
    val out = StreamingRecrawl.changeRateUpdates(
      mem.toDF.toDF("url", "ts", "hash"), "url", "ts", "hash")
    val query = out.toDF.writeStream.format("memory")
      .queryName("srcr").option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    // batch 1: u1 fetched twice (no change), u2 once
    mem.addData(("u1", 100L, "a"), ("u1", 200L, "a"), ("u2", 100L, "z"))
    query.processAllAvailable()
    // batch 2: u1's hash CHANGES relative to the stored state
    mem.addData(("u1", 300L, "b"))
    query.processAllAvailable()
    query.stop()

    val rows = spark
      .sql("SELECT url, n_fetches, n_changes, lambda_hat FROM srcr")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(rows(("u1", 2L)) === (0L,
      Some(BigDecimal(-math.log(1.5 / 1.5)).setScale(8,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // after batch 2: n=3 fetches, 2 intervals, 1 change
    val (x, lam) = rows(("u1", 3L))
    assert(x === 1L)
    assert(lam === Some(BigDecimal(-math.log(1.5 / 2.5)).setScale(8,
      BigDecimal.RoundingMode.HALF_UP).toDouble))
    // single fetch: no interval -> null lambda
    assert(rows(("u2", 1L)) === (0L, None))
  }

  test("null-ts fetch events drop instead of throwing") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Option[Long], String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-srcr-nt-ckpt").toString
    val out = StreamingRecrawl.changeRateUpdates(
      mem.toDF.toDF("url", "ts", "hash"), "url", "ts", "hash")
    val query = out.toDF.writeStream.format("memory")
      .queryName("srcr_nt").option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    mem.addData(("u1", Some(100L), "a"), ("u1", None, "b"))
    query.processAllAvailable()
    query.stop()
    val rows = spark.sql("SELECT url, n_fetches FROM srcr_nt")
      .as[(String, Long)].collect().toSeq
    assert(rows === Seq(("u1", 1L)), "the null-ts event must drop")
  }
}
