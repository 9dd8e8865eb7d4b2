package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Unit edges of the streaming first-seen image dedup (q346 gates the
  * fixture corpus vs DuckDB; this pins cross-batch state, hostile-blob
  * drop, within-batch tie-breaking, and event-time TTL expiry on
  * controlled data). */
class StreamingImageDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal 24-bpp BMP whose pixels (and therefore dHash) are a
    * function of `seed` — distinct seeds give distinct hashes at this
    * gradient scale. */
  private def bmp(seed: Int): Array[Byte] = {
    val w = 18; val h = 16
    val rowSize = (w * 3 + 3) / 4 * 4
    val out = java.nio.ByteBuffer.allocate(54 + rowSize * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(54 + rowSize * h).putInt(0).putInt(54)
    out.putInt(40).putInt(w).putInt(h)
    out.putShort(1).putShort(24)
    out.putInt(0).putInt(rowSize * h).putInt(2835).putInt(2835)
    out.putInt(0).putInt(0)
    for (y <- (h - 1) to 0 by -1) {
      var written = 0
      for (x <- 0 until w) {
        val r = (x * 14 + seed * 37) % 256
        val g = (y * 16 + seed * 11) % 256
        val b = ((x + y) * 7) % 256
        out.put(b.toByte).put(g.toByte).put(r.toByte); written += 3
      }
      (written until rowSize).foreach(_ => out.put(0.toByte))
    }
    out.array()
  }

  private def drive(batches: Seq[Seq[(Long, Array[Byte])]])
      : Seq[(Long, Boolean, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Byte])]
    val seen = StreamingImageDedup.firstSeenByDHash(
      mem.toDF.toDF("img_id", "content"), "img_id", "content")
    val sink = "sid_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val ckpt = java.nio.file.Files.createTempDirectory("sid-spec").toString
    val q = seen.toDF.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()
    val out = spark.table(sink).collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getLong(3))).toSeq
    spark.catalog.dropTempView(sink)
    graft.queries.StreamGate.deleteRecursively(ckpt)
    out
  }

  test("cross-batch first-seen: a later batch's pixel-dup points at the " +
      "earlier canonical; hostile blobs emit nothing") {
    val got = drive(Seq(
      Seq(1L -> bmp(7), 2L -> bmp(9)),
      Seq(5L -> bmp(7),                       // dup of batch-1's id 1
        6L -> "not an image".getBytes,        // dropped, not an error
        7L -> bmp(3))))                       // fresh
    val byId = got.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(1L) === ((true, 1L)), got)
    assert(byId(2L) === ((true, 2L)), got)
    assert(byId(5L) === ((false, 1L)), got)
    assert(byId(7L) === ((true, 7L)), got)
    assert(!byId.contains(6L), got)
  }

  test("within-batch tie: smallest id wins; canonical re-arrival reads dup") {
    val got = drive(Seq(
      Seq(9L -> bmp(1), 4L -> bmp(1)),        // same hash, one batch
      Seq(4L -> bmp(1))))                     // canonical re-delivered
    assert(got.sorted === Seq((4L, true, 4L), (4L, false, 4L),
      (9L, false, 4L)).sorted, got)
  }

  test("event-time TTL: post-expiry re-arrival is a fresh first-seen") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1700000000000L
    val min = 60000L
    val mem = MemoryStream[(Long, Array[Byte], java.sql.Timestamp)]
    val seen = StreamingImageDedup.firstSeenByDHashEventTime(
      mem.toDF.toDF("img_id", "content", "ts"), "img_id", "content",
      "ts", ttlMs = min)
    val sink = "sidt_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val ckpt = java.nio.file.Files.createTempDirectory("sidt-spec").toString
    val q = seen.toDF.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    def add(b: Seq[(Long, Array[Byte], Long)]): Unit = {
      mem.addData(b.map { case (id, bytes, off) =>
        (id, bytes, new java.sql.Timestamp(t0 + off)) })
      q.processAllAvailable()
    }
    try {
      add(Seq((1L, bmp(7), 0L), (2L, bmp(7), 10000L))) // 2 dups 1
      add(Seq((50L, bmp(2), 10 * min)))  // watermark -> 10 min
      add(Seq((51L, bmp(4), 11 * min)))  // hash(7)'s state times out
      add(Seq((3L, bmp(7), 12 * min)))   // fresh first-seen again
    } finally q.stop()
    val got = spark.table(sink).collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getLong(3))).toSeq
    spark.catalog.dropTempView(sink)
    graft.queries.StreamGate.deleteRecursively(ckpt)
    val byId = got.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(1L) === ((true, 1L)), got)
    assert(byId(2L) === ((false, 1L)), got)
    assert(byId(3L) === ((true, 3L)),
      s"post-TTL re-arrival must re-admit as canonical: $got")
  }
}
