package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("mgFold: exact while under capacity, MG guarantee on overflow") {
    import StreamingHeavyHitters._
    // under capacity: exact counts
    val st1 = mgFold(MgState(Map.empty, 0L, 0L),
      Iterator("a", "b", "a", "a"), capacity = 4)
    assert(st1.counters == Map("a" -> 3L, "b" -> 1L))
    assert(st1.decrements == 0L && st1.processed == 4L)
    // overflow: n=8, capacity 2 -> any key with count > n/(k+1) survives;
    // est undercounts by at most `decrements`
    val keys = Seq("x", "x", "x", "x", "x", "y", "z", "w")
    val st2 = mgFold(MgState(Map.empty, 0L, 0L),
      keys.iterator, capacity = 2)
    assert(st2.counters.contains("x")) // true count 5 > 8/3
    val est = st2.counters("x")
    assert(est <= 5L && est + st2.decrements >= 5L)
    assert(st2.counters.size <= 2)
  }

  test("streaming heavy hitters: planted hitter survives, state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-hh-ckpt").toString
    val out = StreamingHeavyHitters.heavyHitters(
      mem.toDF.toDF("k"), "k", capacity = 8, buckets = 4)
    val query = out.writeStream.format("memory").queryName("hh")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update()).start()

    // two micro-batches: "hot" appears 400x among 2000 distinct cold keys
    (0 until 2).foreach { b =>
      mem.addData((0 until 1000).flatMap { i =>
        Seq(s"cold-${b * 1000 + i}", "hot")
      }: _*)
      query.processAllAvailable()
    }
    query.stop()

    val rows = spark.sql(
      "SELECT bucket, key, est, max_undercount FROM hh")
      .as[(Int, String, Long, Long)].collect()
    // Update-mode memory sink appends per trigger: keep the LAST row per
    // (bucket, key) — later triggers re-emit updated counters
    val latest = rows.zipWithIndex
      .groupBy { case ((b, k, _, _), _) => (b, k) }
      .map { case (_, g) => g.maxBy(_._2)._1 }.toSeq
    val hot = latest.filter(_._2 == "hot")
    assert(hot.size == 1) // one bucket owns the key
    val (_, _, est, under) = hot.head
    assert(est >= 1L && est <= 2000L && est + under >= 2000L)
    // bounded output: the sink holds one snapshot per trigger (2 here),
    // each <= capacity rows per bucket — the union is <= 2 x capacity.
    // (The hard per-state bound is asserted at the mgFold level above.)
    latest.groupBy(_._1).foreach { case (_, g) =>
      assert(g.size <= 16, s"bucket ${g.head._1} exceeded 2x capacity")
    }
  }
}
