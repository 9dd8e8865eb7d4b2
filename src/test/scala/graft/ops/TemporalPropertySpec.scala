package graft.ops

import graft.SparkSpec

/** Brute-force cross-checks of the round-7 temporal ops on seeded
  * random inputs — the distributed plan must agree with a trivially
  * correct in-memory fold. */
class TemporalPropertySpec extends SparkSpec {
  import spark.implicits._

  test("intervalUnionLength == integer sweep, all stats, random inputs") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 60).map { _ =>
        val k = rnd.nextInt(4).toLong
        val s = rnd.nextInt(50).toLong
        (k, s, s + rnd.nextInt(12).toLong)
      }.filter { case (_, s, e) => e >= s }
      val got = Sessionize
        .intervalUnionLength(rows.toDF("k", "s", "e"), "k", "s", "e")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      val byKey = rows.groupBy(_._1)
      assert(got.keySet === byKey.keySet)
      byKey.foreach { case (k, ivs) =>
        // union length by unit sweep over the covered integer points
        val covered = ivs.flatMap { case (_, s, e) => s until e }.toSet
        val sumLen = ivs.map { case (_, s, e) => e - s }.sum
        // island count by sweeping sorted merged runs
        val sorted = ivs.map { case (_, s, e) => (s, e) }.sortBy(identity)
        var islands = 0
        var maxE = Long.MinValue
        sorted.foreach { case (s, e) =>
          if (s > maxE || maxE == Long.MinValue) islands += 1
          maxE = math.max(maxE, e)
        }
        val (nInt, nIsl, union, sum) = got(k)
        assert(nInt == ivs.size, s"seed=$seed k=$k")
        assert(union == covered.size.toLong, s"seed=$seed k=$k union")
        assert(sum == sumLen, s"seed=$seed k=$k sum")
        assert(nIsl == islands.toLong, s"seed=$seed k=$k islands")
      }
    }
  }

  test("resampleFfill/Interpolate: grid shape, pass-through, bounds") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 80).map { i =>
      (rnd.nextInt(3).toLong, rnd.nextInt(200).toLong,
        math.floor(rnd.nextDouble() * 100) / 10)
    }
    val df = rows.toDF("k", "t", "v")
    for (op <- Seq("ffill", "interp")) {
      val out = (if (op == "ffill")
        Timeseries.resampleFfill(df, "k", "t", "v", periodUs = 10L)
      else Timeseries.resampleInterpolate(df, "k", "t", "v", periodUs = 10L))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      val byKey = rows.groupBy(_._1)
      byKey.foreach { case (k, rs) =>
        val periods = rs.map(_._2 / 10)
        // full dense grid between first and last observed period
        val expectGrid = (periods.min to periods.max).toSet
        assert(out.keys.filter(_._1 == k).map(_._2).toSet === expectGrid,
          s"$op grid k=$k")
        // observed periods carry the latest-wins observation verbatim
        rs.groupBy(_._2 / 10).foreach { case (p, obs) =>
          val want = obs.map(o => (o._2, o._3)).max._2
          assert(out((k, p)) == want, s"$op observed k=$k p=$p")
        }
        // every filled value stays within the key's observed envelope
        val (lo, hi) = (rs.map(_._3).min, rs.map(_._3).max)
        out.filter(_._1._1 == k).values.foreach(v =>
          assert(v >= lo - 1e-9 && v <= hi + 1e-9, s"$op bounds k=$k"))
      }
    }
  }
}
