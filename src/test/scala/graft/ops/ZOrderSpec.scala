package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits places x on even and y on odd bit positions") {
    // x=0b101 (5), y=0b011 (3) with 3 bits:
    // z bits: y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 = 0b011011 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.interleaveBits(col("x"), col("y"), 3).as("z"))
      .as[Long].head()
    assert(z === 27L)
  }

  test("interleaveBits is a bijection on the 2-bit grid") {
    val grid = for (x <- 0L to 3L; y <- 0L to 3L) yield (x, y)
    val zs = grid.toDF("x", "y")
      .select(ZOrder.interleaveBits(col("x"), col("y"), 2).as("z"))
      .as[Long].collect().toSet
    assert(zs === (0L to 15L).toSet)
  }

  test("scaledBucket covers the range and clamps the max") {
    val df = Seq(0.0, 2.5, 5.0, 10.0).toDF("x")
    val got = df.select(ZOrder.scaledBucket(
        col("x"), lit(0.0), lit(10.0), 2).as("b"))
      .as[Long].collect().toSeq
    // cells = 4, width 2.5: 0->0, 2.5->1, 5.0->2, 10.0->clamped 3
    assert(got === Seq(0L, 1L, 2L, 3L))
    // degenerate range collapses to cell 0, no division by zero
    val const = Seq(7.0, 7.0).toDF("x")
      .select(ZOrder.scaledBucket(col("x"), lit(7.0), lit(7.0), 4).as("b"))
      .as[Long].collect().toSeq
    assert(const === Seq(0L, 0L))
  }

  test("zBucketStats boxes nest inside the global range, counts total") {
    val n = 4000
    val df = (0 until n)
      .map(i => (i.toDouble, ((i * 37) % n).toDouble)).toDF("x", "y")
    val stats = ZOrder.zBucketStats(df, "x", "y", bits = 8, buckets = 16)
      .collect()
    assert(stats.map(_.getLong(1)).sum === n.toLong)
    stats.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(3) <= (n - 1).toDouble)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(5) <= (n - 1).toDouble)
      assert(r.getDouble(2) <= r.getDouble(3))
      assert(r.getDouble(4) <= r.getDouble(5))
    }
    // z-clustering must tighten boxes: mean x-extent of the z-buckets
    // is well under the full range for smoothly-distributed data
    val meanExtent = stats.map(r => r.getDouble(3) - r.getDouble(2)).sum /
      stats.length
    assert(meanExtent < 0.8 * n)
  }

  test("skipEffectiveness: z-layout skips on both dims, hash on none") {
    val n = 4096
    val df = (0 until n)
      .map(i => (i.toLong, (i % 64).toDouble * 100, (i / 64).toDouble))
      .toDF("id", "x", "y")
    val rows = ZOrder.skipEffectiveness(df, "id", "x", "y",
        xLo = 1000, xHi = 2000, yLo = 10, yHi = 20,
        bits = 8, buckets = 16)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (zx, zy, zb) = rows("zorder")
    val (xx, xy, _) = rows("xsort")
    val (hx, hy, hb) = rows("arrival")
    // hash scatter: every file spans everything -> nothing skips
    assert(hx === 0L && hy === 0L && hb === 0L)
    // x-sort: strong x-skipping, no y-skipping
    assert(xx > 0L && xy === 0L)
    // z-order: non-trivial skipping on BOTH single-dim predicates
    assert(zx > 0L && zy > 0L && zb >= zx.max(zy))
  }
}
