package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton space-filling-curve) clustering — the multi-column
  * data-layout technique behind Delta/Iceberg `Z-ORDER BY` (Morton 1966;
  * the layout analysis follows the zone-map skipping model of
  * Moerkotte's small materialized aggregates, VLDB'98): interleaving
  * the bits of two columns' scaled bucket ordinals produces a single
  * sort key whose contiguous ranges are small RECTANGLES in the
  * original 2-D value space. Sorting a 100 TB table by the z-value
  * before writing gives every file tight min/max zone maps on BOTH
  * dimensions, so single-dimension range predicates on EITHER column
  * prune files — a plain sort gives that for one column only, at the
  * cost of fully scrambling the other ([[qZoneMap — q198]] audits
  * exactly that single-column layout; this operator produces the
  * layout that fixes its weakness).
  *
  * Everything here is closed-form arithmetic on codegen'd built-ins
  * (`floor`/`least`/`shiftright`/`bitwiseAND`/`shiftleft` — no UDF, no
  * HOF), so the z-value computation rides whole-stage codegen and is
  * bit-reproducible in any engine with integer bit ops, which is what
  * puts a physical-layout decision on a value-equality oracle.
  *
  * Scale design: one fused min/max aggregate over both columns (a
  * 1-row broadcast), then one map-only projection computes every
  * row's z-value — layout assignment never shuffles; the final
  * per-bucket bounding-box rollup is a single map-side-combined
  * groupBy on the bucket ordinal (`buckets` groups, trivially
  * bounded). The actual rewrite of a table is then
  * `repartitionByRange(col("z"))` + sortWithinPartitions — the same
  * range-exchange every large sort uses.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `xb` (even output positions)
    * and `yb` (odd): Σₖ ((xb>>k)&1)<<2k | ((yb>>k)&1)<<(2k+1), unrolled
    * into a flat arithmetic fold the codegen inlines. Inputs must be
    * non-negative longs below 2^bits. */
  def interleaveBits(xb: Column, yb: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, k) =>
      acc +
        shiftleft(shiftright(xb, k).bitwiseAND(lit(1L)), 2 * k) +
        shiftleft(shiftright(yb, k).bitwiseAND(lit(1L)), 2 * k + 1)
    }

  /** Scaled bucket ordinal of `x` in [mn, mx] over 2^bits equal-width
    * cells: `least(floor((x - mn) / ((mx - mn) / 2^bits)), 2^bits-1)`
    * — the exact parenthesization the histogram oracle (q08) already
    * pins cross-engine; degenerate ranges (mx == mn) collapse to cell
    * 0 so constant columns don't divide by zero. */
  def scaledBucket(x: Column, mn: Column, mx: Column, bits: Int): Column = {
    val cells = (1L << bits).toDouble
    when(mx > mn,
      least(floor((x - mn) / ((mx - mn) / lit(cells))), lit(cells - 1))
        .cast("long"))
      .otherwise(lit(0L))
  }

  /** Per-row z-value of (x, y) given the global min/max of each
    * dimension, `bits` bits per dimension (z in [0, 4^bits)). */
  def zValue(x: Column, y: Column,
      mnx: Column, mxx: Column, mny: Column, mxy: Column,
      bits: Int): Column =
    interleaveBits(
      scaledBucket(x, mnx, mxx, bits),
      scaledBucket(y, mny, mxy, bits), bits)

  /** Layout audit: bucket the z-domain into `buckets` contiguous
    * ranges (the "files" a z-ordered write would produce) and report
    * each bucket's row count and per-dimension bounding box — tight
    * boxes on BOTH dims are precisely what makes the layout skippable
    * for either-column predicates. Returns one row per non-empty
    * bucket: (zbucket, n, mn_x, mx_x, mn_y, mx_y), zbucket ascending.
    * `buckets` must be a power of four ≤ 4^bits for exact shifts. */
  def zBucketStats(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 10, buckets: Int = 64): DataFrame = {
    require(Integer.bitCount(buckets) == 1 && buckets <= (1 << (2 * bits)),
      "buckets must be a power of two within the z-domain")
    val shift = 2 * bits - Integer.numberOfTrailingZeros(buckets)
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val in = df.where(x.isNotNull && y.isNotNull)
      .select(x.as("x"), y.as("y"))
    val bounds = in.agg(
      min(col("x")).as("mnx"), max(col("x")).as("mxx"),
      min(col("y")).as("mny"), max(col("y")).as("mxy"))
    in.crossJoin(broadcast(bounds))
      .select(col("x"), col("y"),
        zValue(col("x"), col("y"),
          col("mnx"), col("mxx"), col("mny"), col("mxy"), bits).as("z"))
      .groupBy(shiftright(col("z"), shift).as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("mn_x"), max(col("x")).as("mx_x"),
        min(col("y")).as("mn_y"), max(col("y")).as("mx_y"))
      .orderBy("zbucket")
  }

  /** Per-row Hilbert index of (x, y) given the global min/max of each
    * dimension — the space-filling-curve alternative to [[zValue]]
    * (same scaled buckets, [[graft.functions.HilbertIndexExpr]]'s
    * codegen'd xy→d instead of the Morton interleave). Consecutive
    * Hilbert indices are ALWAYS adjacent cells, so contiguous ranges
    * are tighter boxes than Morton's (which jumps at power-of-two
    * boundaries) — HilbertSpec asserts that superiority numerically. */
  def hilbertValue(x: Column, y: Column,
      mnx: Column, mxx: Column, mny: Column, mxy: Column,
      bits: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.HilbertIndexExpr(
      ColumnBridge.expression(scaledBucket(x, mnx, mxx, bits)),
      ColumnBridge.expression(scaledBucket(y, mny, mxy, bits)), bits))
  }

  /** [[zBucketStats]] with the Hilbert index as the sort key: same
    * one-scan map-only layout assignment (1-row broadcast bounds, no
    * shuffle before the bounded per-bucket rollup), same output shape
    * (hbucket, n, mn_x, mx_x, mn_y, mx_y). */
  def hilbertBucketStats(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 10, buckets: Int = 64): DataFrame = {
    require(Integer.bitCount(buckets) == 1 && buckets <= (1 << (2 * bits)),
      "buckets must be a power of two within the Hilbert domain")
    val shift = 2 * bits - Integer.numberOfTrailingZeros(buckets)
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val in = df.where(x.isNotNull && y.isNotNull)
      .select(x.as("x"), y.as("y"))
    val bounds = in.agg(
      min(col("x")).as("mnx"), max(col("x")).as("mxx"),
      min(col("y")).as("mny"), max(col("y")).as("mxy"))
    in.crossJoin(broadcast(bounds))
      .select(col("x"), col("y"),
        hilbertValue(col("x"), col("y"),
          col("mnx"), col("mxx"), col("mny"), col("mxy"), bits).as("h"))
      .groupBy(shiftright(col("h"), shift).as("hbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("mn_x"), max(col("x")).as("mx_x"),
        min(col("y")).as("mn_y"), max(col("y")).as("mx_y"))
      .orderBy("hbucket")
  }

  /** Skipping-effectiveness comparison for the SAME probe box under
    * three layouts — z-order, x-sorted, and hash-scattered ("as
    * arrived") — each carved into `buckets` "files" with min/max zone
    * maps on both dims. A file is skipped when its bounding box misses
    * the probe on a dimension. Returns one row per layout:
    * (layout, n_files, x_skip_files, y_skip_files, box_skip_files) —
    * files skippable for an x-only predicate, a y-only predicate, and
    * the conjunctive box. The z-layout is the only one with
    * non-trivial skipping on BOTH single-dim predicates; the x-sorted
    * layout skips perfectly on x and never on y; the hash layout skips
    * nothing — the argument for multi-dim clustering stated as
    * checkable numbers rather than prose.
    *
    * File assignment is pure per-row arithmetic (equal-width z ranges
    * for the z-sort, equal-width x ranges for the x-sort, an
    * md5-derived hash for the scatter — the q194-style portable hash
    * family), so the whole audit is map-only + one `buckets`-group
    * rollup per layout: no ranking, no window, no extra shuffle beyond
    * three bounded groupBys, regardless of table size. */
  def skipEffectiveness(df: DataFrame, idCol: String,
      xCol: String, yCol: String,
      xLo: Double, xHi: Double, yLo: Double, yHi: Double,
      bits: Int = 10, buckets: Int = 64): DataFrame = {
    require(Integer.bitCount(buckets) == 1 && buckets <= (1 << (2 * bits)),
      "buckets must be a power of two within the z-domain")
    val shift = 2 * bits - Integer.numberOfTrailingZeros(buckets)
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val in = df.where(x.isNotNull && y.isNotNull)
      .select(x.as("x"), y.as("y"), col(idCol).cast("string").as("id"))
    val bounds = in.agg(
      min(col("x")).as("mnx"), max(col("x")).as("mxx"),
      min(col("y")).as("mny"), max(col("y")).as("mxy"))
    val fileBits = Integer.numberOfTrailingZeros(buckets)
    val keyed = in.crossJoin(broadcast(bounds))
      .select(col("x"), col("y"),
        shiftright(zValue(col("x"), col("y"),
          col("mnx"), col("mxx"), col("mny"), col("mxy"), bits), shift)
          .as("f_z"),
        // x-sorted layout: equal-width x ranges (2^fileBits files)
        scaledBucket(col("x"), col("mnx"), col("mxx"), fileBits)
          .as("f_x"),
        // hash scatter: portable md5-derived file ordinal
        (conv(substring(md5(col("id").cast("binary")), 1, 12), 16, 10)
          .cast("long") % buckets).as("f_h"))
    // melt the three layout assignments so the audit is ONE input scan
    // (bounded 3x fanout) + one (3*buckets)-group rollup, instead of
    // one scan per layout
    keyed
      .select(col("x"), col("y"), explode(array(
        struct(lit("zorder").as("layout"), col("f_z").as("file")),
        struct(lit("xsort").as("layout"), col("f_x").as("file")),
        struct(lit("arrival").as("layout"), col("f_h").as("file"))))
        .as("lf"))
      .groupBy(col("lf.layout").as("layout"), col("lf.file").as("file"))
      .agg(min(col("x")).as("fmnx"), max(col("x")).as("fmxx"),
        min(col("y")).as("fmny"), max(col("y")).as("fmxy"))
      .groupBy("layout")
      .agg(
        count(lit(1)).as("n_files"),
        count(when(col("fmxx") < xLo || col("fmnx") > xHi, 1))
          .as("x_skip_files"),
        count(when(col("fmxy") < yLo || col("fmny") > yHi, 1))
          .as("y_skip_files"),
        count(when(col("fmxx") < xLo || col("fmnx") > xHi ||
          col("fmxy") < yLo || col("fmny") > yHi, 1))
          .as("box_skip_files"))
      .orderBy("layout")
  }
}
