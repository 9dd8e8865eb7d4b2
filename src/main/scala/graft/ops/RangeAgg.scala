package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Interval AGGREGATION by distributed prefix sums — the scale path
  * for the "aggregate points per containing interval" shape that
  * [[RangeJoin]] + groupBy serves today (q67).
  *
  * The bin-equi-join materializes every (interval, point) candidate
  * pair before aggregating: with I intervals and P points per interval
  * span that is O(I·P) rows through the join and the hash aggregate —
  * at 10× corpus scale q67's measured cost is a ~30 s × 32-core
  * saturating stage, and the whole window is exposed to host
  * co-tenancy (the three-round stress-flag mechanism). When the
  * downstream need is an ASSOCIATIVE aggregate (count/sum), the pairs
  * are never needed: with F(x) = (count, sum) over all points with
  * ts ≤ x, an inclusive interval [lo, hi] aggregates to
  * F(hi) − F(lo−1) — TWO prefix lookups per interval, zero pair rows.
  *
  * Distributed single-pass plan (no global sort, no driver loop):
  *  1. points and interval BOUNDS (lo−1 and hi) union into one stream,
  *     each row tagged with a fixed-width time BUCKET (`ts div W` —
  *     deterministic integer math, not sampling-based range
  *     partitioning, so no persist is needed for correctness);
  *  2. one hash-partitioned window per bucket (orderBy ts, points
  *     before bounds on ties) gives the WITHIN-bucket running
  *     (count, sum) at every bound;
  *  3. per-bucket totals (map-side-combined aggregate over the same
  *     union, so empty-point buckets that hold bounds still get a
  *     row) prefix-sum on the driver-small bucket table and broadcast
  *     back: cum = prefix_below(bucket) + running_within.
  *  4. per-interval result = cum(hi) − cum(lo−1); intervals with zero
  *     points drop (inner-join parity with the RangeJoin form).
  *
  * Cost: one shuffle of points+bounds (hash by bucket), one tiny
  * aggregate, one broadcast — vs the equi-join's shuffle PLUS the
  * candidate blowup. Pick `bucketWidth` so one bucket's points fit a
  * window partition comfortably (the skew knob, same role as
  * RangeJoin's binWidth). Times must be integral (epoch micros/nanos);
  * sums are exact DECIMAL(18,6) like the q67 contract.
  *
  * ==Decision table: PAIRS (RangeJoin / RangeJoinBinRule) vs this==
  *
  * Route by what the consumer does with the matches (measured at
  * sf0.1×10: the pairs plan runs ~1.15× of linear, this one 0.14–
  * 0.20× — ~9.5× cheaper — on the identical oracle):
  *
  *  - downstream needs the PAIR ROWS themselves (joins back per
  *    match, top-k per interval, median/percentile per interval, any
  *    non-associative aggregate) → PAIRS. The prefix form cannot
  *    answer these: F(hi) − F(lo−1) only exists for aggregates with
  *    a group inverse.
  *  - downstream is count / sum (min/max have no inverse — PAIRS) of
  *    point values per interval, inner-join semantics → THIS. The
  *    candidate blowup O(I·P_span) is pure waste there.
  *  - intervals overlap heavily (error storms: many concurrent
  *    2h windows) → the pairs plan degrades multiplicatively (every
  *    point re-emits per covering interval); this one is indifferent
  *    (bounds are two rows per interval regardless of overlap).
  *  - need LEFT semantics (empty intervals as zero rows) → PAIRS +
  *    left join today; this op's `where(n_events > 0)` pins
  *    inner-join parity with q67.
  *
  * [[graft.plans.RangeJoinBinRule]] auto-rewrites the naive declared
  * JOIN (rung (c)); rewriting Aggregate-over-range-join into this
  * sweep inside the optimizer needs the aggregate's associativity
  * proof on the LOGICAL plan and is deliberately left caller-opt-in —
  * the table above is the routing contract, and PlanPinSpec pins the
  * sweep's no-pair-materialization plan shape.
  */
object RangeAgg {

  /** (ivIdCol, n_events, sum_value) for every interval that contains
    * at least one point; `lo <= pt <= hi` inclusive. */
  def intervalCountSum(
      points: DataFrame,
      ptCol: String,
      valCol: String,
      intervals: DataFrame,
      ivIdCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    def bucket(c: Column): Column =
      (c - pmod(c, lit(bucketWidth))) / lit(bucketWidth)

    val pts = points.select(
      bucket(col(ptCol)).cast("long").as("__bkt"),
      col(ptCol).cast("long").as("__ts"),
      lit(0).as("__ord"),
      lit(1L).as("__cnt"),
      col(valCol).cast(DecimalType(18, 6)).as("__val"),
      lit(null).cast("long").as("__iv"),
      lit(null).cast("int").as("__side"))
    def bound(tsCol: Column, side: Int) = intervals.select(
      bucket(tsCol).cast("long").as("__bkt"),
      tsCol.cast("long").as("__ts"),
      lit(1).as("__ord"),
      lit(null).cast("long").as("__cnt"),
      lit(null).cast(DecimalType(18, 6)).as("__val"),
      col(ivIdCol).cast("long").as("__iv"),
      lit(side).as("__side"))
    // F is count(ts <= x): the lo bound queries x = lo - 1 so points
    // AT lo stay inside the interval
    val u = pts
      .unionByName(bound(col(loCol) - 1, 0))
      .unionByName(bound(col(hiCol), 1))

    val w = Window.partitionBy("__bkt").orderBy("__ts", "__ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = u
      .withColumn("__rc", sum(col("__cnt")).over(w))
      .withColumn("__rs", sum(col("__val")).over(w))

    // bucket totals over the SAME union: buckets holding only bounds
    // appear with zero totals, so the prefix is defined at every
    // bound's bucket (no gap handling needed)
    val totals = u.groupBy("__bkt")
      .agg(sum(col("__cnt")).as("__tc"), sum(col("__val")).as("__ts_"))
    val wb = Window.orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    // the bucket table is span/width rows — driver-small by the same
    // argument RangeJoin's bin table is; the single-partition window
    // is over THAT table, never the data
    val prefix = totals.select(col("__bkt"),
      coalesce(sum(col("__tc")).over(wb), lit(0L)).as("__pc"),
      coalesce(sum(col("__ts_")).over(wb),
        lit(0).cast(DecimalType(18, 6))).as("__ps"))

    val cum = run.where(col("__ord") === 1)
      .join(broadcast(prefix), Seq("__bkt"))
      .select(col("__iv"), col("__side"),
        (col("__pc") + coalesce(col("__rc"), lit(0L))).as("__c"),
        (col("__ps") + coalesce(col("__rs"),
          lit(0).cast(DecimalType(18, 6)))).as("__s"))

    cum.groupBy(col("__iv").as(ivIdCol))
      .agg(
        (sum(when(col("__side") === 1, col("__c")).otherwise(lit(0L))) -
          sum(when(col("__side") === 0, col("__c")).otherwise(lit(0L))))
          .as("n_events"),
        (sum(when(col("__side") === 1, col("__s"))
            .otherwise(lit(0).cast(DecimalType(18, 6)))) -
          sum(when(col("__side") === 0, col("__s"))
            .otherwise(lit(0).cast(DecimalType(18, 6)))))
          .as("sum_value"))
      .where(col("n_events") > 0)
  }
}
