package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-bucketed range (interval containment) join.
  *
  * Spark plans a pure inequality join (`p.t BETWEEN i.lo AND i.hi` with no
  * equality key) as BroadcastNestedLoopJoin or a cartesian product —
  * O(|P|·|I|) comparisons, a scale-killer. The standard fix (used by
  * every interval-join engine) is to discretize time into fixed-width
  * bins: an interval is replicated to each bin it overlaps, a point maps
  * to exactly one bin, and the join becomes an EQUI-join on bin id plus a
  * residual containment filter. Work drops to O(|P| + |I|·span/width +
  * candidates); the shuffle hashes on bin, so the plan parallelizes and
  * AQE can still broadcast a small binned side.
  *
  * Pick `binWidth` near the typical interval length: fanout per interval
  * is ceil(len/width)+1, while too-wide bins admit more false candidates
  * for the residual filter. Each (interval, point) pair meets in exactly
  * one bin (the point's), so no post-join dedup is needed.
  *
  * All bin arithmetic is exact integer math (pmod + bigint div), NOT
  * double division — epoch-nanos exceed 2^53 and would mis-bin through a
  * double.
  */
object RangeJoin {

  /** Inner join of `points` to every interval containing them
    * (`lo <= pt <= hi`, inclusive both ends). Column sets must be
    * disjoint; time/bound columns must be integral (e.g. epoch nanos).
    */
  def pointInInterval(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
    require(clash.isEmpty, s"points/intervals name clash: $clash")
    val binClash =
      (points.columns ++ intervals.columns).filter(_ == "__bin")
    require(binClash.isEmpty,
      "input already has a __bin column; rename it first")

    // Exact floor-division to bin id (correct for negatives too:
    // x - pmod(x, w) is the greatest multiple of w <= x).
    def bin(c: String): Column =
      expr(s"(`$c` - pmod(`$c`, ${binWidth}L)) div ${binWidth}L")

    val ib = intervals.withColumn(
      "__bin",
      explode(sequence(bin(loCol), bin(hiCol))))
    val pb = points.withColumn("__bin", bin(ptCol))
    pb.join(ib, Seq("__bin"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }
}
