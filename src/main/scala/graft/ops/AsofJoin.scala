package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-preceding / nearest-following) join — the temporal join
  * Spark has no built-in operator for (pandas `merge_asof`, DuckDB
  * `ASOF JOIN`). The reference engine has no temporal operators at all;
  * this is part of the pipeline-extension surface.
  *
  * Spark-first design — NOT a join at all: tag both sides, UNION them,
  * and run ONE window over (key, time, side, tie) carrying the most
  * recent right-side row forward (`last(..., ignoreNulls)` over an
  * unbounded-preceding row frame). Cost is a single hash shuffle on the
  * key plus a per-partition streaming sort — no join explosion, no
  * per-left-row probe, O(1) window state. The naive alternative
  * (inequality theta-join + per-left-row max) is a range join that
  * degenerates to O(|L|·|R|) per key; this plan is linear and survives a
  * 100 TB scale-up unchanged. Skew caveat: one key's full timeline lands
  * on one task — same hazard class as any keyed window; salt by coarse
  * time bucket upstream if a single key exceeds a task.
  */
object AsofJoin {

  /** Left as-of join: every left row, plus `rightCols` from the matching
    * right row (nulls when none).
    *
    * Match semantics (inclusive): backward = the right row with the
    * greatest `rightTime` <= `leftTime`; forward = the least
    * `rightTime` >= `leftTime`. Ties on `rightTime` within a key are
    * broken by `rightTieBreak` (greatest wins backward, least wins
    * forward) so results are deterministic. `tolerance` (same units as
    * the time columns) bounds |leftTime - rightTime|; matches outside it
    * become nulls, like pandas merge_asof.
    *
    * The matched right columns are carried as ONE struct, so even when
    * some of them are null in the matched row the outputs all come from
    * the same row (per-column `last(ignoreNulls)` would mix rows).
    *
    * Requirements: time columns numeric (e.g. epoch nanos); left and
    * `rightCols` names disjoint.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      rightTieBreak: Option[String] = None,
      tolerance: Option[Long] = None,
      forward: Boolean = false): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must be non-empty")
    val clash = left.columns.toSet.intersect(rightCols.toSet)
    require(clash.isEmpty, s"left/rightCols name clash: $clash")

    val rrowType = right.select(rightCols.map(col): _*).schema
    val lrowType = left.schema
    val tieType = rightTieBreak
      .map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)

    val lU = left.select(
      col(leftKey).as("__k"),
      col(leftTime).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(tieType).as("__tie"),
      struct(left.columns.map(col): _*).as("__lrow"),
      lit(null).cast(rrowType).as("__rrow"))
    val rU = right.select(
      col(rightKey).as("__k"),
      col(rightTime).as("__t"),
      lit(0).as("__side"),
      rightTieBreak.map(col).getOrElse(lit(null).cast(tieType)).as("__tie"),
      lit(null).cast(lrowType).as("__lrow"),
      struct(rightCols.map(col): _*).as("__rrow"))

    // Sort so that, scanning the frame up to each left row, the LAST
    // right row seen is exactly the as-of match: time asc (desc for
    // forward), right before left at equal time (inclusive match), and
    // tiebreak ordered so the deterministic winner scans last.
    val ord: Seq[Column] =
      if (forward) Seq(col("__t").desc, col("__side").asc, col("__tie").desc)
      else Seq(col("__t").asc, col("__side").asc, col("__tie").asc)
    val w = Window
      .partitionBy("__k")
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lU.unionByName(rU)
      .withColumn("__mrow", last(col("__rrow"), ignoreNulls = true).over(w))
      .withColumn(
        "__mt",
        last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val inTol: Column = tolerance match {
      case None => col("__mt").isNotNull
      case Some(tol) =>
        val lagT =
          if (forward) col("__mt") - col("__t") else col("__t") - col("__mt")
        col("__mt").isNotNull && lagT <= tol
    }

    val outCols =
      left.columns.map(c => col(s"__lrow.$c").as(c)) ++
        rightCols.map(c => when(inTol, col(s"__mrow.$c")).as(c))
    matched.select(outCols.toSeq: _*)
  }
}
