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
    *
    * Dispatch: when the key/time/tie columns are all on the exec's
    * type-widening ladder (integral, date, timestamp — the v2 ladder
    * of [[graft.plans.AsOfJoinPhysical.toLongOrder]]; Long is the
    * identity rung), a tiebreak is given, and the needed right columns
    * don't clash with the left, the join runs through the CUSTOM
    * PHYSICAL OPERATOR ([[graft.plans.AsOfJoinExec]] — declared
    * distributions/orderings, O(1)-state per-partition merge); the
    * union+window formulation below is the general-type fallback.
    * Same cost class (one hash shuffle + per-partition sort each) and
    * identical answers (AsOfJoinExecSpec fuzz-agrees the two paths;
    * q66/q243 share one oracle), so routing changes the PLAN, not the
    * result. For date/timestamp-typed times, `tolerance` is in the
    * WIDENED unit — micros for timestamps, days for dates, the raw
    * value for integrals (same contract as asofForward's
    * toleranceWidened) — and the window fallback widens through the
    * same toLongOrder mapping, so the contract holds on BOTH routes.
    * The exec additionally requires left/right key and time pairs to
    * widen to the SAME unit (a date-vs-timestamp pair falls back to
    * the window path, whose unionByName coerces both sides).
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

    val routed = execEligible(left, right, leftKey, rightKey, leftTime,
      rightTime, rightCols, rightTieBreak).map { tb =>
      val rightNeed = (Seq(rightKey, rightTime, tb) ++ rightCols).distinct
      val rightProj = right.select(rightNeed.map(col): _*)
      val joined =
        if (forward)
          graft.plans.AsOfJoinPhysical.asofForward(left, rightProj,
            leftKey, rightKey, leftTime, rightTime, tb, tolerance)
        else {
          val j = graft.plans.AsOfJoinPhysical.asofBackward(left, rightProj,
            leftKey, rightKey, leftTime, rightTime, tb)
          tolerance match {
            case Some(tol) =>
              // out-of-tolerance matches null out every right column,
              // same contract as the window path below; the difference
              // is computed in the exec's widened Long ordering so
              // timestamp/date-typed times subtract as micros/days
              // instead of producing an interval
              def wide(df: DataFrame, c: String) =
                graft.plans.AsOfJoinPhysical.toLongOrder(
                  col(c), df.schema(c).dataType)
              val ok = col(rightTime).isNotNull &&
                (wide(left, leftTime) - wide(right, rightTime)) <= tol
              j.select(left.columns.toSeq.map(c => col(s"`$c`")) ++
                rightNeed.map(c => when(ok, col(s"`$c`")).as(c)): _*)
            case None => j
          }
        }
      joined.select((left.columns.toSeq ++ rightCols).map(c => col(s"`$c`")): _*)
    }
    routed.getOrElse(asofViaWindow(left, right, leftKey, rightKey,
      leftTime, rightTime, rightCols, rightTieBreak, tolerance, forward))
  }

  /** The exec route's eligibility: Some(tieBreak) when every key/time/
    * tie column is on the exec's widening ladder (integral, date,
    * timestamp — anything [[graft.plans.AsOfJoinPhysical.toLongOrder]]
    * maps to an equivalent Long ordering), a tiebreak exists, and the
    * right columns the exec must carry are name-disjoint from the left
    * (the exec emits left ++ right by name). Anything else → window
    * fallback. */
  private def execEligible(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String], rightTieBreak: Option[String]): Option[String] =
    rightTieBreak.filter { tb =>
      import org.apache.spark.sql.types._
      // toLongOrder's unit class: integrals widen raw, dates to
      // epoch-days, timestamps to epoch-micros. None = off the ladder.
      def unit(df: DataFrame, c: String): Option[Int] =
        df.schema.fields.find(_.name == c).map(_.dataType).flatMap {
          case ByteType | ShortType | IntegerType | LongType => Some(0)
          case DateType => Some(1)
          case TimestampType | TimestampNTZType => Some(2)
          case _ => None
        }
      // left and right must widen to the SAME unit per column pair —
      // a DateType left time vs TimestampType right time would compare
      // epoch-days against epoch-micros in the exec; the window
      // fallback's unionByName coerces both sides to one type, so only
      // unit-consistent pairs may route to the exec.
      def sameUnit(lc: String, rc: String): Boolean = (unit(left, lc),
        unit(right, rc)) match {
        case (Some(a), Some(b)) => a == b
        case _ => false
      }
      val rightNeed = (Seq(rightKey, rightTime, tb) ++ rightCols).distinct
      sameUnit(leftKey, rightKey) && sameUnit(leftTime, rightTime) &&
        unit(right, tb).isDefined &&
        rightNeed.toSet.intersect(left.columns.toSet).isEmpty &&
        !(left.columns ++ rightNeed).exists(n =>
          n.startsWith("__neg") || n.startsWith("__asof_"))
    }

  /** The union + carry-forward-window formulation (see the object
    * scaladoc) — the general-type path every non-Long as-of takes.
    * Package-visible so AsOfJoinExecSpec can fuzz-compare the two
    * formulations even for Long-typed inputs `asof` would route. */
  private[graft] def asofViaWindow(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      rightTieBreak: Option[String],
      tolerance: Option[Long],
      forward: Boolean): DataFrame = {

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
    // null right keys/times never PROVIDE matches (SQL-join / pandas
    // merge_asof semantics, and exactly what AsOfJoinExec does — the
    // two dispatch paths must agree on the null contract, since which
    // one runs depends only on column types). Unfiltered, a window
    // PARTITION BY would group null keys together and let null-key
    // left rows match null-key right rows.
    val rU = right
      .where(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
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

    // a null LEFT key/time never matches either (in forward/desc order
    // a null left time would otherwise sort last and "see" every right
    // row); same contract as the exec's null pad
    val leftValid = col("__k").isNotNull && col("__t").isNotNull
    val inTol: Column = tolerance match {
      case None => leftValid && col("__mt").isNotNull
      case Some(tol) =>
        // widen date/timestamp-typed times through the exec's
        // toLongOrder so tolerance is in the SAME unit (days/micros)
        // on both dispatch routes; raw subtraction only for types off
        // the ladder (plain numerics), where it is already well-typed.
        // __t and __mt share the union's coerced time type.
        val tType = matched.schema("__t").dataType
        def wide(c: Column): Column = tType match {
          case org.apache.spark.sql.types.DateType |
               org.apache.spark.sql.types.TimestampType |
               org.apache.spark.sql.types.TimestampNTZType =>
            graft.plans.AsOfJoinPhysical.toLongOrder(c, tType)
          case _ => c
        }
        val lagT =
          if (forward) wide(col("__mt")) - wide(col("__t"))
          else wide(col("__t")) - wide(col("__mt"))
        leftValid && col("__mt").isNotNull && lagT <= tol
    }

    val outCols =
      left.columns.map(c => col(s"__lrow.$c").as(c)) ++
        rightCols.map(c => when(inTol, col(s"__mrow.$c")).as(c))
    matched.select(outCols.toSeq: _*)
  }
}
