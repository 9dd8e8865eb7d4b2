package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** The as-of join as a WHOLE-OPERATOR Catalyst extension — the third
  * rung of the extension ladder (after the codegen'd scalar expressions
  * and the `BoundedTopK` aggregate, and beside the `RangeJoinBinRule`
  * optimizer rewrite): a custom logical node, a planner `Strategy`, and
  * a physical `SparkPlan` that DECLARES its distribution + ordering
  * requirements and lets `EnsureRequirements` place the exchanges and
  * sorts — exactly how Spark's own joins are built.
  *
  * Semantics (LEFT BACKWARD as-of, inclusive — pandas `merge_asof`
  * direction="backward", DuckDB `ASOF JOIN`): every left row picks the
  * right row of the same key with the greatest time <= its own; ties on
  * equal right time break to the greatest `rightTie`. Unmatched left
  * rows emit nulls on the right. Null left keys/times never match; null
  * right keys/times never provide matches.
  *
  * vs [[graft.ops.AsofJoin]] (the union+window formulation): the same
  * single hash-shuffle + per-partition sort cost and identical answers
  * (q66/q243 share one oracle), but as a genuine operator — each side
  * is shuffled by ITS OWN key and streamed through a per-partition
  * two-pointer merge with O(1) state (one buffered candidate row), no
  * union row widening, no window machinery, and the plan prints as
  * `AsOfJoinExec` with its requirements visible to EnsureRequirements,
  * AQE, and reuse — which is the point of doing it at this rung.
  *
  * v1 scope: LongType keys/times/tie (epoch micros and bigint ids — the
  * catalog's as-of domain); no tolerance (compose a filter on the
  * emitted right time for that).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightTie: Attribute)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one physical candidate, children planned lazily. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightTie: Attribute)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides cluster on their key — EnsureRequirements inserts the
    * two hash exchanges (or reuses existing compatible partitioning)
    * and aligns partition counts, exactly as for a sort-merge join. */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)),
      ClusteredDistribution(Seq(rightKey)))

  /** Per-partition (key, time[, tie]) order — the merge below is a
    * single forward scan of both sorted streams. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lkOrd >= 0 && ltOrd >= 0 && rkOrd >= 0 && rtOrd >= 0,
      "as-of key/time attributes must come from the join children")
    val rWidth = right.output.size
    val schema = output
    val lRdd = left.execute()
    val rRdd = right.execute()
    // EnsureRequirements + AQE coalesce binary-node children as one
    // group, but fail loudly (not with zipPartitions' generic error)
    // if a future planner change ever breaks that invariant
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of children partition counts diverged: " +
        s"${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions}")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(schema.map(_.dataType).toArray)
      val nullRight = new GenericInternalRow(rWidth)
      // one buffered candidate: the best (greatest (time, tie)) right
      // row seen so far for `candKey` — O(1) state per partition
      var cand: InternalRow = null
      var candKey = 0L
      var nextRight: InternalRow = null
      def advanceRightTo(lk: Long, lt: Long): Unit = {
        var done = false
        while (!done) {
          if (nextRight == null) {
            if (rIter.hasNext) nextRight = rIter.next()
            else done = true
          } else if (nextRight.isNullAt(rkOrd) || nextRight.isNullAt(rtOrd)) {
            nextRight = null // null keys/times sort first; never match
          } else {
            val rk = nextRight.getLong(rkOrd)
            val rt = nextRight.getLong(rtOrd)
            if (rk < lk || (rk == lk && rt <= lt)) {
              if (rk == lk) { cand = nextRight.copy(); candKey = rk }
              nextRight = null
            } else done = true
          }
        }
      }
      lIter.map { lRow =>
        if (lRow.isNullAt(lkOrd) || lRow.isNullAt(ltOrd)) {
          proj(joined(lRow, nullRight))
        } else {
          val lk = lRow.getLong(lkOrd)
          val lt = lRow.getLong(ltOrd)
          if (cand != null && candKey != lk) cand = null
          advanceRightTo(lk, lt)
          if (cand != null && candKey == lk) proj(joined(lRow, cand))
          else proj(joined(lRow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public builder: registers the strategy once per session and wraps
  * the custom logical node back into the DataFrame API. */
object AsOfJoinPhysical {

  // extraStrategies is shared mutable session state: the check-then-
  // append below must be atomic or two concurrent callers (parallel
  // test suites share one session) register the strategy twice
  private val registerLock = new Object

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registerLock.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }

  /** Map an orderable column to an equivalent LongType ordering — the
    * v2 type-widening ladder: integral types cast, DateType becomes
    * epoch days, timestamps become epoch MICROS (so `asofForward`'s
    * tolerance is in micros for timestamps, days for dates). Every
    * mapping is strictly monotone and injective, so as-of match
    * semantics (greatest-time-<=, tie order) are preserved exactly. */
  private[graft] def toLongOrder(c: org.apache.spark.sql.Column,
      dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => c
      case ByteType | ShortType | IntegerType => c.cast(LongType)
      case DateType => org.apache.spark.sql.functions.unix_date(c).cast(LongType)
      case TimestampType => org.apache.spark.sql.functions.unix_micros(c)
      // NTZ reads as session-local; sessions here pin UTC
      case TimestampNTZType =>
        org.apache.spark.sql.functions.unix_micros(c.cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"as-of exec cannot order type $other (need integral/date/timestamp)")
    }
  }

  private val widenNames =
    Seq("__asof_lk", "__asof_lt", "__asof_rk", "__asof_rt", "__asof_tie")

  /** Left backward as-of join through [[AsOfJoinExec]]. Output = every
    * left column, then every right column (null when unmatched). Keys,
    * times, and the tie-break column may be any integral, date, or
    * timestamp type — non-Long columns are widened to an equivalent
    * LongType ordering in shadow columns the final projection drops
    * (cast-insertion, not a second exec implementation). */
  def asofBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTie: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    def dt(df: DataFrame, c: String) = df.schema(c).dataType
    val allLong =
      Seq(dt(left, leftKey) == LongType, dt(left, leftTime) == LongType,
        dt(right, rightKey) == LongType, dt(right, rightTime) == LongType,
        dt(right, rightTie) == LongType).forall(identity)
    if (allLong)
      asofBackwardLong(left, right, leftKey, rightKey,
        leftTime, rightTime, rightTie)
    else {
      val taken = (left.columns ++ right.columns).toSet
      require(!widenNames.exists(taken),
        "reserved __asof_* column names in input")
      val lw = left
        .withColumn("__asof_lk", toLongOrder(col(leftKey), dt(left, leftKey)))
        .withColumn("__asof_lt", toLongOrder(col(leftTime), dt(left, leftTime)))
      val rw = right
        .withColumn("__asof_rk", toLongOrder(col(rightKey), dt(right, rightKey)))
        .withColumn("__asof_rt", toLongOrder(col(rightTime), dt(right, rightTime)))
        .withColumn("__asof_tie", toLongOrder(col(rightTie), dt(right, rightTie)))
      asofBackwardLong(lw, rw, "__asof_lk", "__asof_rk",
          "__asof_lt", "__asof_rt", "__asof_tie")
        .select((left.columns ++ right.columns).toSeq
          .map(c => col(s"`$c`")): _*)
    }
  }

  /** The LongType core: builds the custom logical node directly. */
  private def asofBackwardLong(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTie: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    // the output is left.columns ++ right.columns; a shared name would
    // make every by-name select on the result (including asofForward's
    // final projection) ambiguous — fail at build time, not at use time
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"as-of left/right column names must be disjoint, shared: $shared")
    // re-alias the right side so its attribute ids are fresh — both
    // sides often derive from the SAME source table (q66: clicks and
    // purchases are both `events` slices), and a custom node gets no
    // help from the analyzer's join-dedup rules
    val rightFresh = right.select(
      right.columns.toSeq.map(c => col(c).as(c)): _*)
    val lp = left.queryExecution.analyzed
    val rp = rightFresh.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String, side: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"$side column $name not found"))
    val (lk, lt) = (attr(lp, leftKey, "left"), attr(lp, leftTime, "left"))
    val (rk, rt, tie) = (attr(rp, rightKey, "right"),
      attr(rp, rightTime, "right"), attr(rp, rightTie, "right"))
    Seq(lk, lt, rk, rt, tie).foreach(a => require(a.dataType == LongType,
      s"as-of exec v1 requires LongType, got ${a.name}: ${a.dataType}"))
    org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
      AsOfJoinPlan(lp, rp, lk, rk, lt, rt, tie))
  }

  /** Left FORWARD as-of join (least rightTime >= leftTime; ties to the
    * LEAST `rightTie`), with optional `toleranceWidened` on
    * rightTime − leftTime — through the SAME physical operator on
    * NEGATED times: backward's greatest −rt <= −lt is forward's least
    * rt >= lt, and backward's greatest −tie is forward's least tie.
    * No second exec implementation to keep correct. Out-of-tolerance
    * matches null out every right column, like pandas merge_asof.
    * Times/tie widen through [[toLongOrder]] before negation, so the
    * tolerance unit is the WIDENED unit: raw longs as-is, micros for
    * timestamps, days for dates. */
  def asofForward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTie: String, toleranceWidened: Option[Long] = None): DataFrame = {
    val taken = (left.columns ++ right.columns).toSet
    require(!taken.contains("__negt") && !taken.contains("__negrt") &&
      !taken.contains("__negtie"), "reserved __neg* column names in input")
    def dt(df: DataFrame, c: String) = df.schema(c).dataType
    val ltL = toLongOrder(col(leftTime), dt(left, leftTime))
    val rtL = toLongOrder(col(rightTime), dt(right, rightTime))
    val ln = left.withColumn("__negt", -ltL)
    val rn = right.withColumn("__negrt", -rtL)
      .withColumn("__negtie", -toLongOrder(col(rightTie), dt(right, rightTie)))
    val joined = asofBackward(ln, rn, leftKey, rightKey,
      "__negt", "__negrt", "__negtie")
    val matched = toleranceWidened match {
      case Some(tol) => col(rightTime).isNotNull && (rtL - ltL) <= tol
      case None => col(rightTime).isNotNull
    }
    joined.select(
      left.columns.toSeq.map(c => col(s"`$c`")) ++
        right.columns.toSeq.map(c =>
          org.apache.spark.sql.functions.when(matched, col(s"`$c`"))
            .as(c)): _*)
  }
}
