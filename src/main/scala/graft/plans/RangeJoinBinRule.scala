package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite a pure point-in-interval INNER join
  * (`p BETWEEN lo AND hi` with no equality key) into the bin-bucketed
  * equi-join [[graft.ops.RangeJoin]] builds by hand — automatically,
  * on the LOGICAL plan, so a user writing the naive join gets the
  * scalable plan (the same rewrite Databricks exposes as the
  * range-join hint; binning-as-equi-join goes back to the
  * interval-join literature, e.g. Chawda et al., "Processing Interval
  * Joins On Map-Reduce", EDBT'14).
  *
  * Why a `Rule[LogicalPlan]`: without an equality conjunct Spark can
  * only plan BroadcastNestedLoopJoin or a cartesian product —
  * O(|P|·|I|) comparisons, the canonical 100 TB scale-killer — and no
  * amount of DataFrame-level care fixes a plan the user already
  * declared. This is the library's demonstration of extension rung
  * (c): a logical rewrite registered through
  * `SparkSessionExtensions.injectOptimizerRule` /
  * `spark.experimental.extraOptimizations`, kicking in only when the
  * shape is provably rewritable and leaving every other plan
  * untouched.
  *
  * Trigger: inner join whose condition's conjuncts contain
  * `p >= lo AND p <= hi` (any orientation) where `p` is an integral
  * attribute from one side and `lo`/`hi` integral attributes from the
  * other, and `spark.graft.rangeJoin.binSize` is a positive long (the
  * bin width in the column's own units — pick it near the typical
  * interval length, exactly as for the manual operator).
  *
  * Routing note: this rule produces the general-purpose PAIRS plan.
  * When the join's ONLY consumer is an associative count/sum per
  * interval, [[graft.ops.RangeAgg.intervalCountSum]] answers the same
  * query with zero candidate-pair materialization (~9.5× cheaper at
  * 10× scale) — see RangeAgg's decision table for the criteria; the
  * aggregate-over-join auto-rewrite is deliberately caller-opt-in.
  *
  * Rewrite (all exact integer arithmetic — epoch-nanos overflow a
  * double): the point side gains `__graft_bin = (p - pmod(p, w)) div
  * w`; the interval side is filtered to `lo <= hi` (a no-op for the
  * inner join, but it keeps `sequence` total) and EXPLODED to one row
  * per spanned bin; the join becomes an equi-join on the bin plus the
  * ORIGINAL condition as residual — each matching pair meets in
  * exactly one bin (the point's), so no dedup is needed and any extra
  * conjuncts are preserved verbatim. A final Project restores the
  * original output attribute set.
  */
object RangeJoinBinRule extends Rule[LogicalPlan] {

  val BinSizeKey = "spark.graft.rangeJoin.binSize"
  private val BinCol = "__graft_bin"

  private def binSize: Long =
    try SQLConf.get.getConfString(BinSizeKey, "0").toLong
    catch { case _: NumberFormatException => 0L }

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** (point, lo, hi, pointOnLeft) if the conjuncts contain the range
    * sandwich with point and bounds on opposite sides. */
  private def findRange(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan)
      : Option[(Attribute, Attribute, Attribute, Boolean)] = {
    // normalize each comparison to (small, large)
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(a: Attribute, b: Attribute) => (b, a)
      case LessThanOrEqual(a: Attribute, b: Attribute) => (a, b)
    }
    def side(a: Attribute): Option[Boolean] =
      if (left.outputSet.contains(a)) Some(true)
      else if (right.outputSet.contains(a)) Some(false) else None
    val candidates = for {
      (lo, p1) <- lowers if integral(lo) && integral(p1)
      (p2, hi) <- lowers if p2.semanticEquals(p1) && integral(hi)
      pSide <- side(p1)
      loSide <- side(lo) if loSide != pSide
      hiSide <- side(hi) if hiSide != pSide
    } yield (p1, lo, hi, pSide)
    candidates.headOption
  }

  private def binExpr(e: Expression, w: Long): Expression = {
    val x = asLong(e)
    IntegralDivide(Subtract(x, Pmod(x, Literal(w))), Literal(w))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binSize
    if (w <= 0) return plan
    plan transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !j.output.exists(_.name.startsWith(BinCol)) &&
            !left.output.exists(_.name.startsWith(BinCol)) &&
            !right.output.exists(_.name.startsWith(BinCol)) =>
        val conjuncts = splitConjunctivePredicates(cond)
        // with a cross-side equality conjunct Spark already plans a
        // hash join — binning would only add explode fanout; stand down
        val hasEquiKey = conjuncts.exists {
          case EqualTo(a: Attribute, b: Attribute) =>
            (left.outputSet.contains(a) && right.outputSet.contains(b)) ||
              (left.outputSet.contains(b) && right.outputSet.contains(a))
          case _ => false
        }
        if (hasEquiKey) j
        else findRange(conjuncts, left, right) match {
          case None => j
          case Some((p, lo, hi, pointOnLeft)) =>
            val (pointPlan, intervalPlan) =
              if (pointOnLeft) (left, right) else (right, left)
            // point side: one bin per row
            val pBinAlias = Alias(binExpr(p, w), BinCol + "_p")()
            val pointProj = Project(
              pointPlan.output :+ pBinAlias, pointPlan)
            // interval side: keep sequence total, explode spanned bins
            val guarded = Filter(
              LessThanOrEqual(asLong(lo), asLong(hi)), intervalPlan)
            // Sequence is TimeZoneAwareExpression; the analyzer's
            // ResolveTimeZone has already run, so set the zone here or
            // the plan degrades to unresolved
            val seq = Sequence(
              binExpr(lo, w), binExpr(hi, w), Some(Literal(1L)),
              Some(SQLConf.get.sessionLocalTimeZone))
            val binAttr = AttributeReference(
              BinCol + "_i", LongType, nullable = false)()
            val gen = Generate(Explode(seq), Nil, outer = false,
              qualifier = None, generatorOutput = Seq(binAttr),
              child = guarded)
            val eq = EqualTo(pBinAlias.toAttribute, binAttr)
            val (newLeft, newRight) =
              if (pointOnLeft) (pointProj, gen) else (gen, pointProj)
            val rewritten = Join(newLeft, newRight, Inner,
              Some(And(eq, cond)), hint)
            Project(j.output, rewritten)
        }
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(a, b) =>
        splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
      case other => Seq(other)
    }

  /** Idempotently enable the rule on a live session (tests, Verify,
    * Bench); `GraftExtensions` injects it for
    * `spark.sql.extensions` users. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
