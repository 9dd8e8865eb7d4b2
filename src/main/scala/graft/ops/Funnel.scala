package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence funnel analysis (ClickHouse `windowFunnel` shape):
  * for each key, the first time each step of an event-type sequence is
  * reached, where step i only counts at-or-after the first completion of
  * step i-1. The reference has no temporal operators; this extends the
  * pipeline surface alongside Sessionize/AsofJoin.
  *
  * Spark-first design: ONE hash shuffle on the key, then a chain of
  * running-min window expressions over the same (key, time, stepIdx)
  * sort — `min(when(step_i qualifies, t))` carries "step i-1 already
  * seen" forward, so a row knows in O(1) whether it advances the funnel.
  * All windows share partitioning and ordering, so Catalyst plans them
  * as consecutive WindowExecs over a single exchange+sort. The final
  * per-key rollup is a plain partial-aggregated groupBy. No joins, no
  * per-key iteration, O(1) state per row — the plan is unchanged at
  * 1000 executors.
  *
  * Equal timestamps: rows sort by (time, step index), so an earlier step
  * at the same instant counts as preceding — i.e. step i matches at
  * `t >= first(step i-1)` inclusively. Deterministic given distinct
  * (time, step) pairs per key.
  */
object Funnel {

  /** Per-key funnel: one row per key with `t1..tk` (first qualifying time
    * per step, null once the chain breaks) and `level` = number of steps
    * completed. `window` (same units as `time`) bounds the whole funnel
    * to `t_i - t1 <= window` relative to the first step-1 time.
    */
  def funnel(
      df: DataFrame,
      key: String,
      time: String,
      typeCol: String,
      steps: Seq[String],
      window: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    val clash = df.columns.filter(c =>
      c == "level" || c.startsWith("__fq") || c.startsWith("__frun"))
    require(clash.isEmpty, s"reserved column names in input: ${clash.toSeq}")

    // step index orders equal-time rows so earlier steps sort first
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(steps.size)) { case (acc, (s, i)) =>
        when(col(typeCol) === s, lit(i)).otherwise(acc)
      }
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(time).asc, stepIdx.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // __fq{i}: this row advances step i (its type matches and step i-1's
    // running first-time is already set — inclusively, per the sort);
    // __frun{i}: running min qualifying time of step i.
    var cur = df
    steps.zipWithIndex.foreach { case (s, i) =>
      val isStep = col(typeCol) === s
      val q: Column =
        if (i == 0) isStep
        else {
          val chained = isStep && col(s"__frun${i - 1}").isNotNull
          window match {
            case Some(win) => chained && col(time) - col("__frun0") <= win
            case None => chained
          }
        }
      cur = cur
        .withColumn(s"__fq$i", q)
        .withColumn(s"__frun$i", min(when(col(s"__fq$i"), col(time))).over(w))
    }

    val stepAggs = steps.indices.map { i =>
      min(when(col(s"__fq$i"), col(time))).as(s"t${i + 1}")
    }
    val agg = cur.groupBy(col(key)).agg(stepAggs.head, stepAggs.tail: _*)
    // level = longest non-null prefix (suffix nulls are structural: step i
    // can only qualify after step i-1 did)
    val level = (1 to steps.size).map(i => when(col(s"t$i").isNotNull, 1)
      .otherwise(0)).reduce(_ + _)
    agg.withColumn("level", level.cast("long"))
  }

  /** Last-touch conversion attribution: for every `conversion`-typed
    * event, credit the immediately-preceding event's type on the same
    * key ("(none)" when the conversion opens the key's history), rolled
    * up to attributed-conversion counts per touch type. A preceding
    * conversion credits `conversion` itself — the standard last-touch
    * convention (repeat purchases attribute to the previous purchase).
    *
    * ONE hash shuffle on the key, one lag window ordered by
    * (time, idCol) — the id tiebreak makes equal-timestamp histories
    * deterministic across engines/runs — then a partial-aggregated
    * rollup bounded by the type vocabulary. */
  def lastTouchAttribution(
      df: DataFrame, key: String, time: String, idCol: String,
      typeCol: String, conversion: String): DataFrame = {
    require(!df.columns.contains("__prev"),
      "reserved column name `__prev` in input")
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(idCol))
    df.withColumn("__prev", lag(col(typeCol), 1).over(w))
      .where(col(typeCol) === conversion)
      .groupBy(coalesce(col("__prev"), lit("(none)")).as("touch"))
      .agg(count(lit(1)).as("conversions"))
  }

  /** Linear multi-touch attribution: each conversion's credit splits
    * EQUALLY over the touches in its journey (the events since the
    * key's previous conversion), the standard counterweight to
    * [[lastTouchAttribution]]'s recency bias. A journey with no
    * touches credits `(none)` in full.
    *
    * Journey ids are the running count of PRIOR conversions per key —
    * one lag-free window on the same (time, idCol)-deterministic
    * ordering — so each conversion closes journey j and the touches
    * with the same j fund it. Per-(key, journey, touch) counts roll
    * up through a journey-size window (partitioned — never global),
    * and the per-type credit Σ ct/n rounds at 6dp. Returns
    * (touch, credit), ordered by touch. */
  def linearAttribution(
      df: DataFrame, key: String, time: String, idCol: String,
      typeCol: String, conversion: String): DataFrame = {
    require(!df.columns.contains("__j"),
      "reserved column name `__j` in input")
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(idCol))
    val withJ = df
      .where(col(key).isNotNull && col(time).isNotNull &&
        col(typeCol).isNotNull)
      .withColumn("__j", coalesce(
        sum(when(col(typeCol) === conversion, 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .localCheckpoint(false)
    val touches = withJ.where(col(typeCol) =!= conversion)
      .select(col(key).as("k"), col("__j"), col(typeCol).as("touch"))
    // journey ids count only PRIOR conversions, so each conversion's
    // (key, journey) is unique by construction
    val convs = withJ.where(col(typeCol) === conversion)
      .select(col(key).as("k"), col("__j"))
    val perTouch = touches.join(convs, Seq("k", "__j"))
      .groupBy("k", "__j", "touch").agg(count(lit(1)).as("ct"))
    val wj = Window.partitionBy(col("k"), col("__j"))
    val credited = perTouch
      .withColumn("__n", sum(col("ct")).over(wj))
      .groupBy("touch")
      .agg(sum(col("ct").cast("double") / col("__n")).as("credit"))
    val empties = convs.join(touches.select("k", "__j").distinct(),
        Seq("k", "__j"), "left_anti")
      .agg(count(lit(1)).cast("double").as("credit"))
      .select(lit("(none)").as("touch"), col("credit"))
      .where(col("credit") > 0)
    credited.union(empties)
      .select(col("touch"), round(col("credit"), 6).as("credit"))
      .orderBy("touch")
  }

  /** Time-decay multi-touch attribution: [[linearAttribution]]'s
    * journey construction, but each touch's share of its conversion's
    * credit is exponentially weighted by recency — w = 2^(−Δt/halfLife)
    * with Δt the touch-to-conversion time — so a touch minutes before
    * purchase outweighs one from last week, the standard middle ground
    * between last-touch (q117) and uniform linear (q148).
    *
    * Every touch ROW carries its own weight (two clicks of the same
    * type at different times weigh differently); shares normalize per
    * conversion via one (key, journey) window; the per-type rollup is
    * a float sum rounded at 6dp — q148's accepted tolerance
    * discipline. Conversions with no prior touches credit "(none)".
    * Same plan shape as linear: per-key windows + one journey join,
    * nothing global. */
  def timeDecayAttribution(
      df: DataFrame, key: String, time: String, idCol: String,
      typeCol: String, conversion: String,
      halfLifeUs: Long): DataFrame = {
    require(halfLifeUs > 0, "halfLifeUs must be positive")
    require(!df.columns.contains("__j"),
      "reserved column name `__j` in input")
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(idCol))
    val withJ = df
      .where(col(key).isNotNull && col(time).isNotNull &&
        col(typeCol).isNotNull)
      .withColumn("__j", coalesce(
        sum(when(col(typeCol) === conversion, 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .localCheckpoint(false)
    val touches = withJ.where(col(typeCol) =!= conversion)
      .select(col(key).as("k"), col("__j"), col(typeCol).as("touch"),
        col(time).as("tu"))
    val convs = withJ.where(col(typeCol) === conversion)
      .select(col(key).as("k"), col("__j"), col(time).as("tc"))
    val weighted = touches.join(convs, Seq("k", "__j"))
      .withColumn("w", pow(lit(0.5),
        (col("tc") - col("tu")).cast("double") / lit(halfLifeUs.toDouble)))
    val wj = Window.partitionBy(col("k"), col("__j"))
    val credited = weighted
      .withColumn("__sw", sum(col("w")).over(wj))
      .groupBy("touch")
      .agg(sum(col("w") / col("__sw")).as("credit"))
    val empties = convs.join(touches.select("k", "__j").distinct(),
        Seq("k", "__j"), "left_anti")
      .agg(count(lit(1)).cast("double").as("credit"))
      .select(lit("(none)").as("touch"), col("credit"))
      .where(col("credit") > 0)
    credited.union(empties)
      .select(col("touch"), round(col("credit"), 6).as("credit"))
      .orderBy("touch")
  }
}
