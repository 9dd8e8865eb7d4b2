package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — Deequ/Great-Expectations-style
  * rule checks, the operational complement to the profiler's alerts
  * (reference alerts are threshold rules over computed stats,
  * `model/alerts.py`; these run row-level predicates directly).
  *
  * ALL rules evaluate in ONE fused aggregate over ONE scan (map-side
  * combined, whole-stage codegen'd): per rule a conditional count of
  * violating rows. The single result row is melted to one row per rule
  * with `stack` — no shuffle beyond the scalar aggregate. A rule whose
  * predicate evaluates to NULL on a row (e.g. comparisons on null
  * inputs) counts that row as a VIOLATION: a check that cannot be
  * proven true is failed, matching SQL constraint semantics
  * (`NOT coalesce(pred, false)`).
  *
  * At 100 TB this is exactly the plan you want: one pass, no joins, no
  * data movement — the cost is the scan, amortizable by stacking any
  * number of rules into the same aggregate.
  */
object Validate {

  /** A named row-level expectation over the input frame. */
  final case class Rule(name: String, predicate: Column)

  /** One row per rule: (rule, n_violations, n_rows, pass_rate).
    * pass_rate is rounded to 8 decimals; null on an empty input. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique")
    require(rules.forall(_.name.matches("[A-Za-z0-9_.-]+")),
      "rule names must be [A-Za-z0-9_.-]+ (they ride into a stack() literal)")
    val aggs = rules.map { r =>
      count(when(!coalesce(r.predicate, lit(false)), 1))
        .as(s"v_${r.name}")
    } :+ count(lit(1)).as("n_rows__")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules
      .map(r => s"'${r.name}', `v_${r.name}`").mkString(", ")
    row
      .select(col("n_rows__"),
        expr(s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)"))
      .select(
        col("rule"), col("n_violations"), col("n_rows__").as("n_rows"),
        round(when(col("n_rows__") > 0,
          (col("n_rows__") - col("n_violations")) /
            col("n_rows__").cast("double")), 8).as("pass_rate"))
      .orderBy("rule")
  }
}
