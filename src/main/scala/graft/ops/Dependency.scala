package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate functional-dependency checking: does X (a column set)
  * determine Y? The schema-inference primitive behind key-candidate
  * detection and join-safety checks ("is doc_id unique?", "does
  * nationkey pin region?") — profiling metadata the reference's
  * per-column stats can't see because it is CROSS-column.
  *
  * One groupBy(lhs) with a distinct-count of rhs (Spark plans the
  * standard two-phase expand — partial per-partition distinct, then
  * merge; hash-partitioned by lhs, scale-safe), then a one-row rollup:
  * a group with more than one distinct rhs value VIOLATES the
  * dependency. Rows where rhs is null don't count toward a group's
  * distinct values (count-distinct SQL semantics): an unknown value
  * is no evidence against the FD. */
object Dependency {

  /** One-row result: (n_groups, n_violating, p_violating,
    * max_distinct, n_rows). The FD lhs→rhs HOLDS exactly when
    * n_violating = 0. p_violating is the violating-group fraction
    * rounded to 8 decimals. */
  def fdViolations(
      df: DataFrame, lhs: Seq[String], rhs: String): DataFrame = {
    require(lhs.nonEmpty, "need at least one determinant column")
    val groups = df
      .groupBy(lhs.map(col): _*)
      .agg(
        countDistinct(col(rhs)).as("nd"),
        count(lit(1)).as("sz"))
    groups.agg(
      count(lit(1)).as("n_groups"),
      count(when(col("nd") > 1, 1)).as("n_violating"),
      round(count(when(col("nd") > 1, 1)) /
        count(lit(1)).cast("double"), 8).as("p_violating"),
      max(col("nd")).as("max_distinct"),
      sum(col("sz")).as("n_rows"))
  }
}
