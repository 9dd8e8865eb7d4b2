package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity and join-shape diagnostics — the checks a
  * pipeline runs BEFORE a 100 TB join: how many child rows have no
  * parent (orphans — silently dropped by an inner join), how many
  * parents have no children, and what the fan-out distribution looks
  * like (a p99 fan-out of 10⁵ means the join output explodes).
  *
  * Orphan counts are anti-join aggregates: Spark plans a null-safe
  * hash anti join, broadcasting whichever key set is small (AQE), and
  * the aggregate collapses to one row — nothing wide ever
  * materializes. Fan-out first collapses the child to (key, cnt) —
  * ONE map-side-combinable groupBy, the only full-child shuffle —
  * then left-joins the distinct parent keys so childless parents count
  * as fan-out 0. */
object JoinHealth {

  /** One-row orphan summary: (n_child, n_child_orphan, p_child_orphan,
    * n_parent, n_parent_childless). Null child keys are orphans by
    * definition (they can never match a parent; SQL inner-join
    * semantics would drop them). */
  def orphanStats(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val ck = child.select(col(childKey).as("k"))
    val pk = parent.select(col(parentKey).as("k"))
    // anti joins build a key hash set from the right side directly —
    // no pre-distinct (that would just add a shuffle)
    val orphans = ck.join(pk, Seq("k"), "left_anti")
      .agg(count(lit(1)).as("n_child_orphan"))
    val childless = pk.join(ck, Seq("k"), "left_anti")
      .agg(count(lit(1)).as("n_parent_childless"))
    val nc = ck.agg(count(lit(1)).as("n_child"))
    val np = pk.agg(count(lit(1)).as("n_parent"))
    nc.crossJoin(orphans).crossJoin(np).crossJoin(childless)
      .select(
        col("n_child"), col("n_child_orphan"),
        round(when(col("n_child") > 0,
          col("n_child_orphan") / col("n_child").cast("double")), 8)
          .as("p_child_orphan"),
        col("n_parent"), col("n_parent_childless"))
  }

  /** Fan-out distribution of parent→child: one row with
    * (n_parent, n_childless, min/p50/avg/max fan-out). Childless
    * parents participate as 0; children whose key matches no parent
    * (orphans) are excluded — this measures the join's output shape.
    * avg is rounded to 8; p50 is the exact interpolated median of the
    * per-parent counts. */
  def fanout(
      parent: DataFrame, parentKey: String,
      child: DataFrame, childKey: String): DataFrame = {
    val perKey = child.groupBy(col(childKey).as("k"))
      .agg(count(lit(1)).as("c"))
    val perParent = parent.select(col(parentKey).as("k")).distinct()
      .join(perKey, Seq("k"), "left")
      .select(coalesce(col("c"), lit(0L)).as("c"))
    perParent.agg(
      count(lit(1)).as("n_parent"),
      count(when(col("c") === 0, 1)).as("n_childless"),
      min(col("c")).as("min_fanout"),
      expr("percentile(c, 0.5)").as("p50_fanout"),
      round(avg(col("c")), 8).as("avg_fanout"),
      max(col("c")).as("max_fanout"))
  }

  /** Exact equi-join output size WITHOUT executing the join:
    * |A ⋈ B| = Σ_k d_A(k)·d_B(k) over matching keys — the first-order
    * statistic every cost-based optimizer wants before committing to
    * a join order, and the skew tripwire (`max_key_rows / join_rows`)
    * that says whether the 100 TB shuffle needs salting BEFORE the
    * straggler appears. Two map-side-combined degree aggregations +
    * one join on the (far smaller) distinct-key tables: the cost
    * scales with key cardinality, never with the fact-table fanout
    * the real join would materialize — which is the point of
    * estimating. Returns one row: (join_rows, n_matched_keys,
    * max_key_rows, skew_frac 6dp). */
  def joinSizeEstimate(a: DataFrame, aKey: String,
      b: DataFrame, bKey: String): DataFrame = {
    val da = a.where(col(aKey).isNotNull)
      .groupBy(col(aKey).as("k")).agg(count(lit(1)).as("da"))
    val db = b.where(col(bKey).isNotNull)
      .groupBy(col(bKey).as("k")).agg(count(lit(1)).as("db"))
    da.join(db, "k")
      .select((col("da") * col("db")).as("prod"))
      .agg(sum(col("prod")).as("join_rows"),
        count(lit(1)).as("n_matched_keys"),
        max(col("prod")).as("max_key_rows"))
      .select(col("join_rows"), col("n_matched_keys"),
        col("max_key_rows"),
        round(col("max_key_rows").cast("double") / col("join_rows"), 6)
          .as("skew_frac"))
  }
}
