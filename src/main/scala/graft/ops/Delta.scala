package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-version diffing: row-level added/removed/changed/unchanged
  * classification between two snapshots of a keyed table — the audit a
  * training-data pipeline runs when a corpus is re-crawled, re-filtered,
  * or re-scored, before deciding whether a downstream rebuild is needed
  * (and the primitive under incremental re-processing: ship only the
  * `added`+`changed` slice).
  *
  * Scale design (100 TB): ONE hash-partitioned full outer join on the
  * key columns; every per-column comparison is a codegen'd null-safe
  * equality on the joined row — no driver state, no second scan. The
  * output is row-level; aggregate it for a summary (the q154 shape) or
  * filter `status != 'unchanged'` for an incremental feed, and Catalyst
  * prunes the unused comparison columns either way.
  */
object Delta {

  /** Diff `newDf` against `oldDf` by `keyCols`. Both frames must share
    * the exact schema (names and order). Returns the key columns plus:
    *
    *   - `status`: 'added' (key only in new), 'removed' (only in old),
    *     'changed' (both, some non-key column differs null-safely),
    *     'unchanged' (both, all equal);
    *   - `changed_cols`: comma-joined names of the differing non-key
    *     columns in schema order; empty string unless status='changed'.
    *
    * Null-safe semantics: a null column equals null (so a row of nulls
    * is 'unchanged', not 'changed'), matching SQL IS NOT DISTINCT FROM.
    * Keys must be unique per snapshot — duplicates would fan out in the
    * join exactly as they would in any keyed diff. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(oldDf.columns.sameElements(newDf.columns),
      s"snapshot schemas must match: ${oldDf.columns.toSeq} vs " +
        s"${newDf.columns.toSeq}")
    val valCols = oldDf.columns.filterNot(keyCols.contains).toSeq
    require(valCols.nonEmpty, "no non-key columns to diff")
    val o = oldDf.select(
      keyCols.map(col) :+ struct(valCols.map(col): _*).as("__ov"): _*)
    val n = newDf.select(
      keyCols.map(col) :+ struct(valCols.map(col): _*).as("__nv"): _*)
    val inOld = col("__ov").isNotNull
    val inNew = col("__nv").isNotNull
    val allEq = col("__ov") <=> col("__nv")
    val changedCols = concat_ws(",", valCols.map(c =>
      when(!(col("__ov").getField(c) <=> col("__nv").getField(c)),
        lit(c))): _*)
    o.join(n, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        when(!inOld, "added").when(!inNew, "removed")
          .when(allEq, "unchanged").otherwise("changed").as("status"),
        when(inOld && inNew && !allEq, changedCols)
          .otherwise("").as("changed_cols")): _*)
  }

  /** Slowly-changing-dimension (type 2) compaction: collapse a keyed
    * event timeline into effective-dated state runs — the history table
    * a warehouse keeps per entity, built from raw change events.
    *
    * Consecutive rows of one key with the SAME `stateCol` value fold
    * into one run; output per run: (key, state, effective_from,
    * effective_to, n_events), where effective_to is the next run's
    * effective_from and null for the currently-open run. Null states
    * are kept as their own level: the lag rides in a struct so
    * "first row of the key" (null struct) is distinguishable from
    * "previous state is null" (non-null struct, null field) — the
    * [[Transitions]] lesson.
    *
    * Scale: two windows and one groupBy, ALL partitioned by the key —
    * no global ordering anywhere, so the plan is one hash shuffle on
    * the key reused by every step. Ties in `orderCol` are broken by
    * `tieBreak` for a deterministic sequence. */
  def scd2(df: DataFrame, keyCol: String, orderCol: String,
      stateCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy((col(orderCol) +: tieBreak.map(col)): _*)
    val chg = df
      .select(Seq(col(keyCol), col(orderCol)) ++ tieBreak.map(col) :+
        col(stateCol).as("state"): _*)
      .withColumn("__prev", lag(struct(col("state").as("st")), 1).over(w))
      .withColumn("__chg",
        when(col("__prev").isNotNull &&
          (col("__prev.st") <=> col("state")), lit(0L)).otherwise(lit(1L)))
      .withColumn("__run", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = chg.groupBy(col(keyCol), col("__run"), col("state"))
      .agg(min(col(orderCol)).as("effective_from"),
        count(lit(1)).as("n_events"))
    val wr = Window.partitionBy(keyCol).orderBy(col("__run"))
    runs
      .withColumn("effective_to", lead(col("effective_from"), 1).over(wr))
      .select(col(keyCol), col("state"), col("effective_from"),
        col("effective_to"), col("n_events"))
  }

  /** Point-in-time state lookup over the [[scd2]] history: each key's
    * active run at instant `at` — the "reconstruct the world as of T"
    * query a warehouse answers from its SCD2 table. A run is active
    * when effective_from ≤ at < effective_to (the open run has no
    * upper bound); keys whose timeline starts after `at` emit no row.
    * Same single key-hash shuffle as [[scd2]] plus one filter. */
  def stateAsOf(df: DataFrame, keyCol: String, orderCol: String,
      stateCol: String, tieBreak: Seq[String], at: Long): DataFrame =
    scd2(df, keyCol, orderCol, stateCol, tieBreak)
      .where(col("effective_from") <= at &&
        (col("effective_to").isNull || col("effective_to") > at))
      .select(col(keyCol), col("state"), col("effective_from"),
        col("n_events"))

  /** CDC apply / SCD1 MERGE — fold a changelog into a keyed snapshot,
    * the `MERGE INTO` every lakehouse sync job runs, as plain
    * relational algebra (no table format needed): per key the LATEST
    * change wins (one mergeable max-of-struct aggregate over
    * `orderCols` — no per-key window sort), a terminal op = "D"
    * deletes the key, any other op upserts `valueCols`, and keys the
    * log never touched pass through. One map-side-combined groupBy on
    * the log + one full outer join on the key — both hash-partitioned
    * on the same key, so at 100 TB this is two co-partitionable
    * shuffles regardless of log skew (the aggregate collapses hot keys
    * before the join). `base` must carry `keyCol` and `valueCols`.
    *
    * Ordering contract: `orderCols` must UNIQUELY order the changes
    * within a key (a changelog sequence number, an LSN, or a
    * (timestamp, change_id) pair — q241 passes o_orderkey). The
    * max-of-struct packs opCol and valueCols after orderCols only to
    * carry them; if two changes tie on every orderCol the winner is
    * decided by lexicographic (op, values) bytes, which is arbitrary
    * CDC semantics — supply a tie-breaking order column instead of
    * relying on it. */
  def cdcUpsert(base: DataFrame, changes: DataFrame, keyCol: String,
      orderCols: Seq[String], opCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val latest = changes
      .where(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(max(struct((orderCols.map(col) :+ col(opCol)) ++
        valueCols.map(col): _*)).as("__m"))
      .select(col(keyCol) +: (col(s"__m.$opCol").as("__op") +:
        valueCols.map(c => col(s"__m.`$c`").as(s"__new_$c"))): _*)
    base.join(latest, Seq(keyCol), "full_outer")
      .where(col("__op").isNull || col("__op") =!= "D")
      .select(col(keyCol) +: valueCols.map(c =>
        when(col("__op").isNotNull, col(s"`__new_$c`"))
          .otherwise(col(s"`$c`")).as(c)): _*)
  }
}
