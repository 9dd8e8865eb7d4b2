package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-source token-budget admission — the ONLINE form of
  * [[graft.ops.Sampling.budgetTrim]]'s greedy prefix contract (q260):
  * documents of each source are admitted in arrival order while the
  * source's RUNNING token total (admitted or not — tokens are
  * non-negative, so the admitted set is a prefix of the cumulative
  * sum) stays within the budget; once the total crosses it, the
  * source is closed. This is the rate-limiter shape of a continuous
  * ingest that must stop collecting a source the moment its mix
  * allocation is filled, without a batch re-plan.
  *
  * State is ONE Long per source (the running token total) with no
  * TTL — unlike LSH bucket universes, the source universe is the mix
  * plan's own dimension, bounded by design, so state is O(|sources|)
  * on any corpus size. Admission order: the within-batch iterator
  * order is not contractual, so each batch's slice of a source is
  * processed in ascending id (the per-key-per-batch buffer is the
  * standard flatMapGroups caveat); across batches the micro-batch
  * sequence IS the arrival order. A drive that feeds ascending-id
  * batches therefore admits in exact id order, which is what the gate
  * replays against the batch window oracle.
  */
object StreamingBudget {

  final case class Admit(
      source: String, docId: Long, tokens: Long, cumTokens: Long)

  /** PER-KEY budgets: the authority-weighted crawl form
    * ([[graft.ops.CrawlBudget]] — each host's fetch budget is its
    * PageRank quota share, q401; this is the same greedy prefix with
    * the budget RIDING THE ROWS via a stream–static join on the
    * host-dimensioned budget table, broadcast per micro-batch, q209's
    * stateless-join protocol). State stays one Long per key. A key
    * absent from the budget table admits nothing (inner join — not in
    * the plan = no budget), identical to the batch
    * [[graft.ops.CrawlBudget.admitByHostBudget]] contract. */
  def admitByBudgets(df: DataFrame, keyCol: String, idCol: String,
      costCol: String, budgets: DataFrame, bKeyCol: String,
      budgetCol: String): Dataset[Admit] = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = budgets.select(col(bKeyCol).cast("string").as("__bk"),
      col(budgetCol).cast("long").as("__budget"))
    val keyed = df
      .select(col(keyCol).cast("string").as("src"),
        col(idCol).cast("long").as("id"),
        col(costCol).cast("long").as("tk"))
      .join(broadcast(b), col("src") === col("__bk"))
      .select(col("src"), col("id"), col("tk"), col("__budget"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
    keyed.flatMapGroupsWithState[Long, Admit](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      case (src, rows, state: GroupState[Long]) =>
        var cum = state.getOption.getOrElse(0L)
        val admitted = rows.toSeq.sortBy(_._2).flatMap {
          case (_, id, tk, budget) =>
            cum += tk
            if (cum <= budget) Some(Admit(src, id, tk, cum)) else None
        }
        state.update(cum)
        admitted.iterator
    }
  }

  /** Admit stream rows (sourceCol, idCol, tokensCol) per-source until
    * `budget` tokens; emits admitted rows with their running total. */
  def admitByBudget(df: DataFrame, sourceCol: String, idCol: String,
      tokensCol: String, budget: Long): Dataset[Admit] = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .select(col(sourceCol).cast("string").as("src"),
        col(idCol).cast("long").as("id"),
        col(tokensCol).cast("long").as("tk"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
    keyed.flatMapGroupsWithState[Long, Admit](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      case (src, rows, state: GroupState[Long]) =>
        var cum = state.getOption.getOrElse(0L)
        val admitted = rows.toSeq.sortBy(_._2).flatMap {
          case (_, id, tk) =>
            cum += tk
            if (cum <= budget) Some(Admit(src, id, tk, cum)) else None
        }
        state.update(cum)
        admitted.iterator
    }
  }
}
