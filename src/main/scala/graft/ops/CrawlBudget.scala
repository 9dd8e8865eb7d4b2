package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Authority-weighted per-host crawl budgets — the scheduler primitive
  * real crawlers run: the total fetch budget a crawl round can afford
  * is split across hosts IN PROPORTION TO AUTHORITY (the PageRank the
  * link graph assigned — [[GraphStats.pageRank]] / the q393 gate), and
  * within each host the frontier is admitted greedily in order until
  * the host's budget is spent (the q260 greedy-prefix discipline).
  * q401 gates the batch composition end-to-end (PageRank → quota split
  * → per-host prefix); q402 drives the same admission through the
  * streaming form ([[graft.streaming.StreamingBudget.admitByBudgets]],
  * state = one Long per host, bounded by the host dimension).
  *
  * Arithmetic is EXACT integer quota work (the q184/q393 discipline):
  * budget_h = totalBudget * rank_q div sum(rank_q) — reproducible in
  * any 64-bit integer engine, no float drift, floor rounding (the
  * unspent remainder of at most #hosts−1 units is the documented
  * truncation, visible as sum(budget_q) <= totalBudget).
  *
  * Scale shape: the ranks table is host-dimensioned (≪ the frontier);
  * the quota split is one single-row aggregate broadcast back over it
  * (no driver collect, no shuffle of the big side). Admission is one
  * window per host — the frontier shuffles ONCE on host, cum-sums
  * within partitions. */
object CrawlBudget {

  /** (host, budget_q): rank-proportional integer split of
    * `totalBudget` over the rank table. Null/negative ranks are
    * rejected loudly — a rank table is PageRank output, always
    * positive. */
  def rankBudgets(ranks: DataFrame, hostCol: String, rankCol: String,
      totalBudget: Long): DataFrame = {
    require(totalBudget >= 0, s"totalBudget must be >= 0: $totalBudget")
    val r = ranks.select(col(hostCol).cast("string").as("host"),
      col(rankCol).cast("long").as("__rq"))
    val tot = r.agg(sum(col("__rq")).as("__tot"))
    r.crossJoin(broadcast(tot))
      .select(col("host"),
        expr(s"${totalBudget}L * __rq div __tot").as("budget_q"))
  }

  /** Greedy per-host prefix admission under the budgets: frontier
    * rows ordered by `orderCol` within each host accumulate
    * `costCol`; a row is admitted while the running total stays
    * within the host's budget. Hosts absent from the budget table
    * admit nothing (not in the plan = no budget). Output: admitted
    * rows as (host, id, cost, cum_cost). */
  def admitByHostBudget(frontier: DataFrame, hostCol: String,
      orderCol: String, costCol: String, budgets: DataFrame,
      bHostCol: String, budgetCol: String): DataFrame = {
    val f = frontier.select(col(hostCol).cast("string").as("host"),
      col(orderCol).cast("long").as("id"),
      col(costCol).cast("long").as("cost"))
    val b = budgets.select(col(bHostCol).cast("string").as("host"),
      col(budgetCol).cast("long").as("__budget"))
    val w = Window.partitionBy("host").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    f.join(b, Seq("host")) // inner: no budget row -> nothing admitted
      .withColumn("cum_cost", sum(col("cost")).over(w))
      .where(col("cum_cost") <= col("__budget"))
      .select(col("host"), col("id"), col("cost"), col("cum_cost"))
  }
}
