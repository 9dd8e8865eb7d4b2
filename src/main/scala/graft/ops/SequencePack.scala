package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence PACKING for LLM training — the step between a curated
  * corpus and a token-budgeted batch: fixed context windows must be
  * filled from variable-length documents. Two standard disciplines,
  * both deterministic (a training run must be reproducible from the
  * corpus + config alone):
  *
  *  - [[packConcat]]: GPT-style concat-and-chunk — documents
  *    concatenate in (group, id) order with a separator (EOS) after
  *    each, and the stream slices into `budget`-token windows;
  *    documents STRADDLE window boundaries. Closed-form from a
  *    running sum, so the q382 gate has an exact SQL oracle at
  *    corpus scale.
  *  - [[packNextFit]]: whole-document NEXT-FIT bin packing — no
  *    straddling (instruction-tuning / packing-with-masking shape);
  *    a document that does not fit opens the next pack. Inherently
  *    sequential PER GROUP, so groups are the parallelism unit
  *    (shards); gated by q383 against an independent python twin.
  *
  * Reference behavior target: chanedwin/pandas-profiling-personal has
  * no packing operator — beyond-reference LLM-pipeline surface
  * (SURVEY §2.4), like [[ByteBpe]] which produces the `n_tokens`
  * these consume. */
object SequencePack {

  /** Concat-and-chunk offsets per document:
    * (group, id, n_tokens, start_off, first_chunk, last_chunk) where
    * start_off = Σ previous (n_tokens + sepTokens) within the group
    * in id order, first/last_chunk = the window indices the document
    * touches (an empty document sits AT its offset's window).
    *
    * Scale shape: one hash shuffle on the group + a per-group sorted
    * window — groups are shards, so partitions stay bounded; all
    * arithmetic is exact integer (token offsets at 100 TB overflow a
    * double's 2^53 only past ~9e15 tokens, but `div` keeps it exact
    * regardless). */
  def packConcat(df: DataFrame, idCol: String, groupCol: String,
      tokensCol: String, budget: Long, sepTokens: Long = 0L): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    require(sepTokens >= 0, s"sepTokens must be >= 0, got $sepTokens")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(groupCol), col(idCol),
        col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("start_off",
        coalesce(sum(col("n_tokens") + lit(sepTokens)).over(w), lit(0L))
          .cast("long"))
      .withColumn("first_chunk", expr(s"start_off div $budget"))
      .withColumn("last_chunk",
        when(col("n_tokens") > 0,
          expr(s"(start_off + n_tokens - 1) div $budget"))
          .otherwise(expr(s"start_off div $budget")))
  }

  /** NEXT-FIT whole-document packing:
    * (group, id, n_tokens, pack_id, oversize). Documents visit in
    * (group, id) order; a document that would push the current pack
    * past `budget` opens the next pack (pack ids number from 0 per
    * group; an EXACT fit stays — the boundary is `>`). A document
    * larger than the budget becomes a singleton pack flagged
    * `oversize = true` (the caller decides truncate-vs-drop); the
    * document after it always opens a fresh pack. Negative token
    * counts clamp to 0; zero-token documents join the current pack —
    * including a pack an oversize document is about to land in (a
    * zero-token doc leaves the fill at 0), so "singleton" means
    * no non-zero companions, never two oversize docs together
    * (SequencePackSpec pins both laws).
    *
    * Scale shape: one hash shuffle (repartition by group) + a
    * partition-local sort, then a single sequential pass that
    * restarts state at group boundaries — many groups per partition
    * are fine; one group never spans partitions. Packing is
    * inherently sequential within a group, so the group IS the
    * parallelism knob (use training shards, not the whole corpus). */
  def packNextFit(df: DataFrame, idCol: String, groupCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"),
        col(tokensCol).cast("long").as("n"))
      .repartition(col("g"))
      .sortWithinPartitions("g", "id")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var curGroup: String = null
        var packId = 0L
        var fill = 0L
        it.map { case (g, id, n) =>
          if (g != curGroup) { curGroup = g; packId = 0L; fill = 0L }
          val n0 = math.max(n, 0L)
          if (fill > 0 && fill + n0 > budget) { packId += 1; fill = 0L }
          fill += n0
          (g, id, n0, packId, n0 > budget)
        }
      }
      .toDF(groupCol, idCol, "n_tokens", "pack_id", "oversize")
  }
}
