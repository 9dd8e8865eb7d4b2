package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — Misra-Gries frequent-item summaries over an
  * unbounded key stream with HARD-BOUNDED state, the primitive behind
  * "which domains / templates / users dominate the firehose right now"
  * when the key domain is too large to count exactly.
  *
  * The key space is hash-partitioned into `buckets` groups; each group
  * maintains ONE Misra-Gries summary of `capacity` counters (classic
  * decrement-on-overflow), so total state is buckets × capacity
  * counters NO MATTER how many distinct keys flow past — the property
  * that makes the operator safe at 100 TB/day. Each key hashes to
  * exactly one bucket, so the union of bucket summaries is a global
  * candidate set: any key with true count > n_bucket/(capacity+1) is
  * guaranteed present (the MG deterministic guarantee), and each
  * reported estimate undercounts by at most that same bound (returned
  * per row as `max_undercount`).
  *
  * Parallelism scales with `buckets` (one state row per bucket,
  * shuffle-partitioned like any keyed state), not with the key
  * cardinality.
  */
object StreamingHeavyHitters {

  final case class HeavyHitter(
      bucket: Int, key: String, est: Long, max_undercount: Long)

  private[streaming] final case class MgState(
      counters: Map[String, Long], decrements: Long, processed: Long)

  /** Fold a batch of keys into a Misra-Gries summary. Pure and
    * deterministic given the (bucket-local) arrival order. */
  private[streaming] def mgFold(
      st: MgState, keys: Iterator[String], capacity: Int): MgState = {
    var counters = st.counters
    var dec = st.decrements
    var n = st.processed
    keys.foreach { k =>
      n += 1
      counters.get(k) match {
        case Some(c) => counters = counters.updated(k, c + 1)
        case None if counters.size < capacity =>
          counters = counters.updated(k, 1L)
        case None =>
          // overflow: decrement every counter, drop zeros (the arriving
          // key is absorbed by the shared decrement)
          dec += 1
          counters = counters.collect {
            case (kk, c) if c > 1 => kk -> (c - 1)
          }
      }
    }
    MgState(counters, dec, n)
  }

  /** Per-trigger heavy-hitter snapshots: every processed micro-batch
    * re-emits each updated bucket's full candidate table (Update-mode
    * semantics — downstream keeps the latest (bucket, key) row). `est`
    * is the MG counter; true count ∈ [est, est + max_undercount].
    *
    * State per bucket is one MG summary of `capacity` counters; no
    * timeout (the summary IS the bounded representation — expiry would
    * discard exactly the long-run tallies the operator exists for). */
  def heavyHitters(
      df: DataFrame, keyCol: String,
      capacity: Int = 64, buckets: Int = 32): Dataset[HeavyHitter] = {
    require(capacity >= 1, "capacity must be >= 1")
    require(buckets >= 1, "buckets must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .select(col(keyCol).cast("string").as("k"))
      .where(col("k").isNotNull)
      .select(pmod(xxhash64(col("k")), lit(buckets.toLong))
        .cast("int").as("b"), col("k"))
      .as[(Int, String)]
      .groupByKey(_._1)
    keyed.flatMapGroupsWithState[MgState, HeavyHitter](
      OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
      case (bucket, rows, state: GroupState[MgState]) =>
        val st0 = state.getOption.getOrElse(MgState(Map.empty, 0L, 0L))
        val st = mgFold(st0, rows.map(_._2), capacity)
        state.update(st)
        // deterministic output order: est desc, key asc
        st.counters.toSeq.sortBy { case (k, c) => (-c, k) }.iterator
          .map { case (k, c) => HeavyHitter(bucket, k, c, st.decrements) }
    }
  }
}
