package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming crawl-trap screen — the ONLINE form of
  * [[graft.ops.CrawlHealth]]'s URL-minting verdict
  * ([[graft.ops.Dust.trapHosts]]): as (host, url, content-hash)
  * observations stream in, each host's distinct-URL and
  * distinct-content counts are tracked and the trap flag
  * (urls ≫ contents) updates per micro-batch — so the frontier stops
  * believing a calendar widget DURING the crawl, not at the next
  * batch audit.
  *
  * Exact distinct state is unbounded (it is the trap's own URL
  * universe!), so state per host is a pair of KMV bottom-k sketches
  * ([[graft.ops.KmvSketch]]'s discipline: Bar-Yossef et al. 2002;
  * 2·k longs per host, bounded by the host dimension × k). KMV is a
  * function of the distinct SET — arrival order and batch boundaries
  * cannot change it — so the streamed sketch equals the batch sketch
  * over the same observations, and the q424 gate replays the final
  * rows against a DuckDB KMV computation (the q376 md5-60-bit hash
  * convention, exact below k, (k−1)·2⁶⁰/kth at k). Ratio-of-estimates
  * is the screen's verdict: at the trap thresholds (10×) the KMV
  * relative error (~1/√(k−1), ~13% at k=64) cannot flip a verdict
  * designed with an order-of-magnitude margin; hosts near the
  * boundary belong to the exact batch audit anyway.
  *
  * One emitted row per host per batch (`seq`-stamped); the LAST row
  * per host is the current screen table. */
object StreamingTrapScreen {

  final case class TrapRow(host: String, seq: Long, estUrls: Double,
      estHashes: Double, ratio: Double, flagged: Boolean)

  final case class St(seq: Long, urls: Array[Long],
      hashes: Array[Long])

  private val Two60 = math.pow(2, 60)

  private def merge(cur: Array[Long], add: Seq[Long],
      k: Int): Array[Long] = {
    val s = (cur.toSeq ++ add).distinct.sorted
    s.take(k).toArray
  }

  private def est(kmv: Array[Long], k: Int): Double = {
    val e = if (kmv.length < k) kmv.length.toDouble
      else (k - 1).toDouble * Two60 / kmv.last.toDouble
    BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** `events`: streaming (host, url, contentHash) observations.
    * Thresholds mirror [[graft.ops.Dust.trapHosts]]: flagged when
    * estUrls ≥ minUrls ∧ estUrls/estHashes ≥ maxRatio. */
  def screen(events: DataFrame, hostCol: String, urlCol: String,
      hashCol: String, k: Int, minUrls: Double,
      maxRatio: Double): Dataset[TrapRow] = {
    require(k >= 2 && k <= 4096, s"k must be in [2, 4096]: $k")
    require(minUrls >= 1, s"minUrls must be >= 1: $minUrls")
    require(maxRatio > 0, s"maxRatio must be > 0: $maxRatio")
    val spark = events.sparkSession
    import spark.implicits._
    def h60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10)
        .cast("long")
    val keyed = events
      .select(col(hostCol).cast("string").as("host"),
        h60(col(urlCol)).as("hu"), h60(col(hashCol)).as("hh"))
      .where(col("host").isNotNull && col("hu").isNotNull &&
        col("hh").isNotNull)
      .as[(String, Long, Long)]
      .groupByKey(_._1)
    keyed.flatMapGroupsWithState[St, TrapRow](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      case (host, rows, state: GroupState[St]) =>
        val st = state.getOption.getOrElse(
          St(0L, Array.empty[Long], Array.empty[Long]))
        val batch = rows.toSeq
        val urls = merge(st.urls, batch.map(_._2), k)
        val hashes = merge(st.hashes, batch.map(_._3), k)
        val next = St(st.seq + 1, urls, hashes)
        state.update(next)
        val eu = est(urls, k)
        val eh = est(hashes, k)
        val ratio = BigDecimal(eu / eh)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Iterator.single(TrapRow(host, next.seq, eu, eh, ratio,
          eu >= minUrls && ratio >= maxRatio))
    }
  }
}
