package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTTP conditional-fetch accounting — what a recrawl actually costs.
  *
  * A polite recrawler never blind-refetches: when the stored copy
  * carries a validator (an `ETag` or `Last-Modified`, RFC 9110 §8.8),
  * the request goes out conditional (`If-None-Match` /
  * `If-Modified-Since`, §13.1) and an unchanged page answers
  * `304 Not Modified` — headers only, no body bytes. [[ledger]]
  * reconciles the previous crawl state against a fresh fetch log and
  * rolls up, per host, where the bandwidth went:
  *
  *   - `n_revalidated`     unchanged + validator held → the 304 path;
  *                         body bytes SAVED
  *   - `n_unchanged_refetch` unchanged but NO validator → full 200
  *                         for identical bytes; body bytes WASTED
  *                         (the number that justifies storing
  *                         validators at all)
  *   - `n_modified`        content changed → a 200 we had to pay for
  *   - `n_new`             first sighting (not in the previous state)
  *   - `n_gone`            in the previous state, absent from this
  *                         fetch round
  *
  * plus `bytes_saved` / `bytes_wasted` / `bytes_paid` (modified + new
  * transfers). The per-class byte columns use the CURRENT body size —
  * that is what the wire carries (or doesn't) this round.
  *
  * This composes with the rest of the scheduler shelf:
  * [[CrawlSchedule.changeRate]] decides WHEN to refetch, [[ledger]]
  * measures what the refetch cost, and hosts with high
  * `n_unchanged_refetch` are where validator storage buys the most.
  *
  * Scale (100 TB): ONE full-outer equi-join on the URL string (both
  * sides hash-partition on the key — previous state and fetch log
  * both scale with the corpus, so no broadcast), classification is a
  * map-only CASE over the joined row, then one partially-aggregated
  * groupBy(host). Nothing is collected; the output is host-dimensioned.
  * Gate: q412 (planted validator/na, modified, new, gone classes).
  */
object Revalidation {

  /** `prev`: (url, hash, validator) — validator null when the stored
    * copy has no ETag / Last-Modified. `cur`: (url, hash, bytes) —
    * this round's fetch log with body sizes. Both (url → hash) maps
    * must be functional; duplicate URLs within one side are rejected
    * loudly (a fetch log with two bodies for one URL in one round is
    * a logging bug, not a tie to break silently). */
  def ledger(prev: DataFrame, prevUrlCol: String, prevHashCol: String,
      validatorCol: String,
      cur: DataFrame, curUrlCol: String, curHashCol: String,
      bytesCol: String): DataFrame = {
    val p = prev
      .select(col(prevUrlCol).cast("string").as("__purl"),
        col(prevHashCol).cast("string").as("__phash"),
        col(validatorCol).cast("string").as("__validator"))
      .where(col("__purl").isNotNull && col("__phash").isNotNull)
    val c = cur
      .select(col(curUrlCol).cast("string").as("__curl"),
        col(curHashCol).cast("string").as("__chash"),
        col(bytesCol).cast("long").as("__bytes"))
      .where(col("__curl").isNotNull && col("__chash").isNotNull)
    for ((side, keyed) <- Seq("prev" -> p.groupBy("__purl"),
        "cur" -> c.groupBy("__curl"))) {
      val dup = keyed.count().where(col("count") > 1)
      require(dup.isEmpty,
        s"$side side must be functional (one row per URL) — " +
          "version multi-fetch logs before reconciling")
    }

    val joined = p.join(c, p("__purl") === c("__curl"), "full_outer")
      .withColumn("__url", coalesce(col("__purl"), col("__curl")))
      .withColumn("host",
        regexp_extract(col("__url"),
          "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
      .withColumn("__class",
        when(col("__purl").isNull, "new")
          .when(col("__curl").isNull, "gone")
          .when(col("__phash") === col("__chash") &&
            col("__validator").isNotNull, "revalidated")
          .when(col("__phash") === col("__chash"), "unchanged_refetch")
          .otherwise("modified"))

    joined.groupBy("host")
      .agg(
        sum(when(col("__class") === "revalidated", 1L).otherwise(0L))
          .as("n_revalidated"),
        sum(when(col("__class") === "unchanged_refetch", 1L)
          .otherwise(0L)).as("n_unchanged_refetch"),
        sum(when(col("__class") === "modified", 1L).otherwise(0L))
          .as("n_modified"),
        sum(when(col("__class") === "new", 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("__class") === "gone", 1L).otherwise(0L))
          .as("n_gone"),
        sum(when(col("__class") === "revalidated", col("__bytes"))
          .otherwise(0L)).as("bytes_saved"),
        sum(when(col("__class") === "unchanged_refetch", col("__bytes"))
          .otherwise(0L)).as("bytes_wasted"),
        sum(when(col("__class").isin("modified", "new"), col("__bytes"))
          .otherwise(0L)).as("bytes_paid"))
  }
}
