package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming conditional-fetch dispositions — the ONLINE half of
  * [[graft.ops.Revalidation]]: as fetch results arrive, each event is
  * reconciled against the STORED crawl state (url → hash, validator)
  * and classified on the spot, so the ingest pipeline can route 304
  * candidates away from the extractor immediately instead of waiting
  * for the batch ledger.
  *
  * Classes per event (RFC 9110 §13.1): `revalidated` (unchanged and a
  * validator was held — the 304 path, zero body bytes on the wire),
  * `unchanged_refetch` (unchanged, no validator — a full 200 paid for
  * identical bytes), `modified`, `new`. `gone` does NOT exist online:
  * the absence of an event is not an event, so tombstoning stays a
  * batch reconciliation product ([[graft.ops.Revalidation.ledger]]).
  *
  * Shape: STATELESS — one stream–static left join per micro-batch
  * against the url-keyed state table plus a map-only CASE; no
  * flatMapGroupsWithState, no watermark, nothing to expire. The
  * static side is corpus-dimensioned (one row per known URL), so it
  * is NOT broadcast (the [[StreamingRobots]] host-dimension argument
  * does not apply here): Spark shuffles each micro-batch against the
  * static side's partitioning, which is the right plan at 100 TB —
  * pre-bucket the state table on url to make the per-batch join
  * exchange-light. Output carries `bytes_on_wire` (0 on the 304
  * path) so a downstream windowed sum gives live bandwidth accounting.
  */
object StreamingRevalidation {

  /** `events`: streaming (url, hash, bytes) fetch results. `prev`:
    * static (url, hash, validator) stored state; validator null =
    * no ETag / Last-Modified held. Emits one disposition row per
    * event in Append mode. Null-url/hash events drop (never throw —
    * the hostile-probe discipline); null validators are data. */
  def dispositions(events: DataFrame, urlCol: String, hashCol: String,
      bytesCol: String, prev: DataFrame, purlCol: String,
      phashCol: String, validatorCol: String): DataFrame = {
    val p = prev
      .select(col(purlCol).cast("string").as("__purl"),
        col(phashCol).cast("string").as("__phash"),
        col(validatorCol).cast("string").as("__v"))
      .where(col("__purl").isNotNull && col("__phash").isNotNull)
    events
      .select(col(urlCol).cast("string").as("url"),
        col(hashCol).cast("string").as("hash"),
        col(bytesCol).cast("long").as("bytes"))
      .where(col("url").isNotNull && col("hash").isNotNull)
      .join(p, col("url") === col("__purl"), "left")
      .withColumn("disposition",
        when(col("__purl").isNull, "new")
          .when(col("hash") === col("__phash") &&
            col("__v").isNotNull, "revalidated")
          .when(col("hash") === col("__phash"), "unchanged_refetch")
          .otherwise("modified"))
      .withColumn("bytes_on_wire",
        when(col("disposition") === "revalidated", 0L)
          .otherwise(coalesce(col("bytes"), lit(0L))))
      .select(col("url"), col("disposition"), col("bytes"),
        col("bytes_on_wire"))
  }
}
