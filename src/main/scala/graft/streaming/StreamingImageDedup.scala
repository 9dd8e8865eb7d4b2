package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.ops.MediaCodec

/** Streaming first-seen image dedup by perceptual hash — the streaming
  * half of the batch q340–q342 pipeline (reference image stats:
  * `summary_helpers_image.py`; the batch near-dup path is
  * [[graft.ops.Multimodal.dhashNearDupPairs]]).
  *
  * The per-image step (decode → luma → 9×8 resize → 64-bit dHash) is
  * MAP-ONLY, so it composes with Structured Streaming unchanged: the
  * same [[MediaCodec.decodeImageGray]] seam the batch path uses runs
  * inside the streaming micro-batch, and only the tiny (id, hash) pair
  * reaches state. State is keyed by the full 64-bit hash and carries
  * ONE long (the canonical first-seen id) — bounded by distinct
  * perceptual hashes, not corpus size, and orders of magnitude smaller
  * than the blobs. A BMP and a PNG (or a high-quality JPEG re-encode,
  * q344) of the same pixels share a dHash, so the dedup is
  * cross-format by construction.
  *
  * Undecodable blobs are dropped (same contract as the batch path): a
  * fingerprint of garbage would collapse all hostile inputs into one
  * giant "duplicate" family.
  */
object StreamingImageDedup {

  /** One streamed image verdict: `keep` is true only for the FIRST
    * arrival of a hash (ties within a micro-batch broken by smallest
    * id); `canonical_id` names the kept copy every duplicate points
    * at. A re-arrival of the canonical id itself reads keep=false —
    * at-least-once upstreams re-deliver, and the first delivery
    * already won. */
  final case class ImageSeen(
      id: Long, dhash: Long, keep: Boolean, canonical_id: Long)

  /** Unbounded-state variant: every hash ever seen stays canonical
    * forever. Right for bounded reprocessing windows; for continuous
    * ingestion use [[firstSeenByDHashEventTime]] and accept the TTL
    * trade. */
  def firstSeenByDHash(df: DataFrame, idCol: String,
      binCol: String): Dataset[ImageSeen] = {
    val spark = df.sparkSession
    import spark.implicits._
    hashedStream(df, idCol, binCol)
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, ImageSeen](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (h, rows, state) =>
          val ids = rows.map(_._1).toSeq.sorted
          state.getOption match {
            case Some(canon) =>
              ids.iterator.map(ImageSeen(_, h, keep = false, canon))
            case None =>
              val canon = ids.head
              state.update(canon)
              Iterator(ImageSeen(canon, h, keep = true, canon)) ++
                ids.tail.iterator.map(ImageSeen(_, h, keep = false, canon))
          }
      }
  }

  /** TTL variant: a hash's canonical claim expires `ttlMs` after the
    * hash's latest event time, certified by the watermark on `tsCol`
    * (the [[StreamingNearDup.lshCandidatePairsEventTime]] retention
    * contract — deterministic and replayable, no wall clock). After
    * expiry a re-arrival is a fresh first-seen: total state is bounded
    * by hashes-active-within-TTL instead of O(all hashes ever), at the
    * cost of re-admitting duplicates farther apart in event time than
    * the TTL — the standard trade for continuous image ingestion. */
  def firstSeenByDHashEventTime(df: DataFrame, idCol: String,
      binCol: String, tsCol: String, ttlMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[ImageSeen] = {
    require(ttlMs > 0, "ttlMs must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // watermark AFTER the decode stage: an object-level mapPartitions
    // re-serializes its output, which strips an upstream event-time
    // tag (UnsupportedOperationChecker rejects the plan). The decode
    // is deterministic per row, so tagging the post-decode timestamp
    // column is equivalent — and the watermark then sits directly on
    // the column the state timeout certifies.
    val hashed = df
      .select(col(idCol).cast("long"), col(binCol).cast("binary"),
        col(tsCol).cast("timestamp"))
      .as[(Long, Array[Byte], java.sql.Timestamp)]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes, ts) =>
          MediaCodec.decodeImageGray(Option(bytes).getOrElse(Array.empty))
            .map(g => (id, MediaCodec.dHash64(g), ts))
        }
      }
      .toDF("id", "h", "__ts")
      .withWatermark("__ts", watermarkDelay)
      .as[(Long, Long, java.sql.Timestamp)]
    // state carries (canonical id, maxSeenEventTimeMs): the timeout
    // anchors to the hash's RUNNING max event time so a late-but-
    // within-watermark batch cannot shorten the TTL (same anchoring
    // note as lshCandidatePairsEventTime).
    hashed.groupByKey(_._2)
      .flatMapGroupsWithState[(Long, Long), ImageSeen](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (h, rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val ids = batch.map(_._1).sorted
            val maxTs = batch.map(_._3.getTime).max
            val out = state.getOption match {
              case Some((canon, prevTs)) =>
                state.update((canon, math.max(prevTs, maxTs)))
                ids.iterator.map(ImageSeen(_, h, keep = false, canon))
              case None =>
                val canon = ids.head
                state.update((canon, maxTs))
                Iterator(ImageSeen(canon, h, keep = true, canon)) ++
                  ids.tail.iterator
                    .map(ImageSeen(_, h, keep = false, canon))
            }
            state.setTimeoutTimestamp(math.max(
              state.get._2 + ttlMs, state.getCurrentWatermarkMs() + 1))
            out
          }
      }
  }

  /** The map-only (id, dhash) stage both variants share. */
  private def hashedStream(df: DataFrame, idCol: String,
      binCol: String): Dataset[(Long, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          MediaCodec.decodeImageGray(Option(bytes).getOrElse(Array.empty))
            .map(g => (id, MediaCodec.dHash64(g)))
        }
      }
  }
}
