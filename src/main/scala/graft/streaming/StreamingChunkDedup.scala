package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.ContentChunk

/** Streaming SUB-document dedup — first-seen state on content-defined
  * chunk keys, the incremental-ingest metric a recrawl pipeline runs
  * on: "how many genuinely NEW bytes did this batch contribute?"
  * Whole-document streaming dedup ([[StreamingDedup]]) misses a page
  * that changed one paragraph; chunk-level state credits only the
  * changed chunk as novel, because CDC boundaries re-anchor around
  * edits ([[graft.ops.ContentChunk]]).
  *
  * Shape: the map-only chunker runs unchanged inside the micro-batch
  * (batch/streaming symmetry, the q360 discipline), then
  * `flatMapGroupsWithState` keyed by (chunk_hash, length) holds one
  * Boolean per distinct chunk content. EVERY occurrence row is
  * emitted (so per-document totals stay computable downstream);
  * `novel` is true on exactly the global first occurrence —
  * within-batch ties resolved deterministically by (doc id,
  * chunk_idx) order, found with a single O(n) min-scan (determinism
  * needs only the minimum, never a sort). Two state disciplines:
  *
  *  - [[novelChunks]]: NoTimeout — state is one Boolean per distinct
  *    chunk content FOREVER; exact over any replay, the
  *    fixture-gate / bounded-corpus form (q390's protocol).
  *  - [[novelChunksEventTime]]: the production recrawl form — state
  *    expires `ttlMs` past the chunk's last event time once the
  *    watermark passes it (the q346 / dedupByFingerprintEventTime
  *    discipline), so state is bounded by the distinct chunks of the
  *    TTL horizon, not of all history. A chunk recurring after its
  *    state expired reads as novel again — the honest semantics of a
  *    windowed dedup, gated with a planted expiry.
  */
object StreamingChunkDedup {

  final case class ChunkSeen(doc_id: Long, chunk_idx: Int,
      length: Long, novel: Boolean)

  /** O(n) deterministic-first marking: every occurrence row emits;
    * `novel` on the (id, chunk_idx)-minimal row iff the chunk content
    * was never seen before this batch. */
  private def emitAll(rows: Iterator[ContentChunk.Chunk],
      seenBefore: Boolean): Iterator[ChunkSeen] = {
    val buf = scala.collection.mutable.ArrayBuffer[ContentChunk.Chunk]()
    var minIdx = -1
    var i = 0
    rows.foreach { c =>
      buf += c
      if (minIdx < 0 || c.id < buf(minIdx).id ||
        (c.id == buf(minIdx).id && c.chunk_idx < buf(minIdx).chunk_idx))
        minIdx = i
      i += 1
    }
    val first = minIdx
    buf.iterator.zipWithIndex.map { case (c, k) =>
      ChunkSeen(c.id, c.chunk_idx, c.length,
        novel = !seenBefore && k == first)
    }
  }

  def novelChunks(df: DataFrame, idCol: String, textCol: String,
      minSize: Int, avgBits: Int, maxSize: Int): Dataset[ChunkSeen] = {
    val spark = df.sparkSession
    import spark.implicits._
    ContentChunk.chunkText(df, idCol, textCol, minSize, avgBits, maxSize)
      .groupByKey(c => (c.chunk_hash, c.length))
      .flatMapGroupsWithState[Boolean, ChunkSeen](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[Boolean]) =>
          val seenBefore = state.getOption.getOrElse(false)
          state.update(true)
          emitAll(rows, seenBefore)
      }
  }

  /** Event-time-TTL form: rows carry an event timestamp (`tsCol`,
    * castable to timestamp); the watermark declared here (after the
    * cast — a later cast would strip the event-time tag) drives state
    * expiry. Chunking still runs map-only inside the micro-batch; the
    * chunk key's state stores the occurrence count and re-arms its
    * timeout at max(event time) + ttlMs on every batch (clamped at or
    * after the current watermark, or a late row would schedule an
    * already-expired timeout). */
  def novelChunksEventTime(df: DataFrame, idCol: String,
      textCol: String, tsCol: String, ttlMs: Long,
      minSize: Int, avgBits: Int, maxSize: Int,
      watermarkDelay: String = "0 seconds"): Dataset[ChunkSeen] = {
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
    val spark = df.sparkSession
    import spark.implicits._
    // chunk WITHIN the row first (a typed flatMap mints new output
    // attributes, so an upstream watermark tag would not survive it),
    // THEN declare the watermark on the carried event-time column —
    // the tag must sit directly under the stateful operator
    val chunked = df
      .select(col(idCol).cast("long").as("__id"),
        col(textCol).cast("string").as("__text"),
        col(tsCol).cast("timestamp").as("__ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .flatMap { case (id, text, ts) =>
        val bytes = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ContentChunk.chunksOf(bytes, minSize, avgBits, maxSize)
          .zipWithIndex.map { case ((off, len, hash), idx) =>
            (id, idx, off, len, hash, ts)
          }
      }
      .toDF("id", "chunk_idx", "offset", "length", "chunk_hash", "__ts")
      .withWatermark("__ts", watermarkDelay)
      .as[(Long, Int, Long, Long, Long, java.sql.Timestamp)]
    chunked
      .groupByKey(c => (c._5, c._4))
      .flatMapGroupsWithState[Long, ChunkSeen](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val seenBefore = state.getOption.getOrElse(0L) > 0L
            val buf = rows.toArray
            state.update(state.getOption.getOrElse(0L) + buf.length)
            val maxTs = buf.iterator.map(_._6.getTime).max
            state.setTimeoutTimestamp(
              math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            emitAll(buf.iterator.map(r =>
              ContentChunk.Chunk(r._1, r._2, r._3, r._4, r._5)),
              seenBefore)
          }
      }
  }
}
