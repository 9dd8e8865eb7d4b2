package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
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
  * chunk_idx) order. State size is bounded by distinct chunk contents
  * seen; at 100 TB that wants the same event-time TTL discipline as
  * [[StreamingDedup.dedupByFingerprintEventTime]] (state here is
  * NoTimeout for replay determinism — the q390 gate's protocol). */
object StreamingChunkDedup {

  final case class ChunkSeen(doc_id: Long, chunk_idx: Int,
      length: Long, novel: Boolean)

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
          val batch = rows.toSeq.sortBy(c => (c.id, c.chunk_idx))
          state.update(true)
          batch.iterator.zipWithIndex.map { case (c, i) =>
            ChunkSeen(c.id, c.chunk_idx, c.length,
              novel = !seenBefore && i == 0)
          }
      }
  }
}
