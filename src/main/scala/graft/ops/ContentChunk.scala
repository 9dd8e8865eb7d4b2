package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — gear-hash rolling boundaries in
  * the FastCDC family (Xia et al., "FastCDC: a Fast and Efficient
  * Content-Defined Chunking Approach for Data Deduplication", USENIX
  * ATC'16; gear hashing from Xia et al., DDelta 2014). The
  * SUB-document dedup primitive: byte-identical spans shared between
  * documents (quoted paragraphs, license boilerplate, pasted code)
  * chunk to identical (hash, length) pairs wherever they sit, because
  * boundaries depend only on local CONTENT — an insertion re-anchors
  * within one chunk instead of shifting every fixed-width block
  * (the failure mode of offset-based chunking).
  *
  * Algorithm (deterministic, documented — the q384 twin implements
  * the same spec in python with no shared code):
  *  - GEAR table: 256 u64 constants from splitmix64 (Vigna's public
  *    mix function) seeded 0..255 — reproducible everywhere;
  *  - rolling hash h = (h << 1) + GEAR(byte), 64-bit wraparound;
  *  - cut AFTER byte i when the chunk has >= minSize bytes and
  *    (h & mask) == 0 (mask = 2^avgBits − 1, expected chunk size
  *    ~2^avgBits past the minimum), or unconditionally at maxSize;
  *  - h resets to 0 at every cut (chunk hashes must not depend on
  *    prior chunks, or shared spans would not collide);
  *  - the tail ships as a final chunk even when shorter than minSize;
  *  - chunk identity = FNV-1a 64 over the chunk's bytes (portable:
  *    exact in any 64-bit integer arithmetic), emitted as the signed
  *    two's-complement long.
  *
  * Scale shape: chunking is document-local map-only work (one pass
  * over the bytes, zero shuffle); the dedup statistics downstream are
  * one hash aggregate on the chunk hash — the exact-dedup shape. */
object ContentChunk {

  /** splitmix64(i) for i = 0..255 — the published constants. */
  private[ops] val Gear: Array[Long] = {
    def splitmix64(seed: Long): Long = {
      var z = seed + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    Array.tabulate(256)(i => splitmix64(i.toLong))
  }

  private[ops] def fnv1a64(bytes: Array[Byte], off: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = off
    val end = off + len
    while (i < end) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Chunk one byte array: (offset, length, fnv1a64) per chunk. */
  private[ops] def chunks(bytes: Array[Byte], minSize: Int,
      avgBits: Int, maxSize: Int): Seq[(Long, Long, Long)] = {
    val mask = (1L << avgBits) - 1
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + Gear(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= minSize && (h & mask) == 0L) || len >= maxSize) {
        out += ((start.toLong, len.toLong, fnv1a64(bytes, start, len)))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < bytes.length) {
      val len = bytes.length - start
      out += ((start.toLong, len.toLong, fnv1a64(bytes, start, len)))
    }
    out.toSeq
  }

  final case class Chunk(id: Long, chunk_idx: Int, offset: Long,
      length: Long, chunk_hash: Long)

  /** Public per-buffer chunk boundaries (offset, length, fnv1a64) —
    * the same scan [[chunkText]] runs, exposed for callers that must
    * chunk inside their own map (e.g. the streaming TTL form, which
    * keeps an event-time column alongside each chunk row). */
  def chunksOf(bytes: Array[Byte], minSize: Int, avgBits: Int,
      maxSize: Int): Seq[(Long, Long, Long)] = {
    require(minSize >= 1 && maxSize >= minSize,
      s"need 1 <= minSize <= maxSize, got $minSize/$maxSize")
    require(avgBits >= 1 && avgBits <= 48, s"avgBits out of range: $avgBits")
    chunks(bytes, minSize, avgBits, maxSize)
  }

  /** Chunk table over a STRING column's UTF-8 bytes (null/empty text
    * yields zero rows). minSize/avgBits/maxSize are the FastCDC knobs:
    * expected chunk ≈ minSize + 2^avgBits, hard cap maxSize. */
  def chunkText(df: DataFrame, idCol: String, textCol: String,
      minSize: Int, avgBits: Int, maxSize: Int): Dataset[Chunk] = {
    require(minSize >= 1 && maxSize >= minSize,
      s"need 1 <= minSize <= maxSize, got $minSize/$maxSize")
    require(avgBits >= 1 && avgBits <= 48, s"avgBits out of range: $avgBits")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val bytes = Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          chunks(bytes, minSize, avgBits, maxSize).zipWithIndex.map {
            case ((off, len, hash), idx) => Chunk(id, idx, off, len, hash)
          }
        }
      }
  }

  /** Corpus-level shared-chunk statistics: for every chunk content
    * seen more than once, how many documents and occurrences share it.
    * One map-side-combined aggregate on (hash, length) — collision
    * discipline: length rides with the hash, so a 64-bit collision
    * must also match lengths to merge. */
  def sharedChunks(chunkTable: Dataset[Chunk]): DataFrame =
    chunkTable.toDF()
      .groupBy("chunk_hash", "length")
      .agg(countDistinct(col("id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .where(col("n_occurrences") > 1)

  final case class Reclaimed(id: Long, n_chunks: Int, n_kept: Int,
      total_bytes: Long, kept_bytes: Long, kept_bin: Array[Byte])

  /** Sub-document dedup ACTION — the rewrite [[dupMass]] only
    * measures: every chunk CONTENT keeps exactly its globally-first
    * occurrence (minimal (doc id, chunk_idx) — the q390 winner rule)
    * and every other occurrence is dropped; each document is
    * reconstructed as the byte concatenation of its kept chunks in
    * document order. Output carries the kept BYTES (`kept_bin`) plus
    * the audit counters — bytes, not a decoded string, because CDC
    * boundaries are byte-level and may split a multibyte sequence;
    * the caller (or gate) hashes or decodes under its own policy.
    * Documents with zero chunks (null/empty text) emit zero counters
    * and empty bytes.
    *
    * Shape: the map-only chunk scan, ONE (hash, length) aggregate
    * electing winners (min(struct(id, idx)) — partial-aggregated, a
    * hot boilerplate chunk is one combiner row per partition), a
    * shuffle join back, then a per-doc sort_array(collect_list) +
    * byte-slice reconstruction; per-doc memory is O(#chunks of that
    * doc), bounded by len/minSize. */
  def reclaim(docs: DataFrame, idCol: String, textCol: String,
      minSize: Int, avgBits: Int, maxSize: Int): Dataset[Reclaimed] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val d = docs.select(col(idCol).cast("long").as("id"),
      col(textCol).cast("string").as("__text"))
    val ch = chunkText(d, "id", "__text", minSize, avgBits, maxSize)
      .toDF()
    val winners = ch.groupBy("chunk_hash", "length")
      .agg(min(struct(col("id"), col("chunk_idx"))).as("__w"))
    val flagged = ch.join(winners, Seq("chunk_hash", "length"))
      .withColumn("__keep",
        col("id") === col("__w.id") &&
          col("chunk_idx") === col("__w.chunk_idx"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("chunk_idx"),
        col("offset"), col("length"), col("__keep")))).as("__chunks"))
    d.join(flagged, Seq("id"), "left")
      .select(col("id"), col("__text"), col("__chunks"))
      .as[(Long, String, Seq[(Int, Long, Long, Boolean)])]
      .map { case (id, text, chunksOrNull) =>
        val chunks = Option(chunksOrNull).getOrElse(Seq.empty)
        val bytes = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val out = new java.io.ByteArrayOutputStream()
        var kept = 0
        var keptBytes = 0L
        chunks.foreach { case (_, off, len, keep) =>
          if (keep) {
            out.write(bytes, off.toInt, len.toInt)
            kept += 1
            keptBytes += len
          }
        }
        Reclaimed(id, chunks.size, kept, chunks.map(_._3).sum,
          keptBytes, out.toByteArray)
      }
  }

  /** Per-document DUPLICATION MASS — the curation signal that decides
    * what dedup action a document warrants: the fraction of its bytes
    * sitting in chunks that also appear in at least one OTHER
    * document (within-doc repetition is deliberately excluded — that
    * is the line/n-gram repetition family's domain; cross-doc shared
    * mass is what sub-document dedup can actually reclaim).
    *
    * Shape: one aggregate on (hash, length) for the distinct-doc
    * count, one shuffle join back, one aggregate by doc — all
    * partial-aggregated; the hottest boilerplate chunk is one
    * combiner row per partition, never a hot reduce key. Documents
    * with zero chunks (empty/null text) emit zeros. */
  def dupMass(docs: DataFrame, idCol: String,
      chunkTable: Dataset[Chunk]): DataFrame = {
    val ch = chunkTable.toDF()
    val spread = ch.groupBy("chunk_hash", "length")
      .agg(countDistinct(col("id")).as("__nd"))
    val perDoc = ch.join(spread, Seq("chunk_hash", "length"))
      .groupBy("id")
      .agg(sum(col("length")).as("__tot"),
        sum(when(col("__nd") > 1, col("length")).otherwise(lit(0L)))
          .as("__shared"))
    docs.select(col(idCol).cast("long").as("id")).distinct()
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("__tot"), lit(0L)).as("total_bytes"),
        coalesce(col("__shared"), lit(0L)).as("shared_bytes"),
        round(when(col("__tot") > 0,
          col("__shared").cast("double") / col("__tot").cast("double"))
          .otherwise(lit(0.0)), 6).as("dup_frac"))
  }
}
