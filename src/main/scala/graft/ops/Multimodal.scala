package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling.
  *
  * Design: media is an opaque `binary` column plus a typed metadata
  * struct. The Spark-side plumbing — schema, partition-sized batching via
  * mapPartitions, deterministic output contract — is real and tested. The
  * actual codec calls are STUBBED (this container ships no image/audio
  * libraries): `decodeStub` derives deterministic fake metadata from the
  * bytes, and is the single seam to replace with javax.imageio /
  * a JNI codec on a real cluster.
  */
object Multimodal {

  /** Metadata contract for a decoded media blob. */
  final case class MediaMeta(
      id: Long,
      byteLength: Long,
      format: String,
      width: Int,
      height: Int,
      nFrames: Int,
      truncated: Boolean)

  /** STUB decoder — deterministic fake in place of a real codec.
    * Replace the body with e.g. ImageIO.read for production. */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val len = bytes.length.toLong
    // format sniff from leading bytes (the real magic-number approach,
    // fake table): deterministic on content
    val format =
      if (bytes.isEmpty) "empty"
      else if ((bytes(0) & 0xff) < 64) "fake/a"
      else if ((bytes(0) & 0xff) < 128) "fake/b"
      else "fake/c"
    // fake dimensions derived from content length — stands in for
    // parsed header fields
    val width = (len % 640 + 1).toInt
    val height = (len % 480 + 1).toInt
    MediaMeta(id, len, format, width, height,
      nFrames = (len / 256 + 1).toInt, truncated = len > 0 && len % 97 == 0)
  }

  /** Decode a binary column into metadata via mapPartitions — one codec
    * init per PARTITION (not per row), the batch shape a real decoder
    * needs. Output is a typed Dataset with a stable schema. */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (expensive handle)
        it.map { case (id, bytes) =>
          decodeStub(id, Option(bytes).getOrElse(Array.empty)) }
      }
  }

  /** Frame sampling: every `stride`-th 256-byte chunk as a "frame"
    * (stand-in for video keyframe extraction). Pure plumbing: explode to
    * (id, frame_idx, frame_bytes) preserving partition-local order. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      stride: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val b = Option(bytes).getOrElse(Array.empty)
        b.grouped(256).zipWithIndex
          .filter { case (_, i) => i % stride == 0 }
          .map { case (chunk, i) => (id, i, chunk) }
      }
      .toDF("id", "frame_idx", "frame_bytes")
  }

  /** File-level stats over a directory tree via Spark's binaryFile
    * source — the distributed answer to the reference's per-path
    * `os.stat` loop (summary_helpers.py:117-140): path, size,
    * modification time come from the datasource metadata WITHOUT reading
    * file contents (content column pruned away). */
  def fileStats(spark: SparkSession, pathGlob: String): DataFrame = {
    val files = spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("length"), col("modificationTime"))
    files.agg(
      count(lit(1)).as("n_files"),
      sum(col("length")).as("total_bytes"),
      min(col("length")).as("min_bytes"),
      max(col("length")).as("max_bytes"),
      (sum(col("length")).cast("double") / count(lit(1))).as("mean_bytes"),
      min(col("modificationTime")).as("oldest"),
      max(col("modificationTime")).as("newest"))
  }

  /** SQL-expressible blob metadata (no codec needed): byte length,
    * first-byte sniff class, chunk count. Used by the oracle-checked
    * query; `decodeMeta` is the full-fidelity path. */
  def blobMetaColumns(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val b = col(binCol)
    df.select(
      col(idCol).as("id"),
      octet_length(b).cast("long").as("byte_length"),
      (floor(octet_length(b) / lit(256.0)).cast("int") + 1).as("n_chunks"))
  }
}
