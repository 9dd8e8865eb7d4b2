package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Native Avro Object Container File reader as a DataSource V2 — the
  * row-oriented interchange format next to parquet/orc in every data
  * lake (the Spark distribution here ships avro-the-library but NOT
  * the spark-avro connector, so this closes the format from the
  * PUBLISHED spec: Apache Avro 1.12 specification, "Object Container
  * Files" + "Binary Encoding").
  *
  *   spark.read.format("graft-avro").load("data.avro")   // or a dir
  *
  * Container layout: magic `Obj\1`; file-metadata map (block-encoded
  * map<string, bytes>: zigzag-varint count — negative count carries a
  * byte size — then length-prefixed key/value pairs, 0-terminated)
  * holding `avro.schema` (JSON) and `avro.codec`; a 16-byte sync
  * marker; then data blocks of (row count, byte size, payload, sync)
  * until EOF. `null` and `deflate` (raw DEFLATE, no zlib wrapper)
  * codecs are supported; every block's sync marker is VERIFIED so a
  * torn/corrupt file fails loudly instead of misparsing.
  *
  * Schema subset (honest, documented): the top level must be a record
  * whose fields are primitives (boolean/int/long/float/double/string/
  * bytes), ONE-LEVEL containers of primitives — `array<primitive>`
  * and `map<string, primitive>`, the shapes real corpus metadata
  * (tags, per-field scores) routinely carries — or 2-branch
  * `["null", T]` unions of any of those (→ nullable column). Nested
  * records, container-of-container, enums/fixed/logical types, and
  * nullable container ELEMENTS are out of scope and rejected loudly
  * at schema read.
  *
  * Binary row encoding (spec): fields back-to-back in schema order —
  * int/long zigzag varints, float/double little-endian IEEE,
  * string/bytes varint-length-prefixed, union branch index as a
  * varint before the value.
  *
  * Independence: fixtures are written by scripts/GenAvroFixture.java
  * through the Apache avro-java library (the reference encoder); this
  * reader shares no code with it — two implementations of the public
  * spec meeting at the q369 gate, the GIF/JPEG seam discipline.
  *
  * Scale: reads are SPLITTABLE on the container's sync markers.
  * planInputPartitions parses each file's header once on the driver
  * (a bounded prefix read), then walks block offsets with seek()s —
  * O(#blocks) ~24-byte reads, never the payloads — and deals
  * contiguous block ranges into partitions of ~`split_target_bytes`
  * (option, default 128 MiB, Spark's maxPartitionBytes analog). A
  * task reads ONLY its byte range, so a multi-GB .avro file fans out
  * instead of pinning one straggler task. Column pruning is pushed
  * down (skipped fields are DECODED-AND-DISCARDED at the varint
  * level, never materialized). */
class AvroSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroFormat.readSchema(
      AvroFormat.resolveFiles(options.get("path")).head)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroTable(properties.get("path"), schema)

  // writes hand the DataFrame's schema straight to getTable (the
  // Stata source's contract)
  override def supportsExternalMetadata(): Boolean = true
}

private class AvroTable(path: String, schema: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-avro($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    import org.apache.spark.sql.connector.write._
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new AvroBatchWrite(path, info.schema(), doTruncate)
      }
    }
  }
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val splitTarget = Option(options.get("split_target_bytes"))
      .map(_.toLong).getOrElse(AvroFormat.DefaultSplitTargetBytes)
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = schema
      override def pruneColumns(requiredSchema: StructType): Unit = {
        val keep = requiredSchema.fieldNames.toSet
        required = StructType(schema.fields.filter(f => keep(f.name)))
      }
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = required
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            AvroFormat.resolveFiles(path)
              .flatMap(f => AvroFormat.planSplits(f, splitTarget))
              .map(p => p: InputPartition).toArray
          override def createReaderFactory(): PartitionReaderFactory =
            new AvroReaderFactory(required)
        }
      }
    }
  }
}

/** One task's slice: a CONTIGUOUS run of whole container blocks,
  * [start, end) file bytes, plus the header facts (parsed field plan,
  * codec, sync marker) so the task never re-reads the header. */
private[sources] case class AvroPartition(file: String,
    fields: Seq[AvroFormat.AvField], codec: String, sync: Array[Byte],
    start: Long, end: Long) extends InputPartition

/** Write side: per-partition part files, deflate codec, blocks of 500
  * rows — same commit discipline as [[StataBatchWrite]] (job-unique
  * tag in final names, atomic rename from a task-unique temp, empty
  * partitions write nothing). Validity is certified INDEPENDENTLY:
  * AvroSourceSpec reads our writer's output back through the Apache
  * avro-java DataFileReader (the reference decoder), so a framing or
  * encoding bug cannot hide behind our own reader. */
private class AvroBatchWrite(path: String,
    schema: StructType, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    AvroFormat.validateWriteSchema(schema)
    val dir = new java.io.File(path)
    require(dir.isDirectory || dir.mkdirs(), s"cannot create $path")
    if (truncate)
      Option(dir.listFiles).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".avro")).foreach(_.delete())
    new AvroWriterFactory(path, schema,
      java.util.UUID.randomUUID().toString.take(8))
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private class AvroWriterFactory(path: String,
    schema: StructType, jobTag: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      private val buf =
        scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      override def write(record: InternalRow): Unit =
        buf += record.copy()
      override def commit()
          : org.apache.spark.sql.connector.write.WriterCommitMessage = {
        if (buf.nonEmpty) {
          val tmp = f"$path/.part-$partitionId%05d-$jobTag-$taskId.avro.tmp"
          AvroFormat.write(tmp, schema, buf.toSeq)
          val fin = f"$path/part-$partitionId%05d-$jobTag.avro"
          java.nio.file.Files.move(
            java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(fin),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        new org.apache.spark.sql.connector.write.WriterCommitMessage {}
      }
      override def abort(): Unit = ()
      override def close(): Unit = buf.clear()
    }
}

private class AvroReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = AvroFormat
      .readRows(partition.asInstanceOf[AvroPartition], schema)
    new PartitionReader[InternalRow] {
      private val it = rows
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

object AvroFormat {

  def resolveFiles(path: String): Seq[String] = {
    require(path != null, "graft-avro needs a path")
    val f = new java.io.File(path)
    require(f.exists, s"no such file or directory: $path")
    if (f.isFile) Seq(f.getPath)
    else {
      val fs = Option(f.listFiles).getOrElse(Array.empty)
        .filter(x => x.isFile && x.getName.endsWith(".avro"))
        .map(_.getPath).sorted.toSeq
      require(fs.nonEmpty, s"no .avro files under: $path")
      fs
    }
  }

  /** One field: Spark name/type plus whether it is a [null, T] union
    * (branch 0 = null by fixture convention; branch order is read
    * from the schema, not assumed). `container` is "prim" for a bare
    * primitive, "array"/"map" for one-level containers — there `tpe`
    * names the ELEMENT/VALUE primitive (map keys are always string
    * per the Avro spec). Ships inside [[AvroPartition]]s, so it is
    * serializable by construction. */
  private[sources] final case class AvField(name: String, tpe: String,
      nullable: Boolean, nullBranch: Int, container: String = "prim")
  private final case class Header(fields: Seq[AvField], codec: String,
      sync: Array[Byte], dataOff: Int)

  /** Default per-partition byte target for block-range splits. */
  val DefaultSplitTargetBytes: Long = 128L * 1024 * 1024

  // ---- zigzag varint cursor over a byte array ----
  private final class Cur(val b: Array[Byte], var p: Int) {
    def readLong(): Long = {
      var shift = 0
      var acc = 0L
      var more = true
      while (more) {
        require(p < b.length && shift <= 63, "varint overruns buffer")
        val x = b(p) & 0xff
        p += 1
        acc |= (x & 0x7fL) << shift
        shift += 7
        more = (x & 0x80) != 0
      }
      (acc >>> 1) ^ -(acc & 1L) // zigzag decode
    }
    def readBytes(n: Int): Array[Byte] = {
      require(n >= 0 && p + n <= b.length, "byte run overruns buffer")
      val out = java.util.Arrays.copyOfRange(b, p, p + n)
      p += n
      out
    }
    def skip(n: Int): Unit = {
      require(n >= 0 && p + n <= b.length, "skip overruns buffer")
      p += n
    }
  }

  private def parseHeader(bytes: Array[Byte], file: String): Header = {
    require(bytes.length > 20 && bytes(0) == 'O' && bytes(1) == 'b' &&
      bytes(2) == 'j' && bytes(3) == 1,
      s"$file: not an Avro object container file")
    val c = new Cur(bytes, 4)
    val meta = scala.collection.mutable.LinkedHashMap[String, Array[Byte]]()
    var count = c.readLong()
    while (count != 0L) {
      val n = if (count < 0) { c.readLong(); -count } else count
      var i = 0L
      while (i < n) {
        val klen = c.readLong()
        val k = new String(c.readBytes(klen.toInt),
          java.nio.charset.StandardCharsets.UTF_8)
        val vlen = c.readLong()
        meta(k) = c.readBytes(vlen.toInt)
        i += 1
      }
      count = c.readLong()
    }
    val sync = c.readBytes(16)
    val codec = meta.get("avro.codec")
      .map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
      .getOrElse("null")
    require(codec == "null" || codec == "deflate",
      s"$file: unsupported avro.codec '$codec' (null/deflate)")
    val schemaJson = new String(
      meta.getOrElse("avro.schema", throw new IllegalArgumentException(
        s"$file: no avro.schema in file metadata")),
      java.nio.charset.StandardCharsets.UTF_8)
    Header(parseSchema(schemaJson, file), codec, sync, c.p)
  }

  /** Parse the schema JSON (jackson — on Spark's own classpath) into
    * the supported flat-record subset; anything else fails loudly. */
  private def parseSchema(json: String, file: String): Seq[AvField] = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(json)
    require(root.isObject && root.path("type").asText() == "record",
      s"$file: top-level schema must be a record, got: " +
        root.path("type").asText())
    val fields = root.path("fields")
    require(fields.isArray && fields.size() > 0,
      s"$file: record has no fields")
    val prim = Set("boolean", "int", "long", "float", "double",
      "string", "bytes")
    // (tpe, container) for one non-null schema node: a textual
    // primitive, or a one-level {"type":"array","items":prim} /
    // {"type":"map","values":prim} object — anything deeper rejects
    def leaf(t: com.fasterxml.jackson.databind.JsonNode,
        name: String): (String, String) =
      if (t.isTextual) {
        val tt = t.asText()
        require(prim(tt), s"$file: field '$name' type '$tt' outside " +
          "the supported primitive subset")
        (tt, "prim")
      } else if (t.isObject &&
        (t.path("type").asText() == "array" ||
          t.path("type").asText() == "map")) {
        val container = t.path("type").asText()
        val inner =
          if (container == "array") t.path("items") else t.path("values")
        require(inner.isTextual && prim(inner.asText()),
          s"$file: field '$name' $container element type must be a " +
            s"bare primitive (got: $inner) — container-of-container, " +
            "nullable elements, and nested records are outside this " +
            "reader's subset")
        (inner.asText(), container)
      } else throw new IllegalArgumentException(
        s"$file: field '$name' has an unsupported complex type — " +
          "nested records/enums/fixed and containers of non-primitives " +
          "are outside this reader's subset")
    (0 until fields.size()).map { i =>
      val f = fields.get(i)
      val name = f.path("name").asText()
      val t = f.path("type")
      if (t.isArray && t.size() == 2) {
        val b0 = t.get(0)
        val b1 = t.get(1)
        val n0 = b0.isTextual && b0.asText() == "null"
        val n1 = b1.isTextual && b1.asText() == "null"
        require(n0 ^ n1,
          s"$file: field '$name' union must have exactly one null branch")
        val (tt, container) = leaf(if (n0) b1 else b0, name)
        AvField(name, tt, nullable = true,
          nullBranch = if (n0) 0 else 1, container = container)
      } else {
        val (tt, container) = leaf(t, name)
        AvField(name, tt, nullable = false, nullBranch = -1,
          container = container)
      }
    }
  }

  private def sparkType(t: String): DataType = t match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "string" => StringType
    case "bytes" => BinaryType
  }

  private def fieldSparkType(f: AvField): DataType = f.container match {
    case "array" => ArrayType(sparkType(f.tpe), containsNull = false)
    case "map" =>
      MapType(StringType, sparkType(f.tpe), valueContainsNull = false)
    case _ => sparkType(f.tpe)
  }

  def readSchema(file: String): StructType = {
    val h = readHeaderOnly(file)
    StructType(h.fields.map(f =>
      StructField(f.name, fieldSparkType(f), nullable = f.nullable)))
  }

  /** Driver-side memo for parsed headers and block-offset scans,
    * keyed by (path, length, mtime) so a rewritten file can never
    * serve a stale entry — inferSchema, planSplits, and repeated
    * scans of the same file each cost the O(#blocks) seek walk ONCE
    * per file version instead of once per planInputPartitions call.
    * Bounded LRU (128 files) so a long-lived driver never grows it
    * unboundedly; planning is driver-only, hence the synchronization
    * is uncontended. */
  private val memoCap = 128
  private val headerMemo =
    new java.util.LinkedHashMap[(String, Long, Long), Header](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long), Header]): Boolean =
        size() > memoCap
    }
  private val blocksMemo =
    new java.util.LinkedHashMap[(String, Long, Long), Seq[(Long, Long)]](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long),
            Seq[(Long, Long)]]): Boolean =
        size() > memoCap
    }
  private def fileKey(file: String): (String, Long, Long) = {
    val p = java.nio.file.Paths.get(file)
    (file, java.nio.file.Files.size(p),
      java.nio.file.Files.getLastModifiedTime(p).toMillis)
  }

  /** Parse a file's header from a bounded PREFIX read (64 KiB, grown
    * geometrically on the rare schema-bigger-than-that file) — never
    * the whole file; the driver plans multi-GB containers without
    * pulling their data. A short buffer surfaces as a cursor-overrun
    * require(), retried with a bigger prefix; at full file length the
    * error is genuine corruption and rethrows. Memoized per file
    * version. */
  private def readHeaderOnly(file: String): Header = {
    val key = fileKey(file)
    headerMemo.synchronized {
      val hit = headerMemo.get(key)
      if (hit != null) return hit
    }
    val h = readHeaderUncached(file)
    headerMemo.synchronized { headerMemo.put(key, h) }
    h
  }

  private def readHeaderUncached(file: String): Header = {
    val p = java.nio.file.Paths.get(file)
    val len = java.nio.file.Files.size(p)
    var cap = math.min(len, 64L * 1024).toInt
    while (true) {
      val in = java.nio.file.Files.newInputStream(p)
      val buf = try in.readNBytes(cap) finally in.close()
      try return parseHeader(buf, file)
      catch {
        case _: IllegalArgumentException if cap < len =>
          cap = math.min(len, cap.toLong * 4).toInt
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Zigzag varint read off a seekable file (block HEADER fields only
    * — payloads are seek()ed over, never read, during planning). */
  private def rafVarint(raf: java.io.RandomAccessFile,
      file: String): Long = {
    var shift = 0
    var acc = 0L
    var more = true
    while (more) {
      val x = raf.read()
      require(x >= 0 && shift <= 63, s"$file: varint overruns file")
      acc |= (x & 0x7fL) << shift
      shift += 7
      more = (x & 0x80) != 0
    }
    (acc >>> 1) ^ -(acc & 1L)
  }

  /** Driver-side block-offset scan: seek from block header to block
    * header verifying each sync marker, returning [start, end) byte
    * ranges. O(#blocks) tiny reads regardless of file size; memoized
    * per file version (a multi-scan plan over the same container
    * walks the offsets once, not once per scan). */
  private def scanBlocks(file: String, h: Header): Seq[(Long, Long)] = {
    val key = fileKey(file)
    blocksMemo.synchronized {
      val hit = blocksMemo.get(key)
      if (hit != null) return hit
    }
    val out = scanBlocksUncached(file, h)
    blocksMemo.synchronized { blocksMemo.put(key, out) }
    out
  }

  private def scanBlocksUncached(file: String,
      h: Header): Seq[(Long, Long)] = {
    val raf = new java.io.RandomAccessFile(file, "r")
    try {
      val len = raf.length()
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      raf.seek(h.dataOff.toLong)
      while (raf.getFilePointer < len) {
        val start = raf.getFilePointer
        val nRows = rafVarint(raf, file)
        val size = rafVarint(raf, file)
        require(nRows >= 0 && size >= 0, s"$file: negative block header")
        raf.seek(raf.getFilePointer + size)
        val sync = new Array[Byte](16)
        raf.readFully(sync)
        require(java.util.Arrays.equals(sync, h.sync),
          s"$file: block sync marker mismatch (torn or corrupt file)")
        out += ((start, raf.getFilePointer))
      }
      out.toSeq
    } finally raf.close()
  }

  /** Deal one file's blocks into contiguous ranges of ~targetBytes.
    * Blocks stay whole (a block is the atomic codec unit); a single
    * over-target block becomes its own partition. */
  private[sources] def planSplits(file: String,
      targetBytes: Long): Seq[AvroPartition] = {
    require(targetBytes > 0, "split_target_bytes must be positive")
    val h = readHeaderOnly(file)
    val blocks = scanBlocks(file, h)
    val out = scala.collection.mutable.ArrayBuffer[AvroPartition]()
    var i = 0
    while (i < blocks.length) {
      val start = blocks(i)._1
      var end = blocks(i)._2
      i += 1
      while (i < blocks.length && end - start < targetBytes) {
        end = blocks(i)._2
        i += 1
      }
      out += AvroPartition(file, h.fields, h.codec, h.sync, start, end)
    }
    out.toSeq
  }

  private def inflateRaw(b: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true) // raw DEFLATE per spec
    try {
      inf.setInput(b)
      val out = new java.io.ByteArrayOutputStream(
        math.min(math.max(b.length * 4, 1024), 1 << 26))
      val buf = new Array[Byte](8192)
      var stalled = false
      while (!inf.finished() && !stalled && out.size < (1 << 28)) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n) else stalled = true
      }
      require(inf.finished(), "deflate block did not terminate")
      out.toByteArray
    } finally inf.end()
  }

  /** Decode one value of primitive type `t` from the cursor. */
  private def readPrim(c: Cur, t: String): Any = t match {
    case "boolean" =>
      val v = c.b(c.p); c.skip(1); java.lang.Boolean.valueOf(v != 0)
    case "int" => java.lang.Integer.valueOf(c.readLong().toInt)
    case "long" => java.lang.Long.valueOf(c.readLong())
    case "float" =>
      val bits = (c.b(c.p) & 0xff) | ((c.b(c.p + 1) & 0xff) << 8) |
        ((c.b(c.p + 2) & 0xff) << 16) | ((c.b(c.p + 3) & 0xff) << 24)
      c.skip(4)
      java.lang.Float.valueOf(java.lang.Float.intBitsToFloat(bits))
    case "double" =>
      var bits = 0L
      var i = 0
      while (i < 8) {
        bits |= (c.b(c.p + i) & 0xffL) << (8 * i); i += 1
      }
      c.skip(8)
      java.lang.Double.valueOf(java.lang.Double.longBitsToDouble(bits))
    case "string" =>
      val n = c.readLong().toInt
      val off = c.p
      c.skip(n)
      UTF8String.fromBytes(c.b, off, n)
    case "bytes" =>
      c.readBytes(c.readLong().toInt)
  }

  /** Skip one value without materializing (pruned columns). */
  private def skipPrim(c: Cur, t: String): Unit = t match {
    case "boolean" => c.skip(1)
    case "int" | "long" => c.readLong(); ()
    case "float" => c.skip(4)
    case "double" => c.skip(8)
    case "string" | "bytes" => c.skip(c.readLong().toInt)
  }

  /** Decode one container value: Avro arrays/maps are SERIES of
    * blocks — (count, items…) with a terminating zero count; a
    * NEGATIVE count carries abs(count) items prefixed by the block's
    * byte size (the fast-skip affordance). Map keys are avro strings
    * per the spec. */
  private def readContainer(c: Cur, f: AvField): Any = {
    if (f.container == "array") {
      val out = scala.collection.mutable.ArrayBuffer[Any]()
      var count = c.readLong()
      while (count != 0L) {
        val n = if (count < 0) { c.readLong(); -count } else count
        var i = 0L
        while (i < n) { out += readPrim(c, f.tpe); i += 1 }
        count = c.readLong()
      }
      new GenericArrayData(out.toArray)
    } else {
      val keys = scala.collection.mutable.ArrayBuffer[Any]()
      val vals = scala.collection.mutable.ArrayBuffer[Any]()
      var count = c.readLong()
      while (count != 0L) {
        val n = if (count < 0) { c.readLong(); -count } else count
        var i = 0L
        while (i < n) {
          keys += readPrim(c, "string")
          vals += readPrim(c, f.tpe)
          i += 1
        }
        count = c.readLong()
      }
      new ArrayBasedMapData(
        new GenericArrayData(keys.toArray), new GenericArrayData(vals.toArray))
    }
  }

  /** Skip one container without materializing — a size-carrying
    * (negative-count) block skips its whole payload in ONE cursor
    * move; plain blocks walk items at the varint level. */
  private def skipContainer(c: Cur, f: AvField): Unit = {
    var count = c.readLong()
    while (count != 0L) {
      if (count < 0) c.skip(c.readLong().toInt)
      else {
        var i = 0L
        while (i < count) {
          if (f.container == "map") skipPrim(c, "string")
          skipPrim(c, f.tpe)
          i += 1
        }
      }
      count = c.readLong()
    }
  }

  private def readValue(c: Cur, f: AvField): Any =
    if (f.container == "prim") readPrim(c, f.tpe) else readContainer(c, f)

  private def skipValue(c: Cur, f: AvField): Unit =
    if (f.container == "prim") skipPrim(c, f.tpe) else skipContainer(c, f)

  // ----------------- write side (the q370 round trip) -----------------

  private val writableTypes: Map[DataType, String] = Map(
    BooleanType -> "boolean", IntegerType -> "int", LongType -> "long",
    FloatType -> "float", DoubleType -> "double", StringType -> "string",
    BinaryType -> "bytes")

  def validateWriteSchema(schema: StructType): Unit =
    schema.fields.foreach { f =>
      f.dataType match {
        case t if writableTypes.contains(t) => ()
        // encoder-derived schemas mark AnyRef elements containsNull =
        // true even when no null ever occurs, so the FLAG is accepted
        // and nullness is enforced per element at write time instead
        case ArrayType(et, _) =>
          require(writableTypes.contains(et),
            s"graft-avro cannot write column '${f.name}' of type " +
              s"${f.dataType.simpleString} — array elements must be " +
              "primitives")
        case MapType(StringType, vt, _) =>
          require(writableTypes.contains(vt),
            s"graft-avro cannot write column '${f.name}' of type " +
              s"${f.dataType.simpleString} — map values must be " +
              "primitives")
        case _ => throw new IllegalArgumentException(
          s"graft-avro cannot write column '${f.name}' of type " +
            s"${f.dataType.simpleString} (supported: primitives, " +
            "array<primitive>, map<string,primitive>)")
      }
    }

  /** Schema JSON for the supported subset; nullable → ["null", T]. */
  private[sources] def schemaJson(schema: StructType): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def typeJson(dt: DataType): String = dt match {
      case ArrayType(et, _) =>
        s"""{"type":"array","items":"${writableTypes(et)}"}"""
      case MapType(_, vt, _) =>
        s"""{"type":"map","values":"${writableTypes(vt)}"}"""
      case t => "\"" + writableTypes(t) + "\""
    }
    val fs = schema.fields.map { f =>
      val t = typeJson(f.dataType)
      val tt = if (f.nullable) s"""["null",$t]""" else t
      s"""{"name":"${esc(f.name)}","type":$tt}"""
    }.mkString(",")
    s"""{"type":"record","name":"row","fields":[$fs]}"""
  }

  private final class ByteSink {
    val out = new java.io.ByteArrayOutputStream(1 << 14)
    def vlong(v0: Long): Unit = {
      var v = (v0 << 1) ^ (v0 >> 63) // zigzag
      var more = true
      while (more) {
        val b = (v & 0x7f).toInt
        v >>>= 7
        more = v != 0
        out.write(if (more) b | 0x80 else b)
      }
    }
    def bytes(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    def lenBytes(b: Array[Byte]): Unit = { vlong(b.length.toLong); bytes(b) }
    def le32(bits: Int): Unit = {
      out.write(bits & 0xff); out.write((bits >> 8) & 0xff)
      out.write((bits >> 16) & 0xff); out.write((bits >> 24) & 0xff)
    }
    def le64(bits: Long): Unit = {
      var i = 0
      while (i < 8) { out.write(((bits >> (8 * i)) & 0xff).toInt); i += 1 }
    }
  }

  private def deflateRaw(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream(
        math.max(64, b.length / 2))
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val n = d.deflate(buf)
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally d.end()
  }

  /** Write one container file (deflate codec, 500-row blocks) from
    * buffered InternalRows. */
  def write(file: String, schema: StructType,
      rows: Seq[InternalRow]): Unit = {
    validateWriteSchema(schema)
    val json = schemaJson(schema)
    // deterministic sync marker per schema+file (any 16 bytes are
    // legal; determinism keeps byte-stable outputs for goldens)
    val sync = java.security.MessageDigest.getInstance("SHA-256")
      .digest((json + "|" + file)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(16)
    val hdr = new ByteSink
    hdr.bytes(Array[Byte]('O', 'b', 'j', 1))
    hdr.vlong(2L)
    hdr.lenBytes("avro.codec".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    hdr.lenBytes("deflate".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    hdr.lenBytes("avro.schema".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    hdr.lenBytes(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    hdr.vlong(0L)
    hdr.bytes(sync)

    val fields = schema.fields
    rows.grouped(500).foreach { block =>
      val body = new ByteSink
      block.foreach { r =>
        var i = 0
        while (i < fields.length) {
          val f = fields(i)
          if (f.nullable) {
            if (r.isNullAt(i)) body.vlong(0L)
            else { body.vlong(1L); writeVal(body, r, i, f.dataType) }
          } else {
            require(!r.isNullAt(i),
              s"null in non-nullable column '${f.name}'")
            writeVal(body, r, i, f.dataType)
          }
          i += 1
        }
      }
      val payload = deflateRaw(body.out.toByteArray)
      hdr.vlong(block.length.toLong)
      hdr.vlong(payload.length.toLong)
      hdr.bytes(payload)
      hdr.bytes(sync)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(file),
      hdr.out.toByteArray)
    ()
  }

  private def writeVal(s: ByteSink, r: InternalRow, i: Int,
      t: DataType): Unit = t match {
    case BooleanType => s.out.write(if (r.getBoolean(i)) 1 else 0)
    case IntegerType => s.vlong(r.getInt(i).toLong)
    case LongType => s.vlong(r.getLong(i))
    case FloatType =>
      s.le32(java.lang.Float.floatToIntBits(r.getFloat(i)))
    case DoubleType =>
      s.le64(java.lang.Double.doubleToLongBits(r.getDouble(i)))
    case StringType => s.lenBytes(r.getUTF8String(i).getBytes)
    case BinaryType => s.lenBytes(r.getBinary(i))
    case ArrayType(et, _) =>
      // one plain block (n, items) + terminating zero — the simplest
      // legal series; avro-java reads it back verbatim
      val arr = r.getArray(i)
      if (arr.numElements() > 0) {
        s.vlong(arr.numElements().toLong)
        var k = 0
        while (k < arr.numElements()) { writeElem(s, arr, k, et); k += 1 }
      }
      s.vlong(0L)
    case MapType(_, vt, _) =>
      val m = r.getMap(i)
      val keys = m.keyArray()
      val vals = m.valueArray()
      if (m.numElements() > 0) {
        s.vlong(m.numElements().toLong)
        var k = 0
        while (k < m.numElements()) {
          s.lenBytes(keys.getUTF8String(k).getBytes)
          writeElem(s, vals, k, vt)
          k += 1
        }
      }
      s.vlong(0L)
    case other => throw new IllegalArgumentException(
      s"unsupported write type $other")
  }

  private def writeElem(s: ByteSink,
      a: org.apache.spark.sql.catalyst.util.ArrayData, k: Int,
      t: DataType): Unit = t match {
    case _ if a.isNullAt(k) => throw new IllegalArgumentException(
      "graft-avro cannot write a NULL container element — avro " +
        "array items / map values in this subset are non-null " +
        "primitives")
    case BooleanType => s.out.write(if (a.getBoolean(k)) 1 else 0)
    case IntegerType => s.vlong(a.getInt(k).toLong)
    case LongType => s.vlong(a.getLong(k))
    case FloatType =>
      s.le32(java.lang.Float.floatToIntBits(a.getFloat(k)))
    case DoubleType =>
      s.le64(java.lang.Double.doubleToLongBits(a.getDouble(k)))
    case StringType => s.lenBytes(a.getUTF8String(k).getBytes)
    case BinaryType => s.lenBytes(a.getBinary(k))
    case other => throw new IllegalArgumentException(
      s"unsupported element type $other")
  }

  /** Decode one partition's [start, end) block range. The task reads
    * ONLY its slice of the file; header facts ride in the partition. */
  def readRows(part: AvroPartition,
      schema: StructType): Iterator[InternalRow] = {
    val file = part.file
    val byName = part.fields.map(f => f.name -> f).toMap
    schema.fieldNames.foreach { n =>
      require(byName.contains(n), s"$file: requested column '$n' not " +
        s"in the file (${part.fields.map(_.name).mkString(",")})")
    }
    val wanted = schema.fieldNames.zipWithIndex.toMap
    val plan = part.fields.map(f => (f, wanted.get(f.name))).toArray

    val bytes = {
      val raf = new java.io.RandomAccessFile(file, "r")
      try {
        val n = part.end - part.start
        require(n >= 0 && n <= Int.MaxValue,
          s"$file: split [${part.start}, ${part.end}) out of range")
        val buf = new Array[Byte](n.toInt)
        raf.seek(part.start)
        raf.readFully(buf)
        buf
      } finally raf.close()
    }
    val blocks = scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)]()
    val fc = new Cur(bytes, 0)
    while (fc.p < bytes.length) {
      val nRows = fc.readLong()
      val size = fc.readLong()
      require(nRows >= 0 && size >= 0, s"$file: negative block header")
      val payload = fc.readBytes(size.toInt)
      val sync = fc.readBytes(16)
      require(java.util.Arrays.equals(sync, part.sync),
        s"$file: block sync marker mismatch (torn or corrupt file)")
      val data = if (part.codec == "deflate") inflateRaw(payload) else payload
      blocks += ((data, nRows))
    }

    blocks.iterator.flatMap { case (data, nRows) =>
      val c = new Cur(data, 0)
      (0L until nRows).iterator.map { _ =>
        val vals = new Array[Any](schema.length)
        var i = 0
        while (i < plan.length) {
          val (f, slot) = plan(i)
          val isNull = f.nullable && {
            val branch = c.readLong().toInt
            branch == f.nullBranch // null branch encodes NO value bytes
          }
          slot match {
            case Some(k) =>
              vals(k) = if (isNull) null else readValue(c, f)
            case None =>
              if (!isNull) skipValue(c, f)
          }
          i += 1
        }
        new GenericInternalRow(vals)
      }
    }
  }
}
