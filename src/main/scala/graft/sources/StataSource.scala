package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Native Stata `.dta` (format 118) reader as a DataSource V2 — closes
  * part of the reference's legacy-format surface (pandas `read_stata`,
  * reference pandas_profiling console entry accepts .dta) that SURVEY
  * §2.1 previously waived for lack of any Spark source.
  *
  *   spark.read.format("graft-stata").load("data.dta")   // or a dir
  *
  * Format: the public "Description of .dta file format 118"
  * (stata.com/help.cgi?dta). Supported: all fixed-width column types —
  * byte/int/long/float/double and str1..str2045 — with Stata's
  * reserved MISSING ranges mapped to SQL nulls (byte > 100,
  * int > 32740, long > 2147483620, float ≥ 2^127-class codes,
  * double ≥ 0x7fe0...). strL (long string) columns and value labels
  * are rejected with a clear error rather than misread. Byte order:
  * LSF (the only order modern writers emit).
  *
  * Scale design: one InputPartition per FILE (a .dta file is a single
  * fixed-width row blob with no internal split points — like
  * gzip'd csv, parallelism comes from the many-files layout, which is
  * how real Stata corpora arrive); schema comes from the first file's
  * header via the self-describing <map> offsets, so inference costs
  * one header read, not a scan. Each reader streams rows off a byte
  * buffer — no third-party parser, zero extra dependencies.
  */
class StataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-stata"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StataFormat.readSchema(StataFormat.resolveFiles(options.get("path")).head)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StataTable(properties.get("path"), schema)

  // writes hand the DataFrame's schema straight to getTable (the write
  // path has no file to infer from); reads with an explicit user
  // schema ride the same route
  override def supportsExternalMetadata(): Boolean = true
}

private class StataTable(path: String, schema: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-stata($path)"
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
          new StataBatchWrite(path, info.schema(), doTruncate)
      }
    }
  }
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    // column pruning: a projection reaches the reader as a required-
    // schema subset — the fixed-width layout decodes ONLY the pruned
    // columns' offsets per row (ReadSchema in explain shows the cut)
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
            StataFormat.resolveFiles(path)
              .map(f => StataPartition(f): InputPartition).toArray
          override def createReaderFactory(): PartitionReaderFactory =
            new StataReaderFactory(required)
        }
      }
    }
}

private case class StataPartition(file: String) extends InputPartition

private class StataReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = StataFormat
      .readRows(partition.asInstanceOf[StataPartition].file, schema)
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

object StataFormat {

  def resolveFiles(path: String): Seq[String] = {
    require(path != null, "graft-stata needs a path")
    val f = new java.io.File(path)
    require(f.exists, s"no such file or directory: $path")
    if (f.isFile) Seq(f.getPath)
    else {
      val fs = Option(f.listFiles).getOrElse(Array.empty)
        .filter(x => x.isFile && x.getName.endsWith(".dta"))
        .map(_.getPath).sorted.toSeq
      require(fs.nonEmpty, s"no .dta files under: $path")
      fs
    }
  }

  private final case class Header(
      k: Int, n: Long, types: Array[Int], names: Array[String],
      dataOff: Long)

  private def parseHeader(bytes: Array[Byte], file: String): Header = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, len: Int) =
      new String(bytes, off, len, java.nio.charset.StandardCharsets.UTF_8)
    def expect(off: Int, s: String): Int = {
      require(ascii(off, s.length) == s,
        s"$file: expected '$s' at offset $off — not a dta-118 file " +
          s"(got '${ascii(off, math.min(s.length, bytes.length - off))}')")
      off + s.length
    }
    var o = expect(0, "<stata_dta><header><release>")
    val release = ascii(o, 3); o += 3
    require(release == "118",
      s"$file: dta release $release unsupported (graft-stata reads 118; " +
        "re-export with a modern writer, e.g. pandas to_stata version=118)")
    o = expect(o, "</release><byteorder>")
    val order = ascii(o, 3); o += 3
    require(order == "LSF", s"$file: byte order $order unsupported (LSF only)")
    o = expect(o, "</byteorder><K>")
    val k = bb.getShort(o) & 0xffff; o += 2
    o = expect(o, "</K><N>")
    val n = bb.getLong(o); o += 8
    // skip to the map via its tag (label/timestamp are length-prefixed
    // but the map carries absolute offsets for everything after it)
    o = expect(o, "</N><label>")
    val labelLen = bb.getShort(o) & 0xffff; o += 2 + labelLen
    o = expect(o, "</label><timestamp>")
    val tsLen = bytes(o) & 0xff; o += 1 + tsLen
    o = expect(o, "</timestamp></header><map>")
    val map = (0 until 14).map(i => bb.getLong(o + 8 * i))
    // map slots (dta spec): 2=<variable_types>, 3=<varnames>, 9=<data>
    val typesOff = map(2).toInt + "<variable_types>".length
    val types = Array.tabulate(k)(i => bb.getShort(typesOff + 2 * i) & 0xffff)
    val namesOff = map(3).toInt + "<varnames>".length
    val names = Array.tabulate(k) { i =>
      val raw = ascii(namesOff + 129 * i, 129)
      val nul = raw.indexOf('\u0000')
      if (nul >= 0) raw.substring(0, nul) else raw
    }
    val dataOff = map(9) + "<data>".length
    Header(k, n, types, names, dataOff)
  }

  private def fieldType(t: Int, file: String): (DataType, Int) = t match {
    case w if w >= 1 && w <= 2045 => (StringType, w)
    case 65526 => (DoubleType, 8)
    case 65527 => (FloatType, 4)
    case 65528 => (IntegerType, 4)
    case 65529 => (ShortType, 2)
    case 65530 => (ByteType, 1)
    case 32768 => throw new IllegalArgumentException(
      s"$file: strL columns unsupported — export with fixed-width " +
        "strings (pandas: convert_strl=[] / keep strings short)")
    case other => throw new IllegalArgumentException(
      s"$file: unknown dta type code $other")
  }

  def readSchema(file: String): StructType = {
    val h = parseHeader(readAll(file), file)
    StructType(h.names.zip(h.types).map { case (nm, t) =>
      StructField(nm, fieldType(t, file)._1, nullable = true)
    })
  }

  private def readAll(file: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file))

  /** Stream the fixed-width data section as InternalRows, mapping the
    * reserved missing ranges to nulls. */
  def readRows(file: String, schema: StructType): Iterator[InternalRow] = {
    val bytes = readAll(file)
    val h = parseHeader(bytes, file)
    // `schema` may be a PRUNED subset of the file's columns (column
    // pushdown); decode only the requested ones via their fixed-width
    // offsets in the file's full row layout
    val byName = h.names.zipWithIndex.toMap
    val fileCols = schema.fields.map { f =>
      val idx = byName.getOrElse(f.name, throw new IllegalArgumentException(
        s"$file: requested column '${f.name}' not in the file " +
          s"(${h.names.mkString(",")})"))
      // a user-supplied schema must agree with the file's type codes:
      // the decoder emits the FILE's types, and a silent mismatch would
      // surface as ClassCastExceptions rows later
      val actual = fieldType(h.types(idx), file)._1
      require(f.dataType == actual,
        s"$file: column '${f.name}' is ${actual.simpleString} in the " +
          s"file but the supplied schema says ${f.dataType.simpleString}")
      idx
    }
    val widths = h.types.map(fieldType(_, file)._2)
    val rowWidth = widths.sum
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val offsets = widths.scanLeft(0)(_ + _)

    new Iterator[InternalRow] {
      private var r = 0L
      private var base = h.dataOff
      override def hasNext: Boolean = r < h.n
      override def next(): InternalRow = {
        val vals = new Array[Any](fileCols.length)
        var ci = 0
        while (ci < fileCols.length) {
          val c = fileCols(ci)
          val off = (base + offsets(c)).toInt
          vals(ci) = h.types(c) match {
            case w if w <= 2045 =>
              var end = off
              val lim = off + w
              while (end < lim && bytes(end) != 0) end += 1
              UTF8String.fromBytes(bytes, off, end - off)
            case 65526 =>
              // missing codes occupy 0x7fe0... through 0x7fff...:
              // positive long bit patterns only, so one compare suffices
              val raw = bb.getLong(off)
              if (raw >= 0x7fe0000000000000L) null
              else java.lang.Double.valueOf(bb.getDouble(off))
            case 65527 =>
              // missing codes 0x7f000000..0x7fffffff: positive int bit
              // patterns only, so one compare suffices
              val raw = bb.getInt(off)
              if (raw >= 0x7f000000) null
              else java.lang.Float.valueOf(bb.getFloat(off))
            case 65528 =>
              val v = bb.getInt(off)
              if (v > 2147483620) null else java.lang.Integer.valueOf(v)
            case 65529 =>
              val v = bb.getShort(off)
              if (v > 32740) null else java.lang.Short.valueOf(v)
            case 65530 =>
              val v = bytes(off)
              if (v > 100) null else java.lang.Byte.valueOf(v)
          }
          ci += 1
        }
        r += 1
        base += rowWidth
        new GenericInternalRow(vals)
      }
    }
  }

  // ---- write side -----------------------------------------------------

  /** Reject un-mappable column types up front with actionable errors
    * (Stata has no 64-bit integer, no temporal types in this writer's
    * scope — cast first). */
  def validateWriteSchema(schema: StructType): Unit =
    schema.fields.foreach { f =>
      f.dataType match {
        case ByteType | ShortType | IntegerType | FloatType | DoubleType |
            StringType => ()
        case LongType => throw new IllegalArgumentException(
          s"graft-stata cannot write BIGINT column '${f.name}': the dta " +
            "format has no 64-bit integer — cast to int (exact below " +
            "2^31-21) or double (the lossy mapping Stata itself uses)")
        case other => throw new IllegalArgumentException(
          s"graft-stata cannot write ${other.simpleString} column " +
            s"'${f.name}' — supported: tinyint/smallint/int/float/" +
            "double/string; cast first")
      }
      require(f.name.getBytes("UTF-8").length <= 32,
        s"dta variable names are limited to 32 bytes: '${f.name}'")
    }

  /** Assemble one v118 file for `rows` (already buffered — the format
    * is a single fixed-width blob) and write it atomically-enough
    * (in-memory assembly, one write). Nulls encode as the '.' missing
    * codes; strings as UTF-8 str# at the partition's max byte width. */
  def write(file: String, schema: StructType, rows: Seq[InternalRow])
      : Unit = {
    validateWriteSchema(schema)
    val k = schema.length
    // str widths: max UTF-8 byte length in this partition (min 1)
    val widthsByCol = schema.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case StringType =>
          val m = rows.iterator.map { r =>
            if (r.isNullAt(i)) 0
            else r.getUTF8String(i).numBytes()
          }.foldLeft(1)(math.max)
          require(m <= 2045,
            s"string column '${f.name}' exceeds str2045 ($m bytes); " +
              "dta fixed-width strings cap at 2045 — truncate or split")
          m
        case DoubleType => 8
        case FloatType => 4
        case IntegerType => 4
        case ShortType => 2
        case ByteType => 1
        case _ => 0
      }
    }
    val typeCodes = schema.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case StringType => widthsByCol(i)
        case DoubleType => 65526
        case FloatType => 65527
        case IntegerType => 65528
        case ShortType => 65529
        case ByteType => 65530
        case _ => 0
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    val marks = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def w(str: String): Unit =
      out.write(str.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def wb(bs: Array[Byte]): Unit = out.write(bs)
    def le(n: Int)(put: java.nio.ByteBuffer => Unit): Unit = {
      val b = java.nio.ByteBuffer.allocate(n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      put(b); out.write(b.array())
    }
    def mark(name: String): Unit = marks(name) = out.size().toLong

    mark("open"); w("<stata_dta><header>")
    w("<release>118</release><byteorder>LSF</byteorder>")
    w("<K>"); le(2)(_.putShort(k.toShort)); w("</K>")
    w("<N>"); le(8)(_.putLong(rows.length.toLong)); w("</N>")
    w("<label>"); le(2)(_.putShort(0)); w("</label>")
    val ts = "01 Jan 2026 00:00"
    w("<timestamp>"); out.write(ts.length); w(ts); w("</timestamp>")
    w("</header>")
    mark("map"); w("<map>")
    val mapPos = out.size()
    (0 until 14).foreach(_ => le(8)(_.putLong(0L)))
    w("</map>")
    mark("types"); w("<variable_types>")
    typeCodes.foreach(t => le(2)(_.putShort(t.toShort)))
    w("</variable_types>")
    mark("names"); w("<varnames>")
    schema.fieldNames.foreach { n =>
      val b = n.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      wb(java.util.Arrays.copyOf(b, 129))
    }
    w("</varnames>")
    mark("sortlist"); w("<sortlist>")
    (0 to k).foreach(_ => le(2)(_.putShort(0)))
    w("</sortlist>")
    mark("formats"); w("<formats>")
    (0 until k).foreach(_ => wb(new Array[Byte](57)))
    w("</formats>")
    mark("vlnames"); w("<value_label_names>")
    (0 until k).foreach(_ => wb(new Array[Byte](129)))
    w("</value_label_names>")
    mark("varlabels"); w("<variable_labels>")
    (0 until k).foreach(_ => wb(new Array[Byte](321)))
    w("</variable_labels>")
    mark("chars"); w("<characteristics></characteristics>")
    mark("data"); w("<data>")
    rows.foreach { r =>
      var i = 0
      while (i < k) {
        schema.fields(i).dataType match {
          case StringType =>
            val width = widthsByCol(i)
            val b =
              if (r.isNullAt(i)) Array.empty[Byte]
              else r.getUTF8String(i).getBytes
            wb(java.util.Arrays.copyOf(b, width))
          case DoubleType =>
            le(8)(_.putLong(
              if (r.isNullAt(i)) 0x7fe0000000000000L
              else {
                val bits = java.lang.Double.doubleToLongBits(r.getDouble(i))
                // same collision discipline as the int paths: a legit
                // value inside the reserved missing bit range must fail
                // loudly, never round-trip as NULL
                require(bits < 0x7fe0000000000000L,
                  s"double value ${r.getDouble(i)} falls in the dta " +
                    "reserved missing range (>= 8.99e307) and cannot " +
                    "be represented")
                bits
              }))
          case FloatType =>
            le(4)(_.putInt(
              if (r.isNullAt(i)) 0x7f000000
              else {
                val bits = java.lang.Float.floatToIntBits(r.getFloat(i))
                require(bits < 0x7f000000,
                  s"float value ${r.getFloat(i)} falls in the dta " +
                    "reserved missing range (>= 1.70e38); cast to double")
                bits
              }))
          case IntegerType =>
            le(4)(_.putInt(
              if (r.isNullAt(i)) 2147483621 else {
                val v = r.getInt(i)
                require(v <= 2147483620,
                  s"int value $v collides with dta missing codes " +
                    "(> 2147483620); cast to double")
                v
              }))
          case ShortType =>
            le(2)(_.putShort(
              if (r.isNullAt(i)) 32741.toShort else {
                val v = r.getShort(i)
                require(v <= 32740,
                  s"smallint value $v collides with dta missing codes")
                v
              }))
          case ByteType =>
            out.write(
              if (r.isNullAt(i)) 101 else {
                val v = r.getByte(i)
                require(v <= 100,
                  s"tinyint value $v collides with dta missing codes")
                v.toInt & 0xff
              })
          case _ => ()
        }
        i += 1
      }
    }
    w("</data>")
    mark("strls"); w("<strls></strls>")
    mark("vlabels"); w("<value_labels></value_labels>")
    mark("close"); w("</stata_dta>")
    mark("eof")
    val buf = out.toByteArray
    val bb = java.nio.ByteBuffer.wrap(buf)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val order = Seq("open", "map", "types", "names", "sortlist",
      "formats", "vlnames", "varlabels", "chars", "data", "strls",
      "vlabels", "close", "eof")
    order.zipWithIndex.foreach { case (nm, i) =>
      bb.putLong(mapPos + 8 * i, marks(nm))
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(file), buf)
    ()
  }
}

/** The WRITE side: each task writes one self-contained
  * `part-<pid>-<task>.dta` (full v118 header + its partition's rows)
  * under the target directory — a layout [[StataSource]] itself and
  * any per-file Stata reader (pandas included) read back directly.
  * Commit is write-to-final-name (single writer per distinct file
  * name; abort leaves no half-file because the bytes are assembled in
  * memory and written once). A .dta file is one fixed-width blob, so
  * the per-partition buffering this needs is exactly the working set
  * any Stata writer holds. */
private class StataBatchWrite(path: String,
    schema: org.apache.spark.sql.types.StructType, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    StataFormat.validateWriteSchema(schema)
    val dir = new java.io.File(path)
    require(dir.isDirectory || dir.mkdirs(), s"cannot create $path")
    if (truncate)
      Option(dir.listFiles).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".dta")).foreach(_.delete())
    // job-unique tag in the FINAL file names: without it an APPEND
    // write re-using the same partition ids silently REPLACED the
    // previous job's part files (data loss); replace-on-retry still
    // holds within one job because retried tasks share the tag+pid
    new StataWriterFactory(path, schema,
      java.util.UUID.randomUUID().toString.take(8))
  }
  override def commit(
      messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private class StataWriterFactory(path: String,
    schema: org.apache.spark.sql.types.StructType, jobTag: String)
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
        // empty partitions write no file (a zero-row .dta is legal but
        // useless; readers would still accept it). The FINAL name is
        // deterministic per (JOB, PARTITION) — no taskId — and landed
        // by atomic rename from a task-unique temp, so a retried/
        // speculated task replaces its predecessor's file instead of
        // duplicating rows, while a LATER append job (fresh jobTag)
        // adds files instead of clobbering this job's.
        if (buf.nonEmpty) {
          val tmp = f"$path/.part-$partitionId%05d-$jobTag-$taskId.dta.tmp"
          StataFormat.write(tmp, schema, buf.toSeq)
          val fin = f"$path/part-$partitionId%05d-$jobTag.dta"
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
