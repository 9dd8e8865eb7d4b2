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

  override def supportsExternalMetadata(): Boolean = false
}

private class StataTable(path: String, schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-stata($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
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
    val fileCols = schema.fieldNames.map { n =>
      byName.getOrElse(n, throw new IllegalArgumentException(
        s"$file: requested column '$n' not in the file " +
          s"(${h.names.mkString(",")})"))
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
}
