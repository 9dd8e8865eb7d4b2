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

/** Native SAS Transport (XPORT v5, `.xpt`) reader as a DataSource V2 —
  * the DOCUMENTED SAS interchange format (SAS Technical Note TS-140),
  * closing the readable half of the reference's SAS surface
  * (`pandas.read_sas(format="xport")`; the proprietary sas7bdat stays
  * waived — its layout is reverse-engineered, not published).
  *
  *   spark.read.format("graft-xpt").load("data.xpt")   // or a dir
  *
  * Layout: 80-byte records; ASCII LIBRARY/MEMBER/NAMESTR/OBS header
  * cards; one 140-byte NAMESTR struct per variable (type, length,
  * name, position); observation rows packed back-to-back after the
  * OBS card — numerics as 8-byte big-endian IBM System/360 doubles
  * (sign bit, 7-bit base-16 exponent biased 64, 56-bit fraction),
  * chars space-padded; the data section space-padded to an 80-byte
  * boundary. Numeric missing: first byte '.'/'_'/'A'..'Z', rest zero.
  * Char fields are right-trimmed (the SAS semantic).
  *
  * Row-count rule: floor(datalen / rowWidth), then trailing rows that
  * are ENTIRELY spaces are dropped (the TS-140 padding). This is
  * EXACT where pandas' heuristic (blank 8-byte words of the last
  * card) can eat a real final row whose char fields end in spaces.
  *
  * Scale design: same as [[StataSource]] — one InputPartition per
  * file, schema from one header read, zero extra dependencies. */
class XptSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-xpt"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    XptFormat.readSchema(XptFormat.resolveFiles(options.get("path")).head)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new XptTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = false
}

private class XptTable(path: String, schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-xpt($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
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
            XptFormat.resolveFiles(path)
              .map(f => XptPartition(f): InputPartition).toArray
          override def createReaderFactory(): PartitionReaderFactory =
            new XptReaderFactory(required)
        }
      }
    }
}

private case class XptPartition(file: String) extends InputPartition

private class XptReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = XptFormat
      .readRows(partition.asInstanceOf[XptPartition].file, schema)
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

object XptFormat {

  def resolveFiles(path: String): Seq[String] = {
    require(path != null, "graft-xpt needs a path")
    val f = new java.io.File(path)
    require(f.exists, s"no such file or directory: $path")
    if (f.isFile) Seq(f.getPath)
    else {
      val fs = Option(f.listFiles).getOrElse(Array.empty)
        .filter(x => x.isFile && x.getName.endsWith(".xpt"))
        .map(_.getPath).sorted.toSeq
      require(fs.nonEmpty, s"no .xpt files under: $path")
      fs
    }
  }

  private final case class Var(name: String, isChar: Boolean,
      len: Int, pos: Int)
  private final case class Header(vars: Seq[Var], dataOff: Int)

  /** 8-byte big-endian IBM S/360 double → IEEE, or null for the
    * missing codes ('.', '_', 'A'-'Z' followed by zeros). Exact for
    * every value an IEEE writer produced (56-bit IBM fraction holds
    * the 53-bit IEEE mantissa losslessly; scalb is a pure
    * power-of-two rescale). */
  private[sources] def ibmToIeee(b: Array[Byte], off: Int): Any = {
    val b0 = b(off) & 0xff
    var frac = 0L
    var i = 1
    while (i < 8) { frac = (frac << 8) | (b(off + i) & 0xffL); i += 1 }
    if (frac == 0L) {
      if (b0 == 0) return java.lang.Double.valueOf(0.0)
      val c = b0 & 0x7f
      if (b0 == '.'.toInt || b0 == '_'.toInt ||
        (c >= 'A'.toInt && c <= 'Z'.toInt) || b0 == 0x2e) return null
      return java.lang.Double.valueOf(0.0) // denormal zero fraction
    }
    val sign = if ((b0 & 0x80) != 0) -1.0 else 1.0
    val exp16 = (b0 & 0x7f) - 64
    java.lang.Double.valueOf(
      sign * Math.scalb(frac.toDouble, 4 * exp16 - 56))
  }

  private def parseHeader(bytes: Array[Byte], file: String): Header = {
    def card(i: Int): String =
      new String(bytes, i * 80, 80, java.nio.charset.StandardCharsets.US_ASCII)
    require(bytes.length >= 80 * 10 && card(0).startsWith(
      "HEADER RECORD*******LIBRARY HEADER RECORD"),
      s"$file: not a SAS XPORT (v5) transport file")
    val nCards = bytes.length / 80
    val nsIdx = (0 until nCards).find(i =>
      card(i).startsWith("HEADER RECORD*******NAMESTR HEADER RECORD"))
      .getOrElse(throw new IllegalArgumentException(
        s"$file: no NAMESTR header card"))
    val nvars = card(nsIdx).substring(54, 58).trim.toInt
    require(nvars >= 1 && nvars <= 9999, s"$file: bad variable count $nvars")
    val nsOff = (nsIdx + 1) * 80
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    val vars = (0 until nvars).map { v =>
      val o = nsOff + 140 * v
      val ntype = bb.getShort(o).toInt
      val nlng = bb.getShort(o + 4).toInt
      val name = new String(bytes, o + 8, 8,
        java.nio.charset.StandardCharsets.US_ASCII).trim
      val npos = bb.getInt(o + 84)
      require(ntype == 1 || ntype == 2,
        s"$file: variable '$name' has unknown NAMESTR type $ntype")
      require(ntype != 1 || (nlng >= 2 && nlng <= 8),
        s"$file: numeric '$name' has width $nlng (2-8 allowed)")
      Var(name, ntype == 2, nlng, npos)
    }.sortBy(_.pos)
    val obsIdx = (nsIdx until nCards).find(i =>
      card(i).startsWith("HEADER RECORD*******OBS     HEADER RECORD"))
      .getOrElse(throw new IllegalArgumentException(
        s"$file: no OBS header card"))
    Header(vars, (obsIdx + 1) * 80)
  }

  def readSchema(file: String): StructType = {
    val h = parseHeader(readAll(file), file)
    StructType(h.vars.map(v => StructField(v.name,
      if (v.isChar) StringType else DoubleType, nullable = true)))
  }

  private def readAll(file: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file))

  def readRows(file: String, schema: StructType): Iterator[InternalRow] = {
    val bytes = readAll(file)
    val h = parseHeader(bytes, file)
    val byName = h.vars.map(v => v.name -> v).toMap
    val cols = schema.fieldNames.map { n =>
      byName.getOrElse(n, throw new IllegalArgumentException(
        s"$file: requested column '$n' not in the file " +
          s"(${h.vars.map(_.name).mkString(",")})"))
    }
    val rowWidth = h.vars.map(_.len).sum
    val dataLen = bytes.length - h.dataOff
    require(rowWidth > 0, s"$file: zero row width")
    var n = dataLen / rowWidth
    def rowBlank(r: Long): Boolean = {
      val base = h.dataOff + r * rowWidth
      (0 until rowWidth).forall(i => bytes(base.toInt + i) == ' '.toByte)
    }
    while (n > 0 && rowBlank(n - 1)) n -= 1 // TS-140 space padding

    // a numeric may be SHORT (2-7 bytes): pad with zero bytes to 8
    val scratch = new Array[Byte](8)
    new Iterator[InternalRow] {
      private var r = 0L
      override def hasNext: Boolean = r < n
      override def next(): InternalRow = {
        val base = (h.dataOff + r * rowWidth).toInt
        val vals = new Array[Any](cols.length)
        var ci = 0
        while (ci < cols.length) {
          val v = cols(ci)
          val off = base + v.pos
          vals(ci) =
            if (v.isChar) {
              var end = off + v.len
              while (end > off && bytes(end - 1) == ' '.toByte) end -= 1
              UTF8String.fromBytes(bytes, off, end - off)
            } else if (v.len == 8) ibmToIeee(bytes, off)
            else {
              java.util.Arrays.fill(scratch, 0.toByte)
              System.arraycopy(bytes, off, scratch, 0, v.len)
              ibmToIeee(scratch, 0)
            }
          ci += 1
        }
        r += 1
        new GenericInternalRow(vals)
      }
    }
  }
}
