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

/** Native `.xlsx` reader as a DataSource V2 — with [[StataSource]],
  * closes part of the reference's legacy-format surface (pandas
  * `read_excel`) that SURVEY §2.1 previously waived.
  *
  *   spark.read.format("graft-excel").load("book.xlsx")   // or a dir
  *
  * An xlsx workbook is a ZIP of ECMA-376 SpreadsheetML XML parts —
  * java.util.zip + StAX read it with zero extra dependencies. Scope:
  * the FIRST worksheet; row 1 is the header; every cell surfaces as a
  * STRING column (shared-string `t="s"`, inline `t="inlineStr"`,
  * boolean and raw numeric text alike — the csv-without-inferSchema
  * contract: parsing to types is the caller's cast, where engine
  * semantics stay explicit). Absent/empty cells are SQL nulls.
  * Formulas surface their cached `<v>` result, like pandas.
  *
  * Scale design: one InputPartition per FILE (a ZIP has no internal
  * split points; parallelism is the many-files layout). The sheet
  * part is parsed with StAX in one pass and materialized PER FILE
  * (sheet bytes + one sparse row map each — the per-file working set
  * any xlsx reader holds; memory is O(file), parallelism and scale
  * come from many files, not from splitting one).
  */
class ExcelSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-excel"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ExcelFormat.readSchema(ExcelFormat.resolveFiles(options.get("path")).head)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ExcelTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = false
}

private class ExcelTable(path: String, schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-excel($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    // column pruning: only the projected columns are materialized from
    // the parsed rows (the XML row scan itself is unavoidable — a ZIP
    // stream has no columnar layout — but per-row allocation shrinks)
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
            ExcelFormat.resolveFiles(path)
              .map(f => ExcelPartition(f): InputPartition).toArray
          override def createReaderFactory(): PartitionReaderFactory =
            new ExcelReaderFactory(required)
        }
      }
    }
}

private case class ExcelPartition(file: String) extends InputPartition

private class ExcelReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = ExcelFormat
      .readRows(partition.asInstanceOf[ExcelPartition].file, schema)
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

object ExcelFormat {

  def resolveFiles(path: String): Seq[String] = {
    require(path != null, "graft-excel needs a path")
    val f = new java.io.File(path)
    require(f.exists, s"no such file or directory: $path")
    if (f.isFile) Seq(f.getPath)
    else {
      val fs = Option(f.listFiles).getOrElse(Array.empty)
        .filter(x => x.isFile && x.getName.endsWith(".xlsx"))
        .map(_.getPath).sorted.toSeq
      require(fs.nonEmpty, s"no .xlsx files under: $path")
      fs
    }
  }

  /** "B7" → 0-based column index 1. */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    require(acc >= 1, s"bad cell ref: $ref")
    acc - 1
  }

  /** Parse the first worksheet into (headerRow, dataRows) of sparse
    * (colIndex, text) cells. */
  private def parseSheet(file: String)
      : (Map[Int, String], Iterator[Map[Int, String]]) = {
    val zip = new java.util.zip.ZipFile(file)
    def entryBytes(name: String): Option[Array[Byte]] =
      Option(zip.getEntry(name)).map { e =>
        val in = zip.getInputStream(e)
        try in.readAllBytes() finally in.close()
      }
    try {
      val shared: IndexedSeq[String] =
        entryBytes("xl/sharedStrings.xml").map(parseShared)
          .getOrElse(IndexedSeq.empty)
      // the FIRST sheet is the one workbook.xml DECLARES first (sheet
      // parts can be renumbered by deletions — sheet2.xml may be the
      // only part while the workbook lists it first); fall back to the
      // lowest-numbered part only when the workbook metadata is absent
      val sheetName = firstSheetPart(entryBytes).getOrElse {
        (1 to 64).view
          .map(i => s"xl/worksheets/sheet$i.xml")
          .find(zip.getEntry(_) != null)
          .getOrElse(throw new IllegalArgumentException(
            s"$file: no xl/worksheets/sheetN.xml part — not an xlsx workbook"))
      }
      val sheet = entryBytes(sheetName).getOrElse(
        throw new IllegalArgumentException(
          s"$file: workbook declares missing sheet part $sheetName"))
      val rows = parseRows(sheet, shared)
      if (rows.isEmpty)
        throw new IllegalArgumentException(s"$file: empty worksheet")
      (rows.head, rows.iterator.drop(1))
    } finally zip.close()
  }

  /** Resolve the workbook's FIRST declared sheet to its zip part via
    * workbook.xml (sheet order + r:id) and workbook.xml.rels (r:id →
    * target). None when either metadata part is absent/unparsable. */
  private def firstSheetPart(
      entryBytes: String => Option[Array[Byte]]): Option[String] =
    try {
      for {
        wb <- entryBytes("xl/workbook.xml")
        rels <- entryBytes("xl/_rels/workbook.xml.rels")
        rid <- {
          val rd = javax.xml.stream.XMLInputFactory.newFactory()
            .createXMLStreamReader(new java.io.ByteArrayInputStream(wb))
          var found: Option[String] = None
          while (found.isEmpty && rd.hasNext) {
            if (rd.next() ==
                javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
                rd.getLocalName == "sheet")
              found = Option(rd.getAttributeValue(
                "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
                "id"))
          }
          rd.close(); found
        }
        target <- {
          val rd = javax.xml.stream.XMLInputFactory.newFactory()
            .createXMLStreamReader(new java.io.ByteArrayInputStream(rels))
          var found: Option[String] = None
          while (found.isEmpty && rd.hasNext) {
            if (rd.next() ==
                javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
                rd.getLocalName == "Relationship" &&
                rd.getAttributeValue(null, "Id") == rid)
              found = Option(rd.getAttributeValue(null, "Target"))
          }
          rd.close(); found
        }
      } yield
        if (target.startsWith("/")) target.stripPrefix("/")
        else "xl/" + target
    } catch { case _: Exception => None }

  private def parseShared(bytes: Array[Byte]): IndexedSeq[String] = {
    val rd = javax.xml.stream.XMLInputFactory.newFactory()
      .createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val out = IndexedSeq.newBuilder[String]
    var cur: StringBuilder = null
    var inT = false
    var inRph = false // phonetic <rPh>/<phoneticPr> runs are NOT part of
    // the string value (pandas/read_excel drops them too)
    while (rd.hasNext) {
      rd.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          rd.getLocalName match {
            case "si" => cur = new StringBuilder
            case "rPh" => inRph = true
            case "t" if !inRph => inT = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT =>
          cur.append(rd.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          rd.getLocalName match {
            case "t" => inT = false
            case "rPh" => inRph = false
            case "si" => out += cur.toString
            case _ =>
          }
        case _ =>
      }
    }
    rd.close()
    out.result()
  }

  private def parseRows(bytes: Array[Byte],
      shared: IndexedSeq[String]): Vector[Map[Int, String]] = {
    val rd = javax.xml.stream.XMLInputFactory.newFactory()
      .createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val rows = Vector.newBuilder[Map[Int, String]]
    var row: scala.collection.mutable.Map[Int, String] = null
    var cellCol = -1
    var lastCol = -1 // implicit position: c/@r is OPTIONAL in ECMA-376
    var cellType = ""
    // accumulated across ALL <v>/<t> runs of ONE cell: a rich-text
    // inline string (<is><r><t>a</t></r><r><t>b</t></r></is>) is the
    // concatenation of its runs (pandas parity) — resolving per-</t>
    // kept only the last run
    var cellText: StringBuilder = null
    var sawText = false
    var collecting = false
    var inRph = false // phonetic runs are not part of the value
    while (rd.hasNext) {
      rd.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          rd.getLocalName match {
            case "row" =>
              row = scala.collection.mutable.Map.empty
              lastCol = -1
            case "c" =>
              cellCol = Option(rd.getAttributeValue(null, "r"))
                .map(colIndex).getOrElse(lastCol + 1)
              lastCol = cellCol
              cellType = Option(rd.getAttributeValue(null, "t")).getOrElse("")
              cellText = new StringBuilder
              sawText = false
            case "rPh" => inRph = true
            case "v" | "t" if cellCol >= 0 && !inRph =>
              sawText = true; collecting = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if collecting =>
          cellText.append(rd.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          rd.getLocalName match {
            case "v" | "t" => collecting = false
            case "rPh" => inRph = false
            case "c" =>
              if (cellCol >= 0 && row != null && sawText) {
                val s = cellText.toString
                val resolved =
                  if (cellType == "s") shared(s.trim.toInt) else s
                row.update(cellCol, resolved)
              }
              cellCol = -1
            case "row" => rows += row.toMap; row = null
            case _ =>
          }
        case _ =>
      }
    }
    rd.close()
    rows.result()
  }

  /** Final column names in sheet-column order: header cells, `_cN` for
    * gaps, and DUPLICATE header names uniquified csv-style (name,
    * name_1, name_2, ... skipping any suffix already taken) — without
    * this, readRows' name→index map silently bound every duplicate to
    * the LAST sheet column. One function, used by BOTH readSchema and
    * readRows, so the mapping can't diverge. */
  private def columnNames(header: Map[Int, String]): IndexedSeq[String] = {
    val raw = (0 to header.keys.max).map(i => header.getOrElse(i, s"_c$i"))
    val taken = scala.collection.mutable.Set.empty[String]
    raw.map { n =>
      val name =
        if (!taken.contains(n)) n
        else Iterator.from(1).map(k => s"${n}_$k")
          .find(c => !taken.contains(c) && !raw.contains(c)).get
      taken += name
      name
    }
  }

  def readSchema(file: String): StructType = {
    val (header, _) = parseSheet(file)
    require(header.nonEmpty, s"$file: empty header row")
    StructType(columnNames(header)
      .map(c => StructField(c, StringType, nullable = true)))
  }

  def readRows(file: String, schema: StructType): Iterator[InternalRow] = {
    val (header, data) = parseSheet(file)
    // `schema` may be a pruned subset: map each requested field back to
    // its sheet column index through the (uniquified) header row
    val byName: Map[String, Int] =
      if (header.isEmpty) Map.empty
      else columnNames(header).zipWithIndex.toMap
    val srcCols = schema.fieldNames.map { n =>
      byName.getOrElse(n, throw new IllegalArgumentException(
        s"$file: requested column '$n' not in the header row"))
    }
    data.map { cells =>
      val vals = new Array[Any](srcCols.length)
      var i = 0
      while (i < srcCols.length) {
        vals(i) = cells.get(srcCols(i)).map(UTF8String.fromString).orNull
        i += 1
      }
      new GenericInternalRow(vals)
    }
  }
}
