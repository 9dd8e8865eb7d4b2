package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stata .dta and .xlsx DataSource V2 readers against the committed
  * fixtures (scripts/gen_source_fixtures.py; people.dta is written by
  * pandas itself, so agreement here is agreement with the reference's
  * own reader). */
class ForeignFormatSpec extends SparkSpec {

  private val dir = "src/test/resources/graft/sources"

  test("graft-stata: pandas-written v118 round-trips against the twin") {
    val dta = spark.read.format("graft-stata").load(s"$dir/people.dta")
    assert(dta.schema.map(f => (f.name, f.dataType.simpleString)) === Seq(
      ("pid", "int"), ("age", "smallint"), ("grp", "tinyint"),
      ("score", "double"), ("ratio", "float"), ("name", "string")))
    val twin = spark.read.parquet(s"$dir/people_twin.parquet")
    val a = dta.orderBy("pid").collect()
    val b = twin.orderBy("pid")
      .select(col("pid"), col("age").cast("smallint"),
        col("grp").cast("tinyint"), col("score"), col("ratio"),
        col("name")).collect()
    assert(a.length === 25)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
    // NaN in the pandas frame arrives as Stata missing -> SQL null
    assert(dta.where(col("score").isNull).select("pid").head().getInt(0) === 4)
    assert(dta.where(col("ratio").isNull).select("pid").head().getInt(0) === 8)
  }

  test("graft-stata: every numeric type's reserved missing code is null") {
    val dta = spark.read.format("graft-stata")
      .load(s"$dir/types_missing.dta").orderBy("l")
    val rows = dta.collect()
    assert(rows.length === 3)
    val mid = dta.where(col("s") === "").head()
    (0 until 5).foreach(i => assert(mid.isNullAt(i), s"col $i"))
    val first = dta.where(col("s") === "alpha").head()
    assert(first.getByte(0) === 1.toByte && first.getShort(1) === 100.toShort)
    assert(first.getInt(2) === 100000 && first.getFloat(3) === 1.5f)
    assert(first.getDouble(4) === 2.25)
    // boundary: max NON-missing values survive
    assert(dta.where(col("s") === "gamma").head().getDouble(4) === 1e10)
  }

  test("graft-stata: clear errors on non-dta and unsupported release") {
    val e = intercept[Exception] {
      spark.read.format("graft-stata")
        .load(s"$dir/sample.xlsx").collect()
    }
    assert(e.getMessage.contains("not a dta-118"))
  }

  test("graft-excel: header schema, shared+inline strings, empty cells") {
    val xl = spark.read.format("graft-excel").load(s"$dir/sample.xlsx")
    assert(xl.columns.toSeq === Seq("city", "pop", "note"))
    assert(xl.schema.forall(_.dataType ===
      org.apache.spark.sql.types.StringType))
    val rows = xl.orderBy("city").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq === Seq(
      ("Lagos", "14862000", "coastal"),
      ("Osaka", null, null),
      ("Paris", "2161000", "capital")))
  }

  test("column pruning reaches both scans (ReadSchema shrinks)") {
    val dta = spark.read.format("graft-stata").load(s"$dir/people.dta")
      .select("name")
    val scan = dta.queryExecution.executedPlan.collectLeaves().head
    assert(scan.output.map(_.name) === Seq("name"),
      scan.toString) // the SCAN itself is pruned, not a project above it
    assert(dta.collect().map(_.getString(0)).head.startsWith("person_"))
    val xl = spark.read.format("graft-excel").load(s"$dir/sample.xlsx")
      .select("pop")
    val xscan = xl.queryExecution.executedPlan.collectLeaves().head
    assert(xscan.output.map(_.name) === Seq("pop"), xscan.toString)
    assert(xl.collect().map(r => Option(r.getString(0))).toSet ===
      Set(Some("2161000"), Some("14862000"), None))
  }

  test("graft-stata write: round-trips values, nulls, and types exactly") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft-stata-write").toString
    val df = Seq(
      (1.toByte, 10.toShort, 100, 1.5f, 2.25, "alpha"),
      (2.toByte, 20.toShort, 200, -0.5f, 1e10, "bé"), // multibyte utf-8
      (3.toByte, 30.toShort, 300, 0f, 0d, ""))
      .toDF("b", "i", "l", "f", "d", "s")
      .select(col("b"), col("i"), col("l"), col("f"), col("d"),
        when(col("l") === 200, lit(null)).otherwise(col("s")).as("s"),
        when(col("l") === 300, lit(null).cast("double"))
          .otherwise(col("d")).as("dn"))
    df.write.format("graft-stata").mode("overwrite").save(out)
    val back = spark.read.format("graft-stata").load(out)
    // names and types round-trip; the reader is all-nullable by design
    // (any column CAN carry missing codes)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    val a = df.orderBy("l").collect()
    val b = back.orderBy("l").collect()
    // null string writes as "" (Stata has no missing string — the
    // pandas convention); everything else round-trips bit-exactly
    a.zip(b).foreach { case (x, y) =>
      (0 until 5).foreach(i => assert(x.get(i) === y.get(i)))
      assert(Option(x.getString(5)).getOrElse("") === y.getString(5))
      assert(x.isNullAt(6) === y.isNullAt(6))
      if (!x.isNullAt(6)) assert(x.getDouble(6) === y.getDouble(6))
    }
    // overwrite truncates prior part files
    df.limit(1).write.format("graft-stata").mode("overwrite").save(out)
    assert(spark.read.format("graft-stata").load(out).count() === 1)
    // unsupported types are rejected up front with an actionable error
    val e = intercept[Exception] {
      Seq((1L, "x")).toDF("big", "s").write
        .format("graft-stata").mode("overwrite").save(out)
    }
    assert(e.getMessage.contains("no 64-bit integer") ||
      Option(e.getCause).exists(_.getMessage.contains("no 64-bit integer")),
      e.toString)
    graft.queries.StreamGate.deleteRecursively(out)
  }

  test("graft-stata write: values in the reserved missing range fail loudly") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft-stata-range").toString
    val e = intercept[Exception] {
      Seq((3.0e38f, "x")).toDF("f", "s").write
        .format("graft-stata").mode("overwrite").save(out)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("reserved missing")),
      e.toString)
    graft.queries.StreamGate.deleteRecursively(out)
  }

  test("graft-excel: implicit cell refs and workbook-declared sheet order") {
    // hand-zip a workbook whose ONLY sheet part is sheet3.xml (the
    // original first sheets were deleted), declared first in
    // workbook.xml, with cells that OMIT the optional r attribute
    val dir = java.nio.file.Files
      .createTempDirectory("graft-xlsx-implicit").toString
    val f = s"$dir/implicit.xlsx"
    val zip = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(f))
    def put(name: String, body: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(body.getBytes("UTF-8")); zip.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/></Types>""")
    put("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Data" sheetId="3" r:id="rId9"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId9" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet3.xml"/></Relationships>""")
    put("xl/worksheets/sheet3.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row><c t="inlineStr"><is><t>k</t></is></c><c t="inlineStr"><is><t>v</t></is></c></row>""" +
        """<row><c t="inlineStr"><is><t>a</t></is></c><c><v>7</v></c></row>""" +
        """</sheetData></worksheet>""")
    zip.close()
    val xl = spark.read.format("graft-excel").load(f)
    assert(xl.columns.toSeq === Seq("k", "v"))
    val r = xl.head()
    assert(r.getString(0) === "a" && r.getString(1) === "7")
    graft.queries.StreamGate.deleteRecursively(dir)
  }

  test("graft-xpt: TS-140 fixture round-trips against the twin (IBM doubles)") {
    val xpt = spark.read.format("graft-xpt").load(s"$dir/mixed.xpt")
    assert(xpt.schema.map(f => (f.name, f.dataType.simpleString)) === Seq(
      ("ID", "double"), ("SCORE", "double"), ("CITY", "string")))
    val rows = xpt.orderBy("ID").collect()
    assert(rows.length === 5)
    // IBM->IEEE is exact for IEEE-written values: 0.1 comes back
    // bit-identical, 1e10 and -17.5 too; the '.' missing code is null
    assert(rows(0).getDouble(1) === 3.25 && rows(0).getString(2) === "Paris")
    assert(rows(1).getDouble(1) === 1e10 && rows(1).getString(2) === "")
    assert(rows(2).isNullAt(1) && rows(2).getString(2) === "Osaka")
    assert(rows(3).getDouble(1) === -17.5)
    assert(rows(4).getDouble(1) === 0.1 &&
      rows(4).getString(2) === "QuitoEcuad")
    val twin = spark.read.parquet(s"$dir/mixed_twin.parquet")
      .orderBy("ID").collect()
    rows.zip(twin).foreach { case (a, b) =>
      assert(a.getDouble(0) === b.getDouble(0))
      assert(a.isNullAt(1) === b.isNullAt(1))
      if (!a.isNullAt(1)) assert(a.getDouble(1) === b.getDouble(1))
      assert(a.getString(2) === b.getString(2))
    }
    // non-xpt input fails loudly
    val e = intercept[Exception] {
      spark.read.format("graft-xpt").load(s"$dir/people.dta").collect()
    }
    assert(e.getMessage.contains("not a SAS XPORT"), e.getMessage)
    // column pruning reaches the scan
    val pruned = spark.read.format("graft-xpt").load(s"$dir/mixed.xpt")
      .select("CITY")
    assert(pruned.queryExecution.executedPlan.collectLeaves()
      .head.output.map(_.name) === Seq("CITY"))
  }

  test("graft-excel: rich-text runs concatenate; rPh phonetics dropped") {
    // ADVICE r10: each </t> used to OVERWRITE the cell value, keeping
    // only the LAST run of a multi-run rich-text string; phonetic
    // <rPh> runs in sharedStrings were appended into the value.
    // pandas concatenates runs and drops phonetics — so do we.
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-xlsx-rich").toString
    val f = s"$tmp/rich.xlsx"
    val zip = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(f))
    def put(name: String, body: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(body.getBytes("UTF-8")); zip.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/></Types>""")
    put("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Data" sheetId="1" r:id="rId2"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/></Relationships>""")
    // shared string 0: two runs + a phonetic rPh block that must NOT
    // land in the value (pandas drops it)
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="1" uniqueCount="1">""" +
        """<si><r><t>To</t></r><r><t>kyo</t></r><rPh sb="0" eb="2"><t>トウキョウ</t></rPh><phoneticPr fontId="1"/></si>""" +
        """</sst>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><t>name</t></is></c><c r="B1" t="inlineStr"><is><t>note</t></is></c></row>""" +
        // B2: rich-text INLINE string with three runs -> "a-b-c"
        """<row r="2"><c r="A2" t="s"><v>0</v></c><c r="B2" t="inlineStr"><is><r><t>a-</t></r><r><t>b-</t></r><r><t>c</t></r></is></c></row>""" +
        """</sheetData></worksheet>""")
    zip.close()
    val xl = spark.read.format("graft-excel").load(f)
    val r = xl.head()
    assert(r.getString(0) === "Tokyo", s"shared rich-text: ${r.getString(0)}")
    assert(r.getString(1) === "a-b-c", s"inline rich-text: ${r.getString(1)}")
    graft.queries.StreamGate.deleteRecursively(tmp)
  }

  test("graft-excel: duplicate header names uniquify instead of aliasing") {
    // ADVICE r10: duplicate headers made the name->index map bind every
    // copy to the LAST sheet column, silently reading the wrong data
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-xlsx-dup").toString
    val f = s"$tmp/dup.xlsx"
    val zip = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(f))
    def put(name: String, body: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(body.getBytes("UTF-8")); zip.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/></Types>""")
    put("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Data" sheetId="1" r:id="rId2"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><t>x</t></is></c><c r="B1" t="inlineStr"><is><t>x</t></is></c><c r="C1" t="inlineStr"><is><t>x_1</t></is></c></row>""" +
        """<row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>2</v></c><c r="C2"><v>3</v></c></row>""" +
        """</sheetData></worksheet>""")
    zip.close()
    val xl = spark.read.format("graft-excel").load(f)
    // B1's duplicate "x" can't take "x_1" (taken by C1) -> "x_2"
    assert(xl.columns.toSeq === Seq("x", "x_2", "x_1"), xl.columns.toSeq)
    val r = xl.head()
    assert((r.getString(0), r.getString(1), r.getString(2)) ===
      (("1", "2", "3")), "each uniquified name reads its OWN column")
    graft.queries.StreamGate.deleteRecursively(tmp)
  }

  test("graft-stata write: append adds part files, never clobbers") {
    // ADVICE r10: deterministic part-NNNNN names made a second append
    // job silently REPLACE the first job's files
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-dta-append").toString
    val path = s"$tmp/out"
    Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1)
      .write.format("graft-stata").mode("append").save(path)
    Seq((3, "c")).toDF("k", "v").coalesce(1)
      .write.format("graft-stata").mode("append").save(path)
    val back = spark.read.format("graft-stata").load(path)
    assert(back.count() === 3, "append must ADD rows, not replace files")
    assert(back.select("k").as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
    // overwrite still truncates to exactly the new rows
    Seq((9, "z")).toDF("k", "v").coalesce(1)
      .write.format("graft-stata").mode("overwrite").save(path)
    assert(spark.read.format("graft-stata").load(path).count() === 1)
    graft.queries.StreamGate.deleteRecursively(tmp)
  }

  test("both sources register by short name and plan one partition per file") {
    // a directory of one file still resolves, and the scan is one
    // partition per file (the many-files parallelism contract)
    val dta = spark.read.format("graft-stata").load(s"$dir/people.dta")
    assert(dta.rdd.getNumPartitions === 1)
    assert(ExcelFormat.colIndex("A1") === 0)
    assert(ExcelFormat.colIndex("Z9") === 25)
    assert(ExcelFormat.colIndex("AA3") === 26)
    assert(ExcelFormat.colIndex("BC12") === 54)
  }
}
