package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft-sas7bdat against the committed fixtures
  * (scripts/gen_sas7bdat_fixture.py) — every fixture is validated by
  * pandas.read_sas itself at generation time, so agreement here is
  * agreement with the reference's own reader, across the 32-bit
  * uncompressed, 32-bit SASYZCRL-compressed, and 64-bit mix-page
  * layouts. */
class SasFormatSpec extends SparkSpec {

  private val dir = "src/test/resources/graft/sources"

  private def twin() =
    spark.read.parquet(s"$dir/mixed_sas_twin.parquet")
      .orderBy("id").collect()

  private def checkAgainstTwin(file: String): Unit = {
    val got = spark.read.format("graft-sas7bdat").load(s"$dir/$file")
      .orderBy("id").collect()
    val exp = twin()
    assert(got.length === exp.length, s"$file: row count")
    assert(got.head.schema.fieldNames.toSeq ===
      Seq("id", "score", "ratio", "city", "tag"))
    got.zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
      (0 until 5).foreach { j =>
        val gv = if (g.isNullAt(j)) null else g.get(j)
        val ev = if (e.isNullAt(j)) null else e.get(j)
        assert(gv === ev, s"$file row $i col $j")
      }
    }
  }

  test("32-bit uncompressed: every cell matches the pandas-certified twin") {
    checkAgainstTwin("mixed.sas7bdat")
  }

  test("32-bit SASYZCRL: RLE rows decode to the same cells") {
    checkAgainstTwin("mixed_rle.sas7bdat")
  }

  test("64-bit mix-page layout: same cells through the u64 offsets") {
    checkAgainstTwin("mixed_u64.sas7bdat")
  }

  test("schema: numerics double, chars string, all nullable") {
    val sch = spark.read.format("graft-sas7bdat")
      .load(s"$dir/mixed.sas7bdat").schema
    assert(sch.map(f => (f.name, f.dataType.simpleString, f.nullable)) ===
      Seq(("id", "double", true), ("score", "double", true),
        ("ratio", "double", true), ("city", "string", true),
        ("tag", "string", true)))
  }

  test("missing semantics: NaN numerics and all-blank chars are null") {
    val df = spark.read.format("graft-sas7bdat").load(s"$dir/mixed.sas7bdat")
    // generator: score missing when id % 11 == 3, city '' when id % 5 == 2
    assert(df.where(col("score").isNull).count() ===
      (0 until 150).count(_ % 11 == 3))
    assert(df.where(col("city").isNull).count() ===
      (0 until 150).count(_ % 5 == 2))
  }

  test("column pruning reaches the scan leaf; one partition per file") {
    val df = spark.read.format("graft-sas7bdat")
      .load(s"$dir/mixed_rle.sas7bdat").select("city")
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    assert(scan.output.map(_.name) === Seq("city"), scan.toString)
    assert(df.rdd.getNumPartitions === 1)
    assert(df.where(col("city") === "tokyo").count() === 30)
  }

  test("directory fan-in: one partition per file, rows concatenate") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-sas-dir").toString
    for (f <- Seq("mixed.sas7bdat", "mixed_u64.sas7bdat"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/$f"),
        java.nio.file.Paths.get(s"$tmp/$f"))
    val df = spark.read.format("graft-sas7bdat").load(tmp)
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 300)
    graft.queries.StreamGate.deleteRecursively(tmp)
  }

  test("date/datetime formats surface as DATE and TIMESTAMP (pandas parity)") {
    val df = spark.read.format("graft-sas7bdat")
      .load(s"$dir/dates.sas7bdat")
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ===
      Seq(("k", "double"), ("event_date", "date"),
        ("when_ts", "timestamp"), ("note", "string")))
    val r0 = df.orderBy("k").select("event_date", "when_ts").head()
    // generator row 0: 20000 days / 1.9e9 s past 1960-01-01
    assert(r0.getDate(0).toString ===
      java.time.LocalDate.of(1960, 1, 1).plusDays(20000).toString)
    assert(r0.getTimestamp(1).toInstant ===
      java.time.LocalDate.of(1960, 1, 1).atStartOfDay(
        java.time.ZoneOffset.UTC).toInstant.plusSeconds(1900000000L))
    // missing dates stay null (generator: days null when k % 13 == 7)
    assert(df.where(col("event_date").isNull).count() ===
      (0 until 40).count(_ % 13 == 7))
  }

  test("clear errors: bad magic, big-endian, RDC compression") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-sas-err").toString
    val bad = s"$tmp/bad.sas7bdat"
    java.nio.file.Files.write(java.nio.file.Paths.get(bad),
      Array.fill[Byte](2048)(7))
    val e1 = intercept[Exception] {
      spark.read.format("graft-sas7bdat").load(bad).collect()
    }
    assert(e1.getMessage.contains("magic"), e1.getMessage)
    // flip a valid fixture to big-endian / RDC and expect clear errors
    val good = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/mixed.sas7bdat"))
    val be = good.clone(); be(37) = 0x00
    val beF = s"$tmp/be.sas7bdat"
    java.nio.file.Files.write(java.nio.file.Paths.get(beF), be)
    val e2 = intercept[Exception] {
      spark.read.format("graft-sas7bdat").load(beF).collect()
    }
    assert(e2.getMessage.contains("big-endian"), e2.getMessage)
    val rdc = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/mixed_rle.sas7bdat"))
    // the compression literal lives in the first column-text blob
    val idx = new String(rdc.map(_.toChar)).indexOf("SASYZCRL")
    assert(idx > 0)
    rdc(idx + 7) = '2'.toByte
    val rdcF = s"$tmp/rdc.sas7bdat"
    java.nio.file.Files.write(java.nio.file.Paths.get(rdcF), rdc)
    val e3 = intercept[Exception] {
      spark.read.format("graft-sas7bdat").load(rdcF).collect()
    }
    assert(e3.getMessage.contains("SASYZCR2"), e3.getMessage)
    graft.queries.StreamGate.deleteRecursively(tmp)
  }

  test("RLE decompressor: full command table round-trips") {
    // commands the committed fixture exercises are certified by pandas;
    // this pins the remaining table entries (copy17/33/49, repeat 0x40,
    // '@'-fill 0xD0) against the documented semantics
    def decTo(n: Int)(bytes: Int*): Array[Byte] =
      SasFormat.rleDecompress(bytes.map(_.toByte).toArray, 0,
        bytes.length, n)
    // 0x8: literal copy 1-16
    assert(decTo(3)(0x82, 'a', 'b', 'c').toSeq === "abc".getBytes.toSeq)
    // 0x9: literal copy 17+
    val lit17 = (0 until 17).map(i => ('a' + i % 26).toInt)
    assert(decTo(17)((0x90 +: lit17): _*).toSeq ===
      lit17.map(_.toByte).toSeq)
    // 0xA0: 33-byte copy
    val lit33 = (0 until 33).map(i => ('A' + i % 26).toInt)
    assert(decTo(33)((0xA0 +: lit33): _*).toSeq ===
      lit33.map(_.toByte).toSeq)
    // 0xB0: 49-byte copy
    val lit49 = (0 until 49).map(i => ('0' + i % 10).toInt)
    assert(decTo(49)((0xB0 +: lit49): _*).toSeq ===
      lit49.map(_.toByte).toSeq)
    // 0xC0: repeat next byte lo+3 times
    assert(decTo(5)(0xC2, 'x').toSeq === "xxxxx".getBytes.toSeq)
    // 0x40: repeat with the 16x + 18 long form
    assert(decTo(20)(0x40, 0x02, 'y').toSeq ===
      Array.fill(20)('y'.toByte).toSeq)
    // 0xD0: '@' fill lo+2
    assert(decTo(4)(0xD2).toSeq === "@@@@".getBytes.toSeq)
    // 0xE0/0xF0: blank/zero fill lo+2
    assert(decTo(3)(0xE1).toSeq === "   ".getBytes.toSeq)
    assert(decTo(2)(0xF0).toSeq === Array[Byte](0, 0).toSeq)
    // 0x60/0x70: long blank/zero runs (lo*256 + next + 17)
    assert(decTo(17)(0x60, 0x00).toSeq ===
      Array.fill(17)(' '.toByte).toSeq)
    assert(decTo(273)(0x71, 0x00).toSeq ===
      Array.fill(273)(0.toByte).toSeq)
    // 0x00: long literal copy (lo*256 + next + 64)
    val lit64 = (0 until 64).map(i => i + 1)
    assert(decTo(64)((Seq(0x00, 0x00) ++ lit64): _*).toSeq ===
      lit64.map(_.toByte).toSeq)
  }
}
