package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Edges of the WARC parser (q355/q356 gate the fixture archives;
  * this pins hostile bytes and torn-tail semantics). */
class WarcSpec extends AnyFunSuite {

  private def rec(rtype: String, payload: String,
      extra: String = ""): String =
    s"WARC/1.0\r\nWARC-Type: $rtype\r\n$extra" +
      s"Content-Length: ${payload.length}\r\n\r\n$payload\r\n\r\n"

  test("torn tail yields the records before it; padding tolerated") {
    val good = rec("warcinfo", "k: v\r\n") + rec("metadata", "xyz")
    val torn = good + "WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 999\r\n\r\nshort"
    val got = Warc.parseRecords(torn.getBytes("ISO-8859-1"))
    assert(got.map(_.rec_type) === Seq("warcinfo", "metadata"))
  }

  test("hostile bytes return empty, never throw") {
    assert(Warc.parseRecords(Array.empty[Byte]).isEmpty)
    assert(Warc.parseRecords("HTTP/1.1 200 OK\r\n\r\n".getBytes).isEmpty)
    assert(Warc.parseRecords("WARC/1.0\r\nno end".getBytes).isEmpty)
    // content-length that is not a number
    assert(Warc.parseRecords(
      "WARC/1.0\r\nContent-Length: NaN\r\n\r\nx".getBytes).isEmpty)
    // corrupt gzip magic with garbage behind it
    assert(Warc.parseRecords(
      Array(0x1f, 0x8b, 0x00, 0x13, 0x37).map(_.toByte)).isEmpty)
  }

  test("response without an HTTP payload keeps the raw body") {
    val r = rec("response", "not http at all",
      "WARC-Target-URI: http://x/\r\n")
    val got = Warc.parseRecords(r.getBytes("ISO-8859-1"))
    assert(got.length === 1)
    assert(got.head.http_status === 0)
    assert(new String(got.head.body) === "not http at all")
    assert(got.head.url === "http://x/")
  }

  // ---- parseArchive: the observable-truncation contract (q361) ----

  test("parseArchive: clean archive is not truncated") {
    val s = Warc.parseArchive(
      (rec("warcinfo", "a") + rec("metadata", "b")).getBytes("ISO-8859-1"))
    assert(s.records.length === 2)
    assert(!s.truncated && s.reason === "")
  }

  test("parseArchive: malformed Content-Length KEEPS parsed records " +
    "and reports torn_tail (ADVICE r12: used to throw-and-drop-all)") {
    val blob = rec("warcinfo", "a") + rec("metadata", "b") +
      "WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: banana\r\n\r\npayload\r\n\r\n"
    val s = Warc.parseArchive(blob.getBytes("ISO-8859-1"))
    assert(s.records.map(_.rec_type) === Seq("warcinfo", "metadata"))
    assert(s.truncated && s.reason === "torn_tail")
  }

  test("parseArchive: record cap bites with bytes remaining") {
    val blob = (1 to 5).map(i => rec("metadata", s"m$i")).mkString
    val s = Warc.parseArchive(blob.getBytes("ISO-8859-1"),
      maxRecords = 3)
    assert(s.records.length === 3)
    assert(s.truncated && s.reason === "record_cap")
    // cap equal to the record count: clean, nothing dropped
    val s5 = Warc.parseArchive(blob.getBytes("ISO-8859-1"),
      maxRecords = 5)
    assert(s5.records.length === 5 && !s5.truncated)
  }

  test("parseArchive: gz inflate cap bites and is reported; " +
    "exact-fit stream is NOT flagged") {
    val blob = (1 to 4).map(i =>
      rec("metadata", "x" * 2000)).mkString.getBytes("ISO-8859-1")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(blob); gz.close()
    val capped = Warc.parseArchive(bos.toByteArray, maxInflate = 4096)
    assert(capped.truncated && capped.reason === "inflate_cap")
    assert(capped.records.length === 1) // only record 1 fits in 4096
    val exact = Warc.parseArchive(bos.toByteArray,
      maxInflate = blob.length)
    assert(exact.records.length === 4)
    assert(!exact.truncated, "exact-fit must not read as capped")
  }

  test("zstd container: hostile frames never throw; cap reported") {
    // zstd magic followed by garbage
    val junk = Array(0x28, 0xb5, 0x2f, 0xfd, 0x13, 0x37, 0x00)
      .map(_.toByte)
    val s = Warc.parseArchive(junk)
    assert(s.records.isEmpty && s.truncated && s.reason === "torn_tail")
    // a real frame past the cap reads as inflate_cap
    val blob = (1 to 4).map(_ =>
      rec("metadata", "z" * 2000)).mkString.getBytes("ISO-8859-1")
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new com.github.luben.zstd.ZstdOutputStream(bos)
    zout.write(blob); zout.close()
    val capped = Warc.parseArchive(bos.toByteArray, maxInflate = 4096)
    assert(capped.truncated && capped.reason === "inflate_cap")
    assert(capped.records.length === 1)
  }

  // ---- curatedPages charset-aware decode (q363 unit edges) ----

  test("decode per detected charset: latin-1 body survives, " +
    "utf-8-blind decode would mangle it") {
    def http(body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n")
        .getBytes("ISO-8859-1") ++ body
    val latin = "<p>café</p>".getBytes("ISO-8859-1")
    val payload = http(latin)
    val blob = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://x/\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n")
      .getBytes("ISO-8859-1") ++ payload ++
      "\r\n\r\n".getBytes("ISO-8859-1")
    val recs = Warc.parseArchive(blob).records
    assert(recs.length === 1)
    assert(EncodingDetect.detect(recs.head.body) === "latin-1")
  }
}
