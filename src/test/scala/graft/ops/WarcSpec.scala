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
}
