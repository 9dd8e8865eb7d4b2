package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record parsing — the container format of the web
  * corpora that actually feed LLM training pipelines (Common Crawl
  * ships ~100 TB-scale .warc.gz). This is the ingestion front door
  * that [[HtmlExtract]] / [[EncodingDetect]] / the dedup family sit
  * behind; q355 gates record enumeration, q356 gates the composed
  * WARC → HTTP body → HTML → text pipeline end-to-end.
  *
  * Subset spec (the fixtures are generated to it by
  * scripts/gen_warc_fixture.py, stdlib-only, no shared code):
  *  - A record is `WARC/1.0\r\n`, header lines `Name: value\r\n`
  *    (names case-insensitive) up to a blank line, then EXACTLY
  *    `Content-Length` payload bytes, then `\r\n\r\n`.
  *  - `.warc.gz` inputs (magic 1F 8B) inflate through the JDK's
  *    GZIPInputStream, which consumes CONCATENATED members — the
  *    per-record-gzipped layout Common Crawl uses.
  *  - For `response` records the payload is an HTTP/1.x message:
  *    status parsed from the status line, `Content-Type` from the
  *    HTTP headers (parameters after ';' dropped, lowercased), body
  *    after the first CRLFCRLF.
  *  - Records without a parsable structure stop the scan (a torn
  *    tail yields the records before it); caps: 100k records, 64 MiB
  *    inflated — hostile-bytes safe, never an exception.
  */
object Warc {

  /** One parsed record; http fields are meaningful for `response`. */
  final case class WarcRecord(
      rec_idx: Int, rec_type: String, url: String, http_status: Int,
      content_type: String, body: Array[Byte])

  /** Parse a .warc or .warc.gz blob into its records. */
  def parseRecords(blob: Array[Byte]): Seq[WarcRecord] =
    try parseImpl(gunzipIfNeeded(blob))
    catch { case _: Exception => Seq.empty }

  private def gunzipIfNeeded(b: Array[Byte]): Array[Byte] = {
    if (b.length < 2 || (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b)
      return b
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val out = new java.io.ByteArrayOutputStream(b.length * 4)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0 && out.size < (64 << 20)) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } finally in.close()
  }

  private def parseImpl(b: Array[Byte]): Seq[WarcRecord] = {
    val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var idx = 0
    while (pos < s.length && idx < 100000) {
      // tolerate inter-record padding
      while (pos < s.length &&
        (s.charAt(pos) == '\r' || s.charAt(pos) == '\n')) pos += 1
      if (pos >= s.length) return out.result()
      if (!s.regionMatches(pos, "WARC/", 0, 5)) return out.result()
      val hdrEnd = s.indexOf("\r\n\r\n", pos)
      if (hdrEnd < 0) return out.result()
      val headers = parseHeaders(s.substring(pos, hdrEnd))
      val len = headers.getOrElse("content-length", "-1").trim.toLong
      val bodyStart = hdrEnd + 4
      if (len < 0 || bodyStart + len > s.length) return out.result()
      val recType = headers.getOrElse("warc-type", "")
      val url = headers.getOrElse("warc-target-uri", "")
      var status = 0
      var ctype = ""
      var payload = java.util.Arrays.copyOfRange(
        b, bodyStart, bodyStart + len.toInt)
      if (recType == "response") {
        val ps =
          new String(payload, java.nio.charset.StandardCharsets.ISO_8859_1)
        if (ps.startsWith("HTTP/")) {
          val lineEnd = ps.indexOf("\r\n")
          if (lineEnd > 0) {
            val parts = ps.substring(0, lineEnd).split(" ")
            if (parts.length >= 2)
              status = parts(1).toIntOption.getOrElse(0)
            val he = ps.indexOf("\r\n\r\n")
            if (he >= 0) {
              val hh = parseHeaders(ps.substring(lineEnd + 2, he))
              ctype = hh.getOrElse("content-type", "")
                .split(";")(0).trim.toLowerCase
              payload = java.util.Arrays.copyOfRange(
                payload, he + 4, payload.length)
            }
          }
        }
      }
      out += WarcRecord(idx, recType, url, status, ctype, payload)
      idx += 1
      pos = bodyStart + len.toInt
    }
    out.result()
  }

  private def parseHeaders(h: String): Map[String, String] =
    h.split("\r\n").iterator.flatMap { line =>
      val c = line.indexOf(':')
      if (c <= 0) None
      else Some(line.substring(0, c).trim.toLowerCase ->
        line.substring(c + 1).trim)
    }.toMap

  /** Flat record table over a binary column of WARC(.gz) blobs —
    * map-only; each task parses its own archives, nothing but the
    * (small) record metadata and bodies cross into the plan. */
  final case class WarcRow(
      id: Long, rec_idx: Int, rec_type: String, url: String,
      http_status: Int, content_type: String, body_len: Long)

  def records(df: DataFrame, idCol: String,
      binCol: String): Dataset[WarcRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseRecords(Option(bytes).getOrElse(Array.empty)).map(r =>
            WarcRow(id, r.rec_idx, r.rec_type, r.url, r.http_status,
              r.content_type, r.body.length.toLong))
        }
      }
  }

  /** The composed front end: WARC(.gz) → 200-status text/html
    * response bodies → [[HtmlExtract.extractText]] → one row per
    * page. What a Common Crawl ingestion stage actually does, as one
    * map-only operator. */
  final case class WarcPage(
      id: Long, rec_idx: Int, url: String, text: String, n_links: Int)

  def htmlPages(df: DataFrame, idCol: String,
      binCol: String): Dataset[WarcPage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseRecords(Option(bytes).getOrElse(Array.empty))
            .filter(r => r.rec_type == "response" &&
              r.http_status == 200 && r.content_type == "text/html")
            .map { r =>
              val html = new String(r.body,
                java.nio.charset.StandardCharsets.UTF_8)
              val (text, links) = HtmlExtract.extractText(html)
              WarcPage(id, r.rec_idx, r.url, text, links)
            }
        }
      }
  }
}
