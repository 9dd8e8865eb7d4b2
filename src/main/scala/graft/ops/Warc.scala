package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record parsing — the container format of the web
  * corpora that actually feed LLM training pipelines (Common Crawl
  * ships ~100 TB-scale .warc.gz). This is the ingestion front door
  * that [[HtmlExtract]] / [[EncodingDetect]] / the dedup family sit
  * behind; q355 gates record enumeration, q356 gates the composed
  * WARC → HTTP body → HTML → text pipeline end-to-end, q361 gates the
  * truncation LEDGER (every cap observable per archive).
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
  *    tail — INCLUDING a non-numeric Content-Length — yields the
  *    records before it); hostile-bytes safe, never an exception.
  *
  * Scale caps and the PER-TASK HEAP CONTRACT: one archive is parsed
  * per input row, entirely in one task. Peak heap per archive ≈
  * compressed blob + `maxInflate` inflated bytes + the record body
  * copies (≤ inflated size) — the parse walks the BYTE ARRAY directly
  * (headers decode only their own small slices; there is NO full-blob
  * String copy). A real Common Crawl archive is ~1 GB compressed /
  * several GB inflated, so a deployment MUST size `maxInflate` (and
  * executor memory) to its archives or pre-split them; the default
  * 64 MiB is a hostile-bytes guard, not a capacity claim. Every cap
  * is OBSERVABLE: when one bites, the scan stops and the archive's
  * [[ledger]] row says so (`truncated`, `reason`) — same discipline
  * as the dHash/SimHash/LSH skipped-band ledgers, no silent drops.
  */
object Warc {

  /** Default inflate cap: hostile-bytes guard (zip bombs), not a
    * capacity claim — see the heap contract in the object scaladoc. */
  val DefaultMaxInflate: Int = 64 << 20
  /** Default record-count cap per archive. */
  val DefaultMaxRecords: Int = 100000

  /** One parsed record; http fields are meaningful for `response`. */
  final case class WarcRecord(
      rec_idx: Int, rec_type: String, url: String, http_status: Int,
      content_type: String, body: Array[Byte])

  /** A full archive scan: the records plus the truncation facts a
    * silent-cap-free pipeline needs. `reason` is "" (clean),
    * "inflate_cap" (gzip stream had more data past `maxInflate`),
    * "record_cap" (`maxRecords` hit with bytes remaining), or
    * "torn_tail" (structural corruption — including a malformed
    * Content-Length — stopped the scan before end-of-archive). */
  final case class WarcScan(
      records: Seq[WarcRecord], truncated: Boolean, reason: String,
      bytesScanned: Long, bytesInflated: Long)

  /** Parse a .warc or .warc.gz blob into records (compat shim over
    * [[parseArchive]]; callers that must not drop data silently read
    * the scan's `truncated` flag instead). */
  def parseRecords(blob: Array[Byte]): Seq[WarcRecord] =
    parseArchive(blob).records

  /** Parse with observable truncation. Never throws on hostile bytes:
    * undecodable input yields zero records with reason "torn_tail". */
  def parseArchive(blob: Array[Byte],
      maxInflate: Int = DefaultMaxInflate,
      maxRecords: Int = DefaultMaxRecords): WarcScan =
    try {
      val (b, inflateCapped) = decompressIfNeeded(blob, maxInflate)
      // a non-empty compressed container decoding to ZERO bytes is a
      // corrupt frame the decoder swallowed (zstd continuous mode
      // EOFs on garbage instead of throwing) — flag it, don't report
      // a clean empty archive
      if (b.isEmpty && blob.nonEmpty)
        WarcScan(Seq.empty, truncated = true, "torn_tail", 0L, 0L)
      else parseImpl(b, inflateCapped, maxRecords)
    } catch {
      case _: Exception =>
        WarcScan(Seq.empty, truncated = true, "torn_tail", 0L, 0L)
    }

  /** Container sniff: gzip (1F 8B) and zstd (28 B5 2F FD — the
    * .warc.zst layout of the IIPC spec; concatenated frames supported
    * via the decoder's continuous mode) inflate under the same cap
    * contract; anything else passes through. */
  private def decompressIfNeeded(b: Array[Byte],
      maxInflate: Int): (Array[Byte], Boolean) = {
    if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b)
      return gunzipIfNeeded(b, maxInflate)
    if (b.length >= 4 && (b(0) & 0xff) == 0x28 && (b(1) & 0xff) == 0xb5 &&
      (b(2) & 0xff) == 0x2f && (b(3) & 0xff) == 0xfd) {
      val in = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(b))
      in.setContinuous(true) // concatenated frames (per-record layout)
      try return readCapped(in, b.length, maxInflate)
      finally in.close()
    }
    (b, false)
  }

  /** Inflate a gzip blob up to `maxInflate`; second element is true
    * when the stream had MORE data past the cap (the observable bite).
    * Non-gzip input passes through uncapped (its length is already the
    * task's input size — there is nothing to bound). */
  private def gunzipIfNeeded(b: Array[Byte],
      maxInflate: Int): (Array[Byte], Boolean) = {
    if (b.length < 2 || (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b)
      return (b, false)
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    try readCapped(in, b.length, maxInflate)
    finally in.close()
  }

  /** Drain a decompressor stream up to `maxInflate`; second element is
    * true when the stream held MORE data past the cap. */
  private def readCapped(in: java.io.InputStream, hint: Int,
      maxInflate: Int): (Array[Byte], Boolean) = {
    val out = new java.io.ByteArrayOutputStream(
      math.min(math.max(hint * 4, 1024), maxInflate))
    val buf = new Array[Byte](8192)
    var capped = false
    var n = in.read(buf)
    while (n >= 0 && !capped) {
      val room = maxInflate - out.size
      if (n <= room) { out.write(buf, 0, n); n = in.read(buf) }
      else { out.write(buf, 0, room); capped = true }
    }
    (out.toByteArray, capped)
  }

  // -------- byte-level scanning helpers (no full-String copy) --------

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val n = b.length
    while (i + 3 < n) {
      if (b(i) == '\r' && b(i + 1) == '\n' &&
        b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private def startsWithAscii(b: Array[Byte], pos: Int,
      s: String): Boolean = {
    if (pos + s.length > b.length) return false
    var i = 0
    while (i < s.length) {
      if ((b(pos + i) & 0xff) != s.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Decode ONLY the [from, until) header slice — the small part. */
  private def sliceAscii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from,
      java.nio.charset.StandardCharsets.ISO_8859_1)

  private def parseImpl(b: Array[Byte], inflateCapped: Boolean,
      maxRecords: Int): WarcScan = {
    val out = Seq.newBuilder[WarcRecord]
    val n = b.length
    var pos = 0
    var idx = 0
    var reason = ""
    var stopped = false
    while (!stopped && pos < n && idx < maxRecords) {
      while (pos < n && (b(pos) == '\r' || b(pos) == '\n')) pos += 1
      if (pos >= n) stopped = true
      else if (!startsWithAscii(b, pos, "WARC/")) {
        reason = "torn_tail"; stopped = true
      } else {
        val hdrEnd = indexOfCrlfCrlf(b, pos)
        if (hdrEnd < 0) { reason = "torn_tail"; stopped = true }
        else {
          val headers = parseHeaders(sliceAscii(b, pos, hdrEnd))
          // malformed (non-numeric) length terminates the scan like
          // other structural corruption — it must NOT throw and
          // discard the records already parsed (ADVICE r12)
          val len = headers.getOrElse("content-length", "-1")
            .trim.toLongOption.getOrElse(-1L)
          val bodyStart = hdrEnd + 4
          if (len < 0 || bodyStart + len > n) {
            reason = "torn_tail"; stopped = true
          } else {
            val recType = headers.getOrElse("warc-type", "")
            val url = headers.getOrElse("warc-target-uri", "")
            var status = 0
            var ctype = ""
            var payload = java.util.Arrays.copyOfRange(
              b, bodyStart, bodyStart + len.toInt)
            if (recType == "response" &&
              startsWithAscii(payload, 0, "HTTP/")) {
              val he = indexOfCrlfCrlf(payload, 0)
              val headLen = if (he >= 0) he else payload.length
              val head = sliceAscii(payload, 0, headLen)
              val lineEnd = head.indexOf("\r\n")
              if (lineEnd > 0) {
                val parts = head.substring(0, lineEnd).split(" ")
                if (parts.length >= 2)
                  status = parts(1).toIntOption.getOrElse(0)
              }
              if (he >= 0 && lineEnd > 0) {
                val hh = parseHeaders(head.substring(lineEnd + 2))
                ctype = hh.getOrElse("content-type", "")
                  .split(";")(0).trim.toLowerCase
                payload = java.util.Arrays.copyOfRange(
                  payload, he + 4, payload.length)
              }
            }
            out += WarcRecord(idx, recType, url, status, ctype, payload)
            idx += 1
            pos = bodyStart + len.toInt
          }
        }
      }
    }
    // record-cap bite: stopped by count with non-padding bytes left
    if (!stopped && idx >= maxRecords) {
      var p = pos
      while (p < n && (b(p) == '\r' || b(p) == '\n')) p += 1
      if (p < n) reason = "record_cap"
    }
    // the inflate cap subsumes whatever structural stop it caused
    if (inflateCapped) reason = "inflate_cap"
    WarcScan(out.result(), reason.nonEmpty, reason, pos.toLong, n.toLong)
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

  def records(df: DataFrame, idCol: String, binCol: String,
      maxInflate: Int = DefaultMaxInflate,
      maxRecords: Int = DefaultMaxRecords): Dataset[WarcRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseArchive(Option(bytes).getOrElse(Array.empty),
            maxInflate, maxRecords).records.map(r =>
            WarcRow(id, r.rec_idx, r.rec_type, r.url, r.http_status,
              r.content_type, r.body.length.toLong))
        }
      }
  }

  /** Per-archive truncation LEDGER — one row per input archive with
    * the record count and whether (and why) any cap stopped the scan
    * early. The companion to [[records]] a no-silent-caps pipeline
    * runs alongside the extraction pass; q361 gates it against
    * planted over-cap archives. Map-only like everything here. */
  final case class WarcLedgerRow(
      id: Long, n_records: Int, truncated: Boolean, reason: String,
      bytes_scanned: Long, bytes_inflated: Long)

  def ledger(df: DataFrame, idCol: String, binCol: String,
      maxInflate: Int = DefaultMaxInflate,
      maxRecords: Int = DefaultMaxRecords): Dataset[WarcLedgerRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val s = parseArchive(Option(bytes).getOrElse(Array.empty),
            maxInflate, maxRecords)
          WarcLedgerRow(id, s.records.length, s.truncated, s.reason,
            s.bytesScanned, s.bytesInflated)
        }
      }
  }

  /** The CURATION front end (q363): WARC(.gz) → 200 text/html bodies
    * → [[EncodingDetect.detect]] byte-sniffed charset → charset-aware
    * decode → [[HtmlExtract.extractText]], one map-only operator — the
    * charset-blind [[htmlPages]] decodes everything as UTF-8, which
    * mangles the latin-1 tail of a real crawl. Quality columns compose
    * on top as ordinary Column expressions (TextAnalysis.qualitySignals),
    * keeping the whole front door one stateless micro-batchable map. */
  final case class CuratedPage(
      id: Long, rec_idx: Int, url: String, charset: String,
      text: String, n_links: Int)

  private def decodeBody(b: Array[Byte], charset: String): String =
    charset match {
      case "utf-8-bom" =>
        new String(b, 3, b.length - 3,
          java.nio.charset.StandardCharsets.UTF_8)
      case "latin-1" =>
        new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
      case "utf-16le" | "utf-16be" =>
        // detection is BOM-based, and the JDK's UTF-16 charset
        // consumes exactly that BOM
        new String(b, java.nio.charset.StandardCharsets.UTF_16)
      case "utf-32le" | "utf-32be" =>
        try new String(b, java.nio.charset.Charset.forName("UTF-32"))
        catch { case _: Exception =>
          new String(b, java.nio.charset.StandardCharsets.ISO_8859_1) }
      case _ => // ascii, utf-8
        new String(b, java.nio.charset.StandardCharsets.UTF_8)
    }

  def curatedPages(df: DataFrame, idCol: String, binCol: String,
      maxInflate: Int = DefaultMaxInflate,
      maxRecords: Int = DefaultMaxRecords): Dataset[CuratedPage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseArchive(Option(bytes).getOrElse(Array.empty),
            maxInflate, maxRecords).records
            .filter(r => r.rec_type == "response" &&
              r.http_status == 200 && r.content_type == "text/html")
            .map { r =>
              val cs = EncodingDetect.detect(r.body)
              val (text, links) =
                HtmlExtract.extractText(decodeBody(r.body, cs))
              CuratedPage(id, r.rec_idx, r.url, cs, text, links)
            }
        }
      }
  }

  /** Raw HTML of 200-status text/html responses — the LINK-EXTRACTION
    * feed ([[LinkExtract.links]] wants the markup, not the extracted
    * text): charset-detected decode only, no text extraction. Map-only
    * like the text path; the q400 crawl-pipeline composition runs it
    * between the admission stage and the link graph. */
  final case class WarcHtmlPage(
      id: Long, rec_idx: Int, url: String, html: String)

  def rawHtmlPages(df: DataFrame, idCol: String, binCol: String,
      maxInflate: Int = DefaultMaxInflate,
      maxRecords: Int = DefaultMaxRecords): Dataset[WarcHtmlPage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseArchive(Option(bytes).getOrElse(Array.empty),
            maxInflate, maxRecords).records
            .filter(r => r.rec_type == "response" &&
              r.http_status == 200 && r.content_type == "text/html")
            .map { r =>
              val cs = EncodingDetect.detect(r.body)
              WarcHtmlPage(id, r.rec_idx, r.url, decodeBody(r.body, cs))
            }
        }
      }
  }

  /** The composed front end: WARC(.gz) → 200-status text/html
    * response bodies → [[HtmlExtract.extractText]] → one row per
    * page. What a Common Crawl ingestion stage actually does, as one
    * map-only operator. */
  final case class WarcPage(
      id: Long, rec_idx: Int, url: String, text: String, n_links: Int)

  def htmlPages(df: DataFrame, idCol: String, binCol: String,
      maxInflate: Int = DefaultMaxInflate,
      maxRecords: Int = DefaultMaxRecords): Dataset[WarcPage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          parseArchive(Option(bytes).getOrElse(Array.empty),
            maxInflate, maxRecords).records
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
