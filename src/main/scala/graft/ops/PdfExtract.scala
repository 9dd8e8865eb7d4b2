package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** PDF → text extraction for the dominant document format of any
  * large-scale corpus (the reference's world is tabular files; a
  * 100 TB training pipeline's document shelf is mostly PDF). This is
  * an honest SUBSET parser, not a renderer: it walks the raw bytes
  * for stream objects, FlateDecodes them with the JDK's zlib (same
  * stall-safe loop contract as the PNG decoder), and interprets the
  * text operators of every content stream that contains a BT/ET text
  * block. Fonts, CMaps, ToUnicode and positioning are out of scope —
  * the fixtures (scripts/gen_pdf_fixture.py) stay inside the subset,
  * and anything outside it degrades to dropped strings, never an
  * exception.
  *
  * Interpreted operators (PDF 32000-1 §9.4):
  *  - `BT` / `ET` enter/leave a text block (strings outside are
  *    ignored);
  *  - `Td` `TD` `T*` start a new output line;
  *  - `Tj` shows the preceding literal/hex string; `'` and `"` show
  *    it on a NEW line;
  *  - `TJ` shows every string of the preceding array, concatenated
  *    (kerning numbers ignored).
  * String syntax: literal `(...)` with nested balanced parens and the
  * standard escapes (\\ \( \) \n \r \t \b \f, octal \ooo, and
  * line-continuation backslash-EOL); hex `<...>` with embedded
  * whitespace, odd length padded with 0. Bytes map via Latin-1 (the
  * fixtures are ASCII; real-world font encodings are the out-of-scope
  * line). Page count = `/Type /Page` tokens OUTSIDE stream data.
  * Output lines are trimmed of trailing spaces; empty lines drop;
  * lines join with \n. Caps: 16 MiB inflated per stream, 4 MiB total
  * text, 10k streams — hostile-bytes safe, never an exception.
  */
object PdfExtract {

  /** Parsed document: extracted text + page count. None when the
    * bytes are not a PDF at all (no %PDF- header). */
  def extract(b: Array[Byte]): Option[(String, Int)] =
    try extractImpl(b)
    catch { case _: Exception => None }

  /** POSITIONED extraction (q364, verdict r12 #7): interprets the
    * text-positioning operators `Td` `TD` `Tm` `TL` `T*` as a cursor
    * over the page plane and reassembles READING order instead of
    * stream order — a two-column page interleaves its columns in the
    * content stream (L1 R1 L2 R2 …), which [[extract]] emits verbatim.
    * Subset semantics (documented, not a renderer):
    *  - `Tm a b c d e f` sets the line origin to (e, f) — rotation/
    *    scale components are ignored (unrotated text assumed);
    *  - `Td tx ty` translates the line origin; `TD` also sets leading
    *    to −ty; `TL l` sets leading; `T*` (and `'`/`"`) move down one
    *    leading;
    *  - shown strings become runs at the current origin (no font
    *    metrics, so the cursor does not advance within a run);
    *  - reading order: runs cluster into COLUMNS wherever consecutive
    *    distinct x origins gap by ≥ `columnGap` (default 100 text-
    *    space units — paragraph indents stay in their column); within
    *    a column, lines by y DESCENDING (PDF y grows up), runs on one
    *    line (|Δy| < 0.5) left-to-right, joined by a single space
    *    when their x differ, concatenated when equal (consecutive
    *    `Tj` at one origin);
    *  - each content stream (≈ page) reassembles independently.
    * Same hostile-bytes caps as [[extract]]. */
  def extractPositioned(b: Array[Byte],
      columnGap: Double = 100.0): Option[(String, Int)] =
    try extractPositionedImpl(b, columnGap)
    catch { case _: Exception => None }

  /** Shared stream-span scan: (raw latin-1 view, spans, page count). */
  private def scanStreams(
      b: Array[Byte]): Option[(String, Seq[(Int, Int, Int)], Int)] = {
    if (b.length < 8) return None
    val head = new String(b, 0, 8, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!head.startsWith("%PDF-")) return None
    val raw = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    // locate stream spans: "stream" token ... "endstream"
    val spans = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
    // (dataStart, dataEnd, dictStart) — dict is the << .. >> before
    var from = 0
    var guard = 0
    while (guard < 10000) {
      guard += 1
      val s = raw.indexOf("stream", from)
      if (s < 0) guard = 10000
      else {
        val isEnd = s >= 3 && raw.regionMatches(s - 3, "end", 0, 3)
        if (isEnd) from = s + 6
        else {
          var ds = s + 6
          if (ds < raw.length && raw.charAt(ds) == '\r') ds += 1
          if (ds < raw.length && raw.charAt(ds) == '\n') ds += 1
          val e = raw.indexOf("endstream", ds)
          if (e < 0) guard = 10000
          else {
            var de = e
            // strip one trailing EOL the writer adds before endstream
            if (de > ds && raw.charAt(de - 1) == '\n') de -= 1
            if (de > ds && raw.charAt(de - 1) == '\r') de -= 1
            val dictStart = raw.lastIndexOf("<<", s)
            spans += ((ds, de, math.max(dictStart, 0)))
            from = e + 9
          }
        }
      }
    }
    // page count over NON-stream bytes
    val sb = new StringBuilder
    var cursor = 0
    // NB: String#substring, not append(s, from, to) — Scala's
    // StringBuilder lacks the 3-arg overload and silently auto-tuples
    spans.sortBy(_._1).foreach { case (ds, de, _) =>
      if (ds > cursor) sb.append(raw.substring(cursor, ds))
      cursor = math.max(cursor, de)
    }
    if (cursor < raw.length) sb.append(raw.substring(cursor))
    val outside = sb.toString
    var pages = 0
    var p = outside.indexOf("/Type /Page")
    while (p >= 0) {
      val after = p + "/Type /Page".length
      if (after >= outside.length || outside.charAt(after) != 's') pages += 1
      p = outside.indexOf("/Type /Page", after)
    }
    Some((raw, spans.toSeq, pages))
  }

  /** Decode one stream span to its content string, or null. */
  private def contentOf(b: Array[Byte], raw: String,
      span: (Int, Int, Int)): String = {
    val (ds, de, dictStart) = span
    val dict = raw.substring(dictStart, math.min(ds, dictStart + 512))
    val data: Array[Byte] =
      if (dict.contains("/FlateDecode")) inflateBounded(b, ds, de - ds)
      else java.util.Arrays.copyOfRange(b, ds, de)
    if (data == null) null
    else new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private def cleanLines(text: String): String =
    text.split("\n", -1)
      .map(l => l.replaceAll("\\s+$", "")).filter(_.nonEmpty)
      .mkString("\n")

  private def extractImpl(b: Array[Byte]): Option[(String, Int)] =
    scanStreams(b).map { case (raw, spans, pages) =>
      val text = new StringBuilder
      spans.foreach { span =>
        val content = contentOf(b, raw, span)
        if (content != null && content.contains("BT") &&
          text.length < (4 << 20))
          extractContent(content, text)
      }
      (cleanLines(text.toString), pages)
    }

  private def extractPositionedImpl(b: Array[Byte],
      columnGap: Double): Option[(String, Int)] =
    scanStreams(b).map { case (raw, spans, pages) =>
      val pieces = scala.collection.mutable.ArrayBuffer[String]()
      var budget = 4 << 20
      spans.foreach { span =>
        val content = contentOf(b, raw, span)
        if (content != null && content.contains("BT") && budget > 0) {
          val runs = extractContentRuns(content)
          val assembled = assembleReadingOrder(runs.toSeq, columnGap)
          if (assembled.nonEmpty) {
            pieces += assembled.take(budget)
            budget -= assembled.length
          }
        }
      }
      (cleanLines(pieces.mkString("\n")), pages)
    }

  /** One positioned text run: line origin + stream order tiebreak. */
  private final case class Run(x: Double, y: Double, ord: Int,
      text: String)

  /** Interpret one content stream's text + positioning operators. */
  private def extractContentRuns(
      c: String): scala.collection.mutable.ArrayBuffer[Run] = {
    val n = c.length
    var i = 0
    var inText = false
    val strings = scala.collection.mutable.ArrayBuffer[String]()
    val nums = scala.collection.mutable.ArrayBuffer[Double]()
    var lineX = 0.0
    var lineY = 0.0
    var leading = 0.0
    var ord = 0
    val runs = scala.collection.mutable.ArrayBuffer[Run]()
    def show(s: String): Unit =
      if (s.nonEmpty && runs.length < 100000) {
        runs += Run(lineX, lineY, ord, s); ord += 1
      }
    def clearAll(): Unit = { strings.clear(); nums.clear() }
    while (i < n) {
      val ch = c.charAt(i)
      if (ch == '%') {
        while (i < n && c.charAt(i) != '\n' && c.charAt(i) != '\r') i += 1
      } else if (ch == '(') {
        val (s, ni) = literalString(c, i)
        if (inText) strings += s
        i = ni
      } else if (ch == '<' && i + 1 < n && c.charAt(i + 1) != '<') {
        val (s, ni) = hexString(c, i)
        if (inText) strings += s
        i = ni
      } else if (ch == '<' || ch == '>') { i += 2 }
      else if (ch == '[' || ch == ']') { i += 1 }
      else if (ch == '/') {
        i += 1
        while (i < n && !isDelim(c.charAt(i))) i += 1
      } else if (ch == '\'' || ch == '"') {
        if (inText) {
          lineY -= leading
          if (strings.nonEmpty) show(strings.last)
        }
        clearAll(); i += 1
      } else if (isRegular(ch)) {
        val start = i
        while (i < n && isRegular(c.charAt(i))) i += 1
        val tok = c.substring(start, i)
        tok.toDoubleOption match {
          case Some(v) => nums += v // operand: keep pending strings
          case None => tok match {
            case "BT" =>
              inText = true; lineX = 0; lineY = 0; leading = 0
              clearAll()
            case "ET" => inText = false; clearAll()
            case "Td" =>
              if (inText && nums.length >= 2) {
                lineX += nums(nums.length - 2); lineY += nums.last
              }
              clearAll()
            case "TD" =>
              if (inText && nums.length >= 2) {
                lineX += nums(nums.length - 2); lineY += nums.last
                leading = -nums.last
              }
              clearAll()
            case "Tm" =>
              if (inText && nums.length >= 6) {
                lineX = nums(nums.length - 2); lineY = nums.last
              }
              clearAll()
            case "TL" =>
              if (inText && nums.nonEmpty) leading = nums.last
              clearAll()
            case "T*" =>
              if (inText) lineY -= leading
              clearAll()
            case "Tj" =>
              if (inText && strings.nonEmpty) show(strings.last)
              clearAll()
            case "TJ" =>
              if (inText) strings.foreach(show)
              clearAll()
            case _ => clearAll() // any other operator consumes operands
          }
        }
      } else i += 1
    }
    runs
  }

  /** Reassemble runs into reading order: x-gap column clustering,
    * then per column y descending; same-line runs (|Δy| < 0.5) join
    * with a space when their x differ, concatenate when equal. */
  private def assembleReadingOrder(runs: Seq[Run],
      columnGap: Double): String = {
    if (runs.isEmpty) return ""
    val xs = runs.map(_.x).distinct.sorted
    val colOf = scala.collection.mutable.HashMap[Double, Int]()
    var ci = 0
    var prev = xs.head
    xs.foreach { x =>
      if (x - prev >= columnGap) ci += 1
      colOf(x) = ci
      prev = x
    }
    val sorted = runs.sortBy(r => (colOf(r.x), -r.y, r.x, r.ord))
    val sb = new StringBuilder
    var first = true
    var pc = 0
    var py = 0.0
    var px = 0.0
    sorted.foreach { r =>
      val c = colOf(r.x)
      if (first) ()
      else if (c != pc || math.abs(r.y - py) >= 0.5) sb.append('\n')
      else if (math.abs(r.x - px) > 0.01) sb.append(' ')
      sb.append(r.text)
      first = false; pc = c; py = r.y; px = r.x
    }
    sb.toString
  }

  /** Stall-safe bounded inflate (the PNG decoder's contract). */
  private def inflateBounded(b: Array[Byte], off: Int,
      len: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(b, off, len)
      val out = new java.io.ByteArrayOutputStream(math.min(len * 4, 1 << 16))
      val buf = new Array[Byte](8192)
      var stalled = false
      while (!inf.finished() && !stalled && out.size < (16 << 20)) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n) else stalled = true
      }
      if (out.size == 0 && !inf.finished()) null else out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }

  /** Interpret one content stream's text operators into `out`. */
  private def extractContent(c: String, out: StringBuilder): Unit = {
    val n = c.length
    var i = 0
    var inText = false
    val strings = scala.collection.mutable.ArrayBuffer[String]()
    def emit(s: String): Unit =
      if (out.length < (4 << 20)) out.append(s)
    def newline(): Unit = emit("\n")
    while (i < n) {
      val ch = c.charAt(i)
      if (ch == '%') { // comment to EOL
        while (i < n && c.charAt(i) != '\n' && c.charAt(i) != '\r') i += 1
      } else if (ch == '(') {
        val (s, ni) = literalString(c, i)
        if (inText) strings += s
        i = ni
      } else if (ch == '<' && i + 1 < n && c.charAt(i + 1) != '<') {
        val (s, ni) = hexString(c, i)
        if (inText) strings += s
        i = ni
      } else if (ch == '<' || ch == '>') { i += 2 } // << >> dict tokens
      else if (ch == '[' || ch == ']') { i += 1 }   // array delims
      else if (ch == '/') { // name: skip
        i += 1
        while (i < n && !isDelim(c.charAt(i))) i += 1
      } else if (ch == '\'' || ch == '"') {
        if (inText && strings.nonEmpty) { newline(); emit(strings.last) }
        strings.clear(); i += 1
      } else if (isRegular(ch)) {
        val start = i
        while (i < n && isRegular(c.charAt(i))) i += 1
        val tok = c.substring(start, i)
        tok match {
          case "BT" => inText = true; strings.clear()
          case "ET" => inText = false; strings.clear()
          case "Td" | "TD" | "T*" => if (inText) newline(); strings.clear()
          case "Tj" =>
            if (inText && strings.nonEmpty) emit(strings.last)
            strings.clear()
          case "TJ" =>
            if (inText) strings.foreach(emit)
            strings.clear()
          case t if t.nonEmpty && !t.charAt(0).isDigit && t.charAt(0) != '-' &&
            t.charAt(0) != '+' && t.charAt(0) != '.' =>
            strings.clear() // any other operator consumes its operands
          case _ => () // number operand: keep pending strings (TJ arrays)
        }
      } else i += 1
    }
  }

  private def isDelim(ch: Char): Boolean =
    ch == '(' || ch == ')' || ch == '<' || ch == '>' || ch == '[' ||
      ch == ']' || ch == '{' || ch == '}' || ch == '/' || ch == '%' ||
      ch.isWhitespace

  private def isRegular(ch: Char): Boolean = !isDelim(ch)

  /** PDF literal string at c(i)=='(' → (decoded, next index). */
  private def literalString(c: String, start: Int): (String, Int) = {
    val n = c.length
    val sb = new StringBuilder
    var depth = 1
    var i = start + 1
    while (i < n && depth > 0) {
      val ch = c.charAt(i)
      if (ch == '\\' && i + 1 < n) {
        val e = c.charAt(i + 1)
        e match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\n' => i += 2 // line continuation
          case '\r' =>
            i += 2
            if (i < n && c.charAt(i) == '\n') i += 1
          case d if d >= '0' && d <= '7' =>
            var v = 0
            var k = 0
            i += 1
            while (k < 3 && i < n && c.charAt(i) >= '0' &&
              c.charAt(i) <= '7') {
              v = v * 8 + (c.charAt(i) - '0'); i += 1; k += 1
            }
            sb.append((v & 0xff).toChar)
          case other => sb.append(other); i += 2 // unknown escape: literal
        }
      } else if (ch == '(') { depth += 1; sb.append(ch); i += 1 }
      else if (ch == ')') {
        depth -= 1
        if (depth > 0) sb.append(ch)
        i += 1
      } else { sb.append(ch); i += 1 }
    }
    (sb.toString, i)
  }

  /** PDF hex string at c(i)=='<' → (decoded, next index). */
  private def hexString(c: String, start: Int): (String, Int) = {
    val n = c.length
    val digits = new StringBuilder
    var i = start + 1
    while (i < n && c.charAt(i) != '>') {
      val ch = c.charAt(i)
      if (!ch.isWhitespace) digits.append(ch)
      i += 1
    }
    if (digits.length % 2 == 1) digits.append('0')
    val sb = new StringBuilder
    var k = 0
    while (k + 1 < digits.length + 1 && k + 1 <= digits.length) {
      if (k + 2 <= digits.length) {
        val v = Integer.parseInt(digits.substring(k, k + 2), 16)
        sb.append((v & 0xff).toChar)
      }
      k += 2
    }
    (sb.toString, math.min(i + 1, n))
  }

  /** One extracted document. */
  final case class PdfText(id: Long, text: String, n_pages: Int)

  /** Map-only extraction over a binary column; non-PDF blobs dropped
    * (same contract as the image decoders). */
  def pdfToText(df: DataFrame, idCol: String,
      binCol: String): Dataset[PdfText] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          extract(Option(bytes).getOrElse(Array.empty))
            .map { case (text, pages) => PdfText(id, text, pages) }
        }
      }
  }

  /** Map-only positioned extraction ([[extractPositioned]]) — the
    * reading-order variant a multi-column corpus needs. */
  def pdfToTextPositioned(df: DataFrame, idCol: String,
      binCol: String, columnGap: Double = 100.0): Dataset[PdfText] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          extractPositioned(Option(bytes).getOrElse(Array.empty),
            columnGap)
            .map { case (text, pages) => PdfText(id, text, pages) }
        }
      }
  }
}
