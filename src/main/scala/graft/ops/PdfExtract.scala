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

  private def extractImpl(b: Array[Byte]): Option[(String, Int)] = {
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
    // decode + interpret each content stream
    val text = new StringBuilder
    spans.foreach { case (ds, de, dictStart) =>
      val dict = raw.substring(dictStart, math.min(ds, dictStart + 512))
      val data: Array[Byte] =
        if (dict.contains("/FlateDecode")) inflateBounded(b, ds, de - ds)
        else java.util.Arrays.copyOfRange(b, ds, de)
      if (data != null) {
        val content =
          new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)
        if (content.contains("BT") && text.length < (4 << 20))
          extractContent(content, text)
      }
    }
    val lines = text.toString.split("\n", -1)
      .map(l => l.replaceAll("\\s+$", "")).filter(_.nonEmpty)
    Some((lines.mkString("\n"), pages))
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
}
