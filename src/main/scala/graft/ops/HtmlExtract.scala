package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the first step of every web-scale corpus
  * pipeline (strip markup before language ID / quality / dedup; the
  * reference profiles already-extracted text, this is the operator
  * that produces it). A single-pass state machine over the raw
  * markup, NOT a regex pile: regexes cannot handle `>` inside quoted
  * attribute values or `<div>` inside a script body, and at 100 TB
  * the failure mode of a sloppy stripper is silent corpus poisoning.
  *
  * The EXACT spec (replicated independently by
  * scripts/gen_html_fixture.py — same rules, no shared code — so the
  * q351 gate certifies every branch):
  *
  *  - `<!--` … `-->` comments dropped (unterminated: to end of input).
  *  - `<!…>` declarations (doctype) dropped.
  *  - A tag starts at `<` followed by a letter or `/`; its name is
  *    the longest run of ASCII letters/digits after the optional `/`.
  *    Attribute scanning honors single- and double-quoted values — a
  *    `>` inside quotes does not close the tag. Unterminated tag: to
  *    end of input.
  *  - Opening `script` / `style` / `noscript` swallow everything
  *    through the next `</name` (case-insensitive) and its `>`.
  *  - Block-level tags (p div br li ul ol h1–h6 tr table section
  *    article header footer blockquote pre) emit a newline for BOTH
  *    the opening and closing form; other tags emit nothing.
  *  - Entities: the five XML names (amp lt gt quot apos) plus nbsp,
  *    and numeric `&#NNN;` / `&#xHH;` for codepoints < 0x110000;
  *    anything else — including a missing `;` within 12 chars — is
  *    literal text. Decoding is ONE pass: `&amp;lt;` yields `&lt;`.
  *  - U+00A0 (from nbsp or numeric) becomes a plain space.
  *  - Per line (split on the emitted newlines): whitespace runs
  *    collapse to one space, ends trimmed; empty lines drop; lines
  *    join with `\n`.
  *
  * A `<` not starting a comment/declaration/tag is literal text.
  * `n_links` counts opening `<a` tags; `text_density` =
  * text.length / html.length (UTF-16 units; the committed fixtures
  * are BMP-only so the python twin's codepoint count agrees), HALF_UP
  * 6 dp. Map-only; null markup yields an empty row, never an error.
  */
object HtmlExtract {

  private val Block = Set("p", "div", "br", "li", "ul", "ol", "h1", "h2",
    "h3", "h4", "h5", "h6", "tr", "table", "section", "article",
    "header", "footer", "blockquote", "pre")

  private val Raw = Set("script", "style", "noscript")

  private val Named = Map("amp" -> '&', "lt" -> '<', "gt" -> '>',
    "quot" -> '"', "apos" -> '\'', "nbsp" -> ' ')

  /** The spec'd extraction; exposed for direct reuse and tests. */
  def extractText(html: String): (String, Int) = {
    val n = html.length
    val sb = new StringBuilder(n / 2)
    var links = 0
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 3 < n && html.charAt(i + 1) == '!' &&
        html.charAt(i + 2) == '-' && html.charAt(i + 3) == '-') {
        val end = html.indexOf("-->", i + 4)
        i = if (end < 0) n else end + 3
      } else if (c == '<' && i + 1 < n && html.charAt(i + 1) == '!') {
        val end = html.indexOf('>', i + 2)
        i = if (end < 0) n else end + 1
      } else if (c == '<' && i + 1 < n &&
        (html.charAt(i + 1).isLetter || html.charAt(i + 1) == '/')) {
        val closing = html.charAt(i + 1) == '/'
        var j = i + (if (closing) 2 else 1)
        val nameStart = j
        while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
        val name = html.substring(nameStart, j).toLowerCase
        // attribute scan honoring quotes
        var quote: Char = 0
        var end = -1
        var k = j
        while (end < 0 && k < n) {
          val ch = html.charAt(k)
          if (quote != 0) { if (ch == quote) quote = 0 }
          else if (ch == '"' || ch == '\'') quote = ch
          else if (ch == '>') end = k
          k += 1
        }
        i = if (end < 0) n else end + 1
        if (!closing && name == "a") links += 1
        if (Block.contains(name)) sb.append('\n')
        if (!closing && Raw.contains(name) && end >= 0) {
          // swallow the raw content through </name ... >
          val lower = html
          var m = i
          var found = -1
          while (found < 0 && m < n) {
            if (lower.charAt(m) == '<' && m + 1 < n &&
              lower.charAt(m + 1) == '/' &&
              lower.regionMatches(true, m + 2, name, 0, name.length)) {
              val gt = lower.indexOf('>', m + 2)
              found = if (gt < 0) n else gt + 1
            } else m += 1
          }
          i = if (found < 0) n else found
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          val body = html.substring(i + 1, semi)
          if (Named.contains(body)) {
            sb.append(Named(body)); i = semi + 1
          } else if (body.length > 1 && body.charAt(0) == '#') {
            val cp =
              try {
                if (body.length > 2 &&
                  (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
                  Integer.parseInt(body.substring(2), 16)
                else Integer.parseInt(body.substring(1))
              } catch { case _: NumberFormatException => -1 }
            if (cp >= 0 && cp < 0x110000) {
              sb.appendAll(Character.toChars(cp)); i = semi + 1
            } else { sb.append(c); i += 1 }
          } else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else {
        sb.append(c); i += 1
      }
    }
    val text = sb.toString.replace(' ', ' ')
      .split("\n", -1)
      .map(_.replaceAll("[ \\t\\r\\f\\x0B]+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")
    (text, links)
  }

  /** One extracted document: text + link count + text density. */
  final case class Extracted(
      id: Long, text: String, n_links: Int, text_density: Double)

  def htmlToText(df: DataFrame, idCol: String,
      htmlCol: String): Dataset[Extracted] = {
    val spark = df.sparkSession
    import spark.implicits._
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    df.select(col(idCol).cast("long"), col(htmlCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, htmlOrNull) =>
          val html = Option(htmlOrNull).getOrElse("")
          val (text, links) = extractText(html)
          val density =
            if (html.isEmpty) 0.0
            else r6(text.length.toDouble / html.length)
          Extracted(id, text, links, density)
        }
      }
  }
}
