package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Link extraction — the LINK-GRAPH front end that pairs with
  * [[HtmlExtract]] (which produces the text corpus) and
  * [[UrlResolve]] (which turns each href into the absolute URL a
  * crawler would request; host edges then feed PageRank/GraphStats
  * and the frontier). q391 gates it against an independent python
  * twin; q392 runs it at corpus scale against a construction oracle.
  *
  * Scanning spec (the [[HtmlExtract.extractText]] tag-walk rules,
  * restated — the two scanners share the DOCUMENTED spec, not code):
  * comments `<!-- -->` and `<!…>` declarations are skipped; a tag's
  * attribute region is quote-aware (a `>` inside quotes does not
  * close it); `script`/`style`/`noscript` bodies are swallowed (an
  * href inside a script string must NOT extract). Within an OPENING
  * `<a>` tag's attribute region: attributes are `name[=value]` runs,
  * names case-insensitive, values single-/double-quoted or unquoted
  * (to the next whitespace); the FIRST `href` wins; the value is
  * entity-decoded with the same one-pass rules as the text path
  * (`&amp;` in query strings is the normal case on real pages) and
  * trimmed of ASCII whitespace. Boolean-form `href` (no `=`) and
  * `<a>` without href emit nothing. Map-only; hostile bytes never
  * throw. */
object LinkExtract {

  private val Raw = Set("script", "style", "noscript")
  private val Named = Map("amp" -> '&', "lt" -> '<', "gt" -> '>',
    "quot" -> '"', "apos" -> '\'', "nbsp" -> ' ')

  /** One-pass entity decode (same rules as the text path; nbsp stays
    * U+00A0 here — href trimming is ASCII-only). */
  private[ops] def decodeEntities(s: String): String = {
    val n = s.length
    val sb = new StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          val body = s.substring(i + 1, semi)
          if (Named.contains(body)) { sb.append(Named(body)); i = semi + 1 }
          else if (body.length > 1 && body.charAt(0) == '#') {
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
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** First href value in a tag's attribute region [from, until). */
  private def findHref(html: String, from: Int, until: Int): Option[String] = {
    var k = from
    while (k < until) {
      while (k < until && (isAsciiWs(html.charAt(k)) ||
        html.charAt(k) == '/')) k += 1
      val nameStart = k
      while (k < until && !isAsciiWs(html.charAt(k)) &&
        html.charAt(k) != '=') k += 1
      val name = html.substring(nameStart, k)
      while (k < until && isAsciiWs(html.charAt(k))) k += 1
      var value: String = null
      if (k < until && html.charAt(k) == '=') {
        k += 1
        while (k < until && isAsciiWs(html.charAt(k))) k += 1
        if (k < until &&
          (html.charAt(k) == '"' || html.charAt(k) == '\'')) {
          val q = html.charAt(k)
          val close = html.indexOf(q, k + 1)
          val stop = if (close < 0 || close > until) until else close
          value = html.substring(k + 1, stop)
          k = if (close < 0 || close > until) until else close + 1
        } else {
          val vs = k
          while (k < until && !isAsciiWs(html.charAt(k))) k += 1
          value = html.substring(vs, k)
        }
      }
      if (name.equalsIgnoreCase("href") && value != null) {
        // explicit ASCII-ws strip (space \t \n \r \f), NOT String.trim
        // — trim strips every char <= 0x20 and would diverge from the
        // documented rule (and the twin) on e.g. a vertical tab
        val d = decodeEntities(value)
        var a = 0
        var b = d.length
        while (a < b && isAsciiWs(d.charAt(a))) a += 1
        while (b > a && isAsciiWs(d.charAt(b - 1))) b -= 1
        return Some(d.substring(a, b))
      }
      if (nameStart == k) k += 1 // safety: no progress -> step
    }
    None
  }

  /** href values of opening `<a>` tags, in document order. */
  def hrefs(htmlRaw: String): Seq[String] = anchors(htmlRaw).map(_._1)

  /** (href, anchor_text) of opening `<a>` tags, in document order —
    * anchor text is THE classic description-of-the-TARGET signal (it
    * is written by the linking page, not the linked one).
    *
    * Anchor-text rules (twin-replicated): text runs from after the
    * opening `<a …>` to the earliest of its `</a>`, the NEXT opening
    * `<a` (HTML forbids nesting — a second anchor implicitly closes
    * the first), or end of input; intervening tags contribute
    * nothing, comments and raw script/style/noscript bodies are
    * skipped, entities decode with the text path's rules (U+00A0
    * becomes a plain space), then ALL whitespace runs collapse to one
    * space and ends trim. A torn anchor at end-of-input keeps the
    * text gathered so far; a torn `<a` TAG still fabricates no link. */
  def anchors(htmlRaw: String): Seq[(String, String)] = {
    val html = Option(htmlRaw).getOrElse("")
    val n = html.length
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    // open anchor state: href + accumulating text
    var curHref: String = null
    val curText = new StringBuilder
    def closeAnchor(): Unit = {
      if (curHref != null) {
        // explicit ASCII ws class on BOTH engines (java \\s is
        // ASCII-only but python's is unicode-aware; trim strips
        // every char <= 0x20 - pin the documented set instead)
        val collapsed = curText.toString.replace(' ', ' ')
          .replaceAll("[ \\t\\n\\r\\f\\x0B]+", " ")
        out += ((curHref,
          collapsed.stripPrefix(" ").stripSuffix(" ")))
        curHref = null
      }
      curText.setLength(0)
    }
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
        while (j < n && html.charAt(j).isLetterOrDigit) j += 1
        val name = html.substring(nameStart, j).toLowerCase
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
        if (name == "a") {
          // a closing </a> or a NEW <a> both close the open anchor
          closeAnchor()
          // unterminated tag (a torn page at a truncation boundary):
          // consume to end of input but fabricate NO link from it
          if (!closing && end >= 0)
            findHref(html, j, end).foreach(curHref = _)
        }
        i = if (end < 0) n else end + 1
        if (!closing && Raw.contains(name) && end >= 0) {
          var m = i
          var found = -1
          while (found < 0 && m < n) {
            if (html.charAt(m) == '<' && m + 1 < n &&
              html.charAt(m + 1) == '/' &&
              html.regionMatches(true, m + 2, name, 0, name.length)) {
              val gt = html.indexOf('>', m + 2)
              found = if (gt < 0) n else gt + 1
            } else m += 1
          }
          i = if (found < 0) n else found
        }
      } else if (c == '&' && curHref != null) {
        // entity decode inside an open anchor (same one-pass rules)
        val semi = html.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          val body = html.substring(i + 1, semi)
          if (Named.contains(body)) { curText.append(Named(body)); i = semi + 1 }
          else if (body.length > 1 && body.charAt(0) == '#') {
            val cp =
              try {
                if (body.length > 2 &&
                  (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
                  Integer.parseInt(body.substring(2), 16)
                else Integer.parseInt(body.substring(1))
              } catch { case _: NumberFormatException => -1 }
            if (cp >= 0 && cp < 0x110000) {
              curText.appendAll(Character.toChars(cp)); i = semi + 1
            } else { curText.append(c); i += 1 }
          } else { curText.append(c); i += 1 }
        } else { curText.append(c); i += 1 }
      } else {
        if (curHref != null) curText.append(c)
        i += 1
      }
    }
    closeAnchor() // torn anchor at EOF keeps its text
    out.toSeq
  }

  final case class PageLink(id: Long, link_idx: Int, href: String,
      resolved: String, anchor: String)

  /** Per-page links with RFC 3986 resolution against the page URL and
    * the anchor text — map-only (the link graph's scan stage;
    * host-level edges are one aggregate downstream). Null page URL →
    * resolved null. */
  def links(df: DataFrame, idCol: String, urlCol: String,
      htmlCol: String): Dataset[PageLink] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(urlCol).cast("string"),
        col(htmlCol).cast("string"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, url, html) =>
          anchors(html).zipWithIndex.map { case ((h, a), idx) =>
            PageLink(id, idx, h,
              if (url == null) null else UrlResolve.resolve(url, h), a)
          }
        }
      }
  }

  /** Canonical TARGET table over extracted links — the frontier /
    * in-link-count form with RFC 3986 §6 equivalence applied: each
    * resolved link drops its fragment (a fragment never reaches the
    * wire) and canonicalizes ([[UrlResolve.canonicalize]] — scheme/
    * host case, default ports, unreserved escapes, dot segments), so
    * `HTTP://A.example:80/x` and `http://a.example/x` count as ONE
    * target. Output (target, n_inlinks, n_forms): n_forms counts the
    * DISTINCT raw resolved spellings that merged — the mass an
    * uncanonicalized frontier would split (and the gate's signal).
    * Map-only into one hash aggregate. */
  def canonicalTargets(linkTable: Dataset[PageLink]): DataFrame = {
    val spark = linkTable.sparkSession
    import spark.implicits._
    linkTable.toDF().select(col("resolved"))
      .where(col("resolved").isNotNull)
      .as[String]
      .mapPartitions(_.map { r =>
        val h = r.indexOf('#')
        val noFrag = if (h >= 0) r.substring(0, h) else r
        (UrlResolve.canonicalize(noFrag), r)
      })
      .toDF("target", "raw")
      .groupBy("target")
      .agg(count(lit(1)).as("n_inlinks"),
        countDistinct(col("raw")).as("n_forms"))
  }

  /** Host-level out-link edges: (src_host, dst_host, n_links),
    * fragments ignored by construction (a fragment never changes the
    * authority). One hash aggregate over the map-only link table. */
  def hostEdges(linkTable: Dataset[PageLink], pageUrls: DataFrame,
      idCol: String, urlCol: String): DataFrame = {
    val spark = linkTable.sparkSession
    import spark.implicits._
    linkTable.toDF()
      .join(pageUrls.select(col(idCol).cast("long").as("id"),
        col(urlCol).cast("string").as("__page_url")), Seq("id"))
      .select(col("__page_url"), col("resolved"))
      .as[(String, String)]
      .mapPartitions(_.map { case (p, r) =>
        (if (p == null) null else UrlResolve.host(p),
          if (r == null) null else UrlResolve.host(r))
      })
      .toDF("src_host", "dst_host")
      .where(col("src_host").isNotNull && col("dst_host").isNotNull)
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("n_links"))
  }
}
