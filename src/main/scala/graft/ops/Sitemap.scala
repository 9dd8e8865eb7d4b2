package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** sitemap.xml parsing per the sitemaps.org 0.9 protocol — the crawl
  * FRONTIER source that pairs with [[Robots]] (what may be fetched)
  * and [[Warc]] (what was fetched): a pipeline that re-crawls or
  * audits coverage reads sitemaps first. q377 gates it against a twin
  * built with CPython's xml.etree (an independent XML parser).
  *
  * Supported (the protocol's whole surface): `<urlset>` documents
  * with per-`<url>` `loc` / `lastmod` / `changefreq` / `priority`,
  * and `<sitemapindex>` documents with per-`<sitemap>` `loc` /
  * `lastmod`. Namespaced or not (the protocol requires the xmlns but
  * crawlers see both; matching is on the LOCAL tag name). `.xml.gz`
  * blobs inflate first (the protocol's documented delivery form),
  * bounded by the same cap discipline as [[Warc]]. `lastmod` /
  * `changefreq` stay verbatim strings (W3C datetimes are data, not
  * semantics, at this layer); `priority` parses to double (null when
  * absent or malformed). Hostile bytes: DTDs/external entities
  * disabled (XXE), malformed XML yields zero rows, never an
  * exception. */
object Sitemap {

  final case class SitemapEntry(
      id: Long, kind: String, entry_idx: Int, loc: String,
      lastmod: String, changefreq: String, priority: java.lang.Double)

  /** Parse one sitemap(.gz) blob: (kind, entries). kind is "urlset",
    * "sitemapindex", or "" when unparsable. */
  def parse(blob: Array[Byte]): (String,
      Seq[(String, String, String, java.lang.Double)]) =
    try parseImpl(gunzipIfNeeded(blob))
    catch { case _: Exception => ("", Seq.empty) }

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

  private def localName(qName: String): String = {
    val c = qName.lastIndexOf(':')
    if (c >= 0) qName.substring(c + 1) else qName
  }

  private def parseImpl(xml: Array[Byte]): (String,
      Seq[(String, String, String, java.lang.Double)]) = {
    val factory = javax.xml.parsers.SAXParserFactory.newInstance()
    factory.setNamespaceAware(false)
    factory.setFeature(
      "http://apache.org/xml/features/disallow-doctype-decl", true)
    factory.setFeature(
      "http://xml.org/sax/features/external-general-entities", false)
    factory.setFeature(
      "http://xml.org/sax/features/external-parameter-entities", false)
    var kind = ""
    val entries = scala.collection.mutable
      .ArrayBuffer[(String, String, String, java.lang.Double)]()
    val handler = new org.xml.sax.helpers.DefaultHandler {
      private var field: String = null
      private val cur = scala.collection.mutable.HashMap[String, String]()
      private var inEntry = false
      private val text = new StringBuilder
      override def startElement(uri: String, local: String,
          qName: String, atts: org.xml.sax.Attributes): Unit =
        localName(qName) match {
          case "urlset" if kind.isEmpty => kind = "urlset"
          case "sitemapindex" if kind.isEmpty => kind = "sitemapindex"
          case "url" | "sitemap" => inEntry = true; cur.clear()
          case f @ ("loc" | "lastmod" | "changefreq" | "priority")
            if inEntry => field = f; text.clear()
          case _ => ()
        }
      override def endElement(uri: String, local: String,
          qName: String): Unit = localName(qName) match {
        case "url" | "sitemap" =>
          if (inEntry && cur.contains("loc") && entries.length < 500000)
            entries += ((cur("loc"),
              cur.getOrElse("lastmod", ""),
              cur.getOrElse("changefreq", ""),
              cur.get("priority")
                .flatMap(_.toDoubleOption)
                .map(java.lang.Double.valueOf).orNull))
          inEntry = false
        case f if f == field =>
          cur(field) = text.toString.trim
          field = null
        case _ => ()
      }
      override def characters(ch: Array[Char], start: Int,
          length: Int): Unit =
        if (field != null && text.length < 65536)
          text.appendAll(ch, start, length)
    }
    factory.newSAXParser().parse(
      new java.io.ByteArrayInputStream(xml), handler)
    (kind, entries.toSeq)
  }

  /** Walk a sitemap TREE to its page frontier: `<sitemapindex>`
    * documents name child sitemaps; this composes index → child-blob
    * lookup → urlset into one bounded-iteration op, closing the crawl
    * loop (sitemap = what exists, [[Robots]] = what may be fetched,
    * [[Warc]] = what was fetched).
    *
    * `blobs` holds every FETCHED sitemap body keyed by its URL;
    * `seeds` are the root sitemap URLs (typically robots.txt
    * `Sitemap:` records). Each level is one equi-join of the
    * level's URL set against the blob table plus one map-only parse —
    * the [[ConnectedComponents]] loop discipline: eager
    * localCheckpoint per level (each level's parse runs exactly once;
    * the checkpoint BACKS the returned rows, so levels stay live by
    * design and the loop is bounded by `maxDepth`, not convergence
    * luck). Cyclic references (an index naming itself or an
    * ancestor) and diamond re-references are dropped by an anti-join
    * against the visited set; loc-less entries are dropped by the
    * parser; a child URL with no fetched blob simply contributes
    * nothing (the inner join drops it — the caller's fetcher decides
    * whether to go get it).
    *
    * Returns one row per urlset page entry:
    * (sm_url, depth, entry_idx, loc, lastmod, changefreq, priority)
    * where sm_url is the sitemap that listed the page and depth is
    * its level below the seeds (a seed that IS a urlset emits at
    * depth 0). */
  def frontier(blobs: DataFrame, urlCol: String, binCol: String,
      seeds: DataFrame, seedCol: String, maxDepth: Int = 5): DataFrame = {
    require(maxDepth >= 0, "maxDepth must be >= 0")
    val spark = blobs.sparkSession
    import spark.implicits._
    val b = blobs.select(trim(col(urlCol)).cast("string").as("sm_url"),
      col(binCol).cast("binary").as("bin"))
    var cur = seeds
      .select(trim(col(seedCol)).cast("string").as("sm_url"))
      .where(col("sm_url").isNotNull && length(col("sm_url")) > 0)
      .distinct()
    var visited = cur
    var pages: DataFrame = null
    var depth = 0
    var done = false
    while (!done) {
      val parsed = cur.join(b, Seq("sm_url"))
        .as[(String, Array[Byte])]
        .mapPartitions { it =>
          it.flatMap { case (u, bytes) =>
            val (kind, es) = parse(Option(bytes).getOrElse(Array.empty))
            es.zipWithIndex.map { case ((loc, lm, cf, pr), i) =>
              (u, kind, i, loc, lm, cf, pr)
            }
          }
        }
        .toDF("sm_url", "kind", "entry_idx", "loc", "lastmod",
          "changefreq", "priority")
        .localCheckpoint(true) // parse once; backs the returned rows
      val pageRows = parsed.where(col("kind") === "urlset")
        .select(col("sm_url"), lit(depth).as("depth"), col("entry_idx"),
          col("loc"), col("lastmod"), col("changefreq"), col("priority"))
      pages = if (pages == null) pageRows
        else pages.unionByName(pageRows)
      if (depth >= maxDepth) done = true
      else {
        val children = parsed.where(col("kind") === "sitemapindex")
          .select(trim(col("loc")).as("sm_url"))
          .where(length(col("sm_url")) > 0)
          .distinct()
          .join(visited, Seq("sm_url"), "left_anti") // cycle/diamond guard
        if (children.head(1).isEmpty) done = true
        else {
          cur = children.localCheckpoint(true)
          visited = visited.union(cur)
          depth += 1
        }
      }
    }
    pages
  }

  /** Flat frontier table over a binary column of sitemap(.gz) blobs —
    * map-only, like every ingestion front-end here. */
  def entries(df: DataFrame, idCol: String,
      binCol: String): Dataset[SitemapEntry] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val (kind, es) = parse(Option(bytes).getOrElse(Array.empty))
          es.zipWithIndex.map { case ((loc, lm, cf, pr), i) =>
            SitemapEntry(id, kind, i, loc, lm, cf, pr)
          }
        }
      }
  }
}
