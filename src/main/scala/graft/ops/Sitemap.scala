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
