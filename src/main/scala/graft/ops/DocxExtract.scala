package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** DOCX → text extraction — the other document format every corpus
  * shelf carries. A .docx is a ZIP (JDK `ZipInputStream`) whose
  * `word/document.xml` holds the text; the JDK's own SAX parser (the
  * platform seam, like ImageIO for JPEG) walks it with a tiny
  * handler:
  *
  *  - characters inside `w:t` elements are text (including
  *    `xml:space="preserve"` whitespace — SAX hands it through);
  *  - `w:p` (paragraph) end emits a newline; `w:br` and `w:cr` emit a
  *    newline; `w:tab` emits a tab;
  *  - everything else (styling, tables' cell structure beyond their
  *    paragraphs, headers, media) contributes nothing.
  *
  * Output lines are trimmed of trailing whitespace; empty lines drop;
  * join with \n (the [[HtmlExtract]] convention). Also counts
  * paragraphs. XXE/entity expansion is disabled on the parser
  * (hostile-bytes safety includes hostile XML); any ZIP/XML failure
  * → None, never an exception; entry size capped at 64 MiB.
  *
  * The q357 fixtures are CONSTRUCTED by scripts/gen_docx_fixture.py
  * (stdlib zipfile + hand-written WordprocessingML, no shared code)
  * from known line lists — the twin is those lines verbatim. */
object DocxExtract {

  /** Parsed document: text + paragraph count; None if not a docx. */
  def extract(b: Array[Byte]): Option[(String, Int)] =
    try extractImpl(b)
    catch { case _: Exception => None }

  private def extractImpl(b: Array[Byte]): Option[(String, Int)] = {
    if (b.length < 4 || b(0) != 'P' || b(1) != 'K') return None
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        if (entry.getName == "word/document.xml") {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zin.read(buf)
          while (n >= 0 && out.size < (64 << 20)) {
            out.write(buf, 0, n)
            n = zin.read(buf)
          }
          return parseDocumentXml(out.toByteArray)
        }
        entry = zin.getNextEntry
      }
      None
    } finally zin.close()
  }

  private def parseDocumentXml(xml: Array[Byte]): Option[(String, Int)] = {
    val factory = javax.xml.parsers.SAXParserFactory.newInstance()
    factory.setNamespaceAware(false)
    // hostile XML: no DTDs, no external entities, no expansion bombs
    factory.setFeature(
      "http://apache.org/xml/features/disallow-doctype-decl", true)
    factory.setFeature(
      "http://xml.org/sax/features/external-general-entities", false)
    factory.setFeature(
      "http://xml.org/sax/features/external-parameter-entities", false)
    val sb = new StringBuilder
    var paragraphs = 0
    val handler = new org.xml.sax.helpers.DefaultHandler {
      private var inT = false
      override def startElement(uri: String, local: String, qName: String,
          atts: org.xml.sax.Attributes): Unit = qName match {
        case "w:t" => inT = true
        case "w:tab" => sb.append('\t')
        case "w:br" | "w:cr" => sb.append('\n')
        case _ => ()
      }
      override def endElement(uri: String, local: String,
          qName: String): Unit = qName match {
        case "w:t" => inT = false
        case "w:p" => sb.append('\n'); paragraphs += 1
        case _ => ()
      }
      override def characters(ch: Array[Char], start: Int,
          length: Int): Unit =
        if (inT && sb.length < (4 << 20)) sb.appendAll(ch, start, length)
    }
    factory.newSAXParser().parse(
      new java.io.ByteArrayInputStream(xml), handler)
    val lines = sb.toString.split("\n", -1)
      .map(_.replaceAll("\\s+$", "")).filter(_.nonEmpty)
    Some((lines.mkString("\n"), paragraphs))
  }

  /** FULL-package extraction (q378, closing the documented body-only
    * boundary): body (word/document.xml) PLUS headers
    * (word/headerN.xml, concatenated in file-name order), footers
    * (word/footerN.xml, same), and footnotes (word/footnotes.xml —
    * the w:type="separator"/"continuationSeparator" stubs hold no
    * w:t text and drop naturally under the empty-line rule). Same
    * per-part line convention, caps, and hostile-XML hardening as
    * [[extract]]; None only when the blob is not a docx at all. */
  final case class DocxFull(body: String, header_text: String,
      footer_text: String, footnotes_text: String, n_paragraphs: Int)

  def extractFull(b: Array[Byte]): Option[DocxFull] =
    try extractFullImpl(b)
    catch { case _: Exception => None }

  private def extractFullImpl(b: Array[Byte]): Option[DocxFull] = {
    if (b.length < 4 || b(0) != 'P' || b(1) != 'K') return None
    val parts = scala.collection.mutable.LinkedHashMap[String,
      Array[Byte]]()
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        val n = entry.getName
        val wanted = n == "word/document.xml" ||
          n == "word/footnotes.xml" ||
          (n.startsWith("word/header") && n.endsWith(".xml")) ||
          (n.startsWith("word/footer") && n.endsWith(".xml"))
        if (wanted) {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var k = zin.read(buf)
          while (k >= 0 && out.size < (64 << 20)) {
            out.write(buf, 0, k)
            k = zin.read(buf)
          }
          parts(n) = out.toByteArray
        }
        entry = zin.getNextEntry
      }
    } finally zin.close()
    if (!parts.contains("word/document.xml")) return None
    def textOf(name: String): (String, Int) =
      parts.get(name).flatMap(parseDocumentXml).getOrElse(("", 0))
    def joined(prefix: String): String =
      parts.keys.toSeq.filter(n =>
        n.startsWith(prefix) && n.endsWith(".xml")).sorted
        .map(n => textOf(n)._1).filter(_.nonEmpty).mkString("\n")
    val (body, nPara) = textOf("word/document.xml")
    Some(DocxFull(body, joined("word/header"), joined("word/footer"),
      textOf("word/footnotes.xml")._1, nPara))
  }

  /** One extracted document. */
  final case class DocxText(id: Long, text: String, n_paragraphs: Int)

  /** Map-only extraction over a binary column; non-docx blobs (or any
    * hostile ZIP/XML) dropped. */
  def docxToText(df: DataFrame, idCol: String,
      binCol: String): Dataset[DocxText] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          extract(Option(bytes).getOrElse(Array.empty))
            .map { case (t, p) => DocxText(id, t, p) }
        }
      }
  }

  /** One fully-extracted document (q378). */
  final case class DocxFullRow(id: Long, body: String,
      header_text: String, footer_text: String, footnotes_text: String,
      n_paragraphs: Int)

  /** Map-only FULL-package extraction over a binary column. */
  def docxToTextFull(df: DataFrame, idCol: String,
      binCol: String): Dataset[DocxFullRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          extractFull(Option(bytes).getOrElse(Array.empty))
            .map(f => DocxFullRow(id, f.body, f.header_text,
              f.footer_text, f.footnotes_text, f.n_paragraphs))
        }
      }
  }
}
