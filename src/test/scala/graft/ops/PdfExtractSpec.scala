package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Edges of the PDF subset parser (q354 gates the constructed fixture
  * corpus; this pins hostile bytes and string-syntax corners on
  * controlled data). */
class PdfExtractSpec extends AnyFunSuite {

  private def wrap(content: String): Array[Byte] =
    (s"%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nendobj\n" +
      s"2 0 obj\n<< /Length ${content.length} >>\nstream\n" +
      content + "\nendstream\nendobj\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  test("string syntax corners decode per spec") {
    val c = "BT (a\\(b\\)c) Tj 0 -14 Td ((nested (parens)) ok) Tj " +
      "0 -14 Td (oct \\101\\102) Tj 0 -14 Td <48 49> Tj ET"
    val (text, pages) = PdfExtract.extract(wrap(c)).get
    assert(text === "a(b)c\n(nested (parens)) ok\noct AB\nHI")
    assert(pages === 1)
  }

  test("strings outside BT/ET are ignored; TJ concatenates; ' breaks line") {
    val c = "(ignored) Tj BT [(x) -200 (y)] TJ (z) ' ET (also ignored) Tj"
    val (text, _) = PdfExtract.extract(wrap(c)).get
    assert(text === "xy\nz")
  }

  test("hostile bytes: None or degraded, never an exception") {
    assert(PdfExtract.extract(Array.empty[Byte]).isEmpty)
    assert(PdfExtract.extract("not a pdf".getBytes).isEmpty)
    // header but garbage body: parses to empty text, zero pages
    val junk = PdfExtract.extract("%PDF-1.4\ngarbage".getBytes)
    assert(junk.contains(("", 0)))
    // unterminated stream
    PdfExtract.extract("%PDF-1.4\n<< >>\nstream\nBT (x) Tj".getBytes)
    // corrupt Flate payload is skipped, not fatal
    val bad = ("%PDF-1.4\n<< /Length 4 /Filter /FlateDecode >>\n" +
      "stream\nXXXX\nendstream\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfExtract.extract(bad).contains(("", 0)))
    // truncated fixture file
    val real = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "src/test/resources/graft/sources/pdfs/doc_001.pdf"))
    PdfExtract.extract(real.take(real.length / 2))
  }

  test("page count: /Type /Pages is not a page") {
    val b = ("%PDF-1.4\n<< /Type /Pages /Count 2 >>\n" +
      "<< /Type /Page >>\n<< /Type /Page >>\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfExtract.extract(b).get._2 === 2)
  }

  // ---- positioned extraction (q364): Td/TD/Tm/TL/T* + reading order

  test("positioned: two-column interleaved stream reads column-major") {
    val c = "BT /F1 12 Tf " +
      "1 0 0 1 72 720 Tm (L1) Tj 1 0 0 1 320 720 Tm (R1) Tj " +
      "1 0 0 1 72 706 Tm (L2) Tj 1 0 0 1 320 706 Tm (R2) Tj ET"
    val (pos, _) = PdfExtract.extractPositioned(wrap(c)).get
    assert(pos === "L1\nL2\nR1\nR2")
    // the stream-order extractor keeps the interleaving (Tm is not a
    // line break for it) — the contrast that motivates this path
    val (plain, _) = PdfExtract.extract(wrap(c)).get
    assert(plain === "L1R1L2R2")
  }

  test("positioned: TD sets leading, T* and ' advance lines") {
    val c = "BT 72 720 Td (head) Tj 0 -16 TD (a) Tj " +
      "T* (b) Tj (c) ' ET"
    val (t, _) = PdfExtract.extractPositioned(wrap(c)).get
    assert(t === "head\na\nb\nc")
  }

  test("positioned: indent stays in column; same-line join rules") {
    val c = "BT 1 0 0 1 72 720 Tm (margin) Tj " +
      "1 0 0 1 90 706 Tm (indented) Tj " + // 18 < columnGap: same col
      "1 0 0 1 72 692 Tm (segA) Tj 1 0 0 1 85 692 Tm (segB) Tj " +
      "1 0 0 1 72 678 Tm (AB) Tj (CD) Tj ET" // same origin: concat
    val (t, _) = PdfExtract.extractPositioned(wrap(c)).get
    assert(t === "margin\nindented\nsegA segB\nABCD")
  }

  test("positioned: hostile bytes never throw; non-PDF is None") {
    assert(PdfExtract.extractPositioned(Array.empty[Byte]).isEmpty)
    assert(PdfExtract.extractPositioned("no pdf".getBytes).isEmpty)
    val junk = PdfExtract.extractPositioned("%PDF-1.4\nzz".getBytes)
    assert(junk.contains(("", 0)))
    PdfExtract.extractPositioned(
      "%PDF-1.4\n<< >>\nstream\nBT 1 2 Tm (x Tj".getBytes)
  }
}
