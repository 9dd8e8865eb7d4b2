package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Edges of the DOCX extractor (q357 gates the constructed fixtures;
  * this pins hostile ZIP/XML). */
class DocxExtractSpec extends AnyFunSuite {

  private def docx(documentXml: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(documentXml.getBytes("UTF-8"))
    z.closeEntry(); z.close()
    bos.toByteArray
  }

  test("hostile inputs return None, never throw") {
    assert(DocxExtract.extract(Array.empty[Byte]).isEmpty)
    assert(DocxExtract.extract("not a zip".getBytes).isEmpty)
    // a zip without word/document.xml
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("other.txt"))
    z.write("x".getBytes); z.closeEntry(); z.close()
    assert(DocxExtract.extract(bos.toByteArray).isEmpty)
    // malformed XML inside
    assert(DocxExtract.extract(docx("<w:document><unclosed")).isEmpty)
    // truncated zip
    val good = docx("<w:document><w:body><w:p><w:r><w:t>x</w:t></w:r>" +
      "</w:p></w:body></w:document>")
    DocxExtract.extract(good.take(good.length / 2))
  }

  test("XXE / doctype is rejected, not expanded") {
    val evil = docx("""<?xml version="1.0"?>
      <!DOCTYPE d [<!ENTITY x SYSTEM "file:///etc/hostname">]>
      <w:document><w:body><w:p><w:r><w:t>&x;</w:t></w:r></w:p>
      </w:body></w:document>""")
    assert(DocxExtract.extract(evil).isEmpty,
      "doctype must be rejected outright")
  }

  test("minimal document round-trips") {
    val good = docx("<w:document><w:body><w:p><w:r><w:t>hello</w:t>" +
      "</w:r></w:p></w:body></w:document>")
    assert(DocxExtract.extract(good).contains(("hello", 1)))
  }
}
