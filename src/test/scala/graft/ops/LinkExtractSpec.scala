package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** [[LinkExtract]] scanner corners beyond the q391 fixture (which
  * pins values against the python twin + urljoin). */
class LinkExtractSpec extends AnyFunSuite {

  test("first href wins; closing tags and boolean hrefs emit nothing") {
    assert(LinkExtract.hrefs(
      """<a href="first" href="second">x</a>""") === Seq("first"))
    assert(LinkExtract.hrefs("""</a href="no"><a href>y</a>""") ===
      Seq.empty)
    assert(LinkExtract.hrefs("""<A HREF="caps">z</A>""") ===
      Seq("caps"))
    // href on a non-anchor tag is not a link
    assert(LinkExtract.hrefs("""<link href="style.css">""") === Seq.empty)
  }

  test("hostile input never throws: truncated tags, unterminated " +
    "quotes and comments, null") {
    assert(LinkExtract.hrefs(null) === Seq.empty)
    assert(LinkExtract.hrefs("<a href=\"unterminated") === Seq.empty)
    assert(LinkExtract.hrefs("<!-- never closed <a href=\"x\">") ===
      Seq.empty)
    assert(LinkExtract.hrefs("<script><a href=\"x\">") === Seq.empty)
    assert(LinkExtract.hrefs("<a href=") === Seq.empty) // torn tag
    // an empty-valued href in a CLOSED tag is a same-document ref,
    // same as href="" — emitted as ""
    assert(LinkExtract.hrefs("<a href= >") === Seq(""))
    assert(LinkExtract.hrefs("<a href=x.html>t</a>") === Seq("x.html"))
  }

  test("entity decode in hrefs is one-pass; whitespace trimmed") {
    assert(LinkExtract.hrefs("""<a href=" /p?a=1&amp;b=2 ">x</a>""") ===
      Seq("/p?a=1&b=2"))
    assert(LinkExtract.hrefs("""<a href="&amp;lt;">x</a>""") ===
      Seq("&lt;"))
  }
}
