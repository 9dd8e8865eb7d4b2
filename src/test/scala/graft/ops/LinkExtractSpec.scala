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

  test("anchor text: tags strip, entities decode, ws collapses, a " +
    "second <a> implicitly closes, torn anchors keep their text") {
    assert(LinkExtract.anchors(
      """<a href="x"><b>Bold</b>  and&amp;more
      </a>""") === Seq(("x", "Bold and&more")))
    // HTML forbids nested anchors: the second <a> closes the first
    assert(LinkExtract.anchors(
      """<a href="x">one <a href="y">two</a>""") ===
      Seq(("x", "one"), ("y", "two")))
    // torn anchor at EOF keeps gathered text
    assert(LinkExtract.anchors("""<a href="x">dangling tex""") ===
      Seq(("x", "dangling tex")))
    // a script inside an anchor contributes nothing
    assert(LinkExtract.anchors(
      """<a href="x">ok<script>junk</script>!</a>""") ===
      Seq(("x", "ok!")))
    // nbsp becomes a plain space and collapses
    assert(LinkExtract.anchors(
      """<a href="x">a&nbsp;&nbsp;b</a>""") === Seq(("x", "a b")))
  }

  test("entity decode in hrefs is one-pass; whitespace trimmed") {
    assert(LinkExtract.hrefs("""<a href=" /p?a=1&amp;b=2 ">x</a>""") ===
      Seq("/p?a=1&b=2"))
    assert(LinkExtract.hrefs("""<a href="&amp;lt;">x</a>""") ===
      Seq("&lt;"))
  }
}
