package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** RFC 3986 §5.4's OWN example tables, verbatim — the normative test
  * vectors for reference resolution (base = `http://a/b/c/d;p?q`),
  * plus host extraction edges. */
class UrlResolveSpec extends AnyFunSuite {

  private val base = "http://a/b/c/d;p?q"

  test("RFC 3986 §5.4.1 normal examples") {
    val cases = Seq(
      "g:h" -> "g:h",
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q#s",
      "g#s" -> "http://a/b/c/g#s",
      "g?y#s" -> "http://a/b/c/g?y#s",
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "g;x?y#s" -> "http://a/b/c/g;x?y#s",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    cases.foreach { case (ref, want) =>
      assert(UrlResolve.resolve(base, ref) === want, s"ref=$ref")
    }
  }

  test("RFC 3986 §5.4.2 abnormal examples (incl. strict-mode http:g)") {
    val cases = Seq(
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      "g?y/./x" -> "http://a/b/c/g?y/./x",
      "g?y/../x" -> "http://a/b/c/g?y/../x",
      "g#s/./x" -> "http://a/b/c/g#s/./x",
      "g#s/../x" -> "http://a/b/c/g#s/../x",
      "http:g" -> "http:g") // STRICT parser, per the RFC's own note
    cases.foreach { case (ref, want) =>
      assert(UrlResolve.resolve(base, ref) === want, s"ref=$ref")
    }
  }

  test("authority edges: empty base path merge, host extraction") {
    assert(UrlResolve.resolve("http://h.example", "x/y") ===
      "http://h.example/x/y") // §5.2.3 first branch
    assert(UrlResolve.host("http://User@H.Example:8080/p") ===
      "h.example")
    assert(UrlResolve.host("https://[2001:db8::1]:443/p") ===
      "[2001:db8::1]")
    assert(UrlResolve.host("mailto:x@y") === null) // no authority
    assert(UrlResolve.host("http:///p") === null) // empty authority
  }
}
