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

  test("§6 canonicalize: case, ports, escapes, dot segments") {
    val cases = Seq(
      // §6.2.2.1 case + §6.2.3 default port + empty http path
      "HTTP://WWW.Example.COM:80/a/b" -> "http://www.example.com/a/b",
      "https://Example.com:443/" -> "https://example.com/",
      "http://example.com" -> "http://example.com/",
      "http://example.com:8080/x" -> "http://example.com:8080/x",
      "http://example.com:/x" -> "http://example.com/x", // empty port
      // leading-zero port is NOT the default string: kept verbatim
      "https://example.com:00443/x" -> "https://example.com:00443/x",
      // §6.2.2.2 unreserved decode + retained-escape uppercase
      "http://example.com/%7Euser/%2fpath" ->
        "http://example.com/~user/%2Fpath",
      "http://EXAMPLE.com/%41%62c" -> "http://example.com/Abc",
      "http://ex%41mple.com/x" -> "http://example.com/x",
      // §6.2.2.3 dot segments (after escape decode: %2E -> '.')
      "http://example.com/a/./b/../c" -> "http://example.com/a/c",
      "http://example.com/a/b/../../../x" -> "http://example.com/x",
      "http://example.com/a/%2E%2E/b" -> "http://example.com/b",
      // userinfo escapes decode, case preserved
      "http://u%7Eser:p@example.com/x" -> "http://u~ser:p@example.com/x",
      // IPv6 literal: host lowercase, default port dropped
      "http://[2001:DB8::1]:80/x" -> "http://[2001:db8::1]/x",
      "http://[2001:db8::1]:8080/x" -> "http://[2001:db8::1]:8080/x",
      // other schemes: ftp default port; empty path NOT forced to "/"
      "ftp://Example.com:21/f" -> "ftp://example.com/f",
      "ftp://example.com" -> "ftp://example.com",
      "wss://Example.com:443/socket" -> "wss://example.com/socket",
      // defined-but-empty query survives; fragments normalize too
      "http://example.com/?" -> "http://example.com/?",
      "http://example.com#f" -> "http://example.com/#f",
      "http://example.com/x?q=%7e&b=%2F#Frag%7e" ->
        "http://example.com/x?q=~&b=%2F#Frag~",
      // invalid escapes pass through verbatim, never throw
      "http://example.com/%zz/%4" -> "http://example.com/%zz/%4",
      // no authority: only the scheme lowercases
      "mailto:John@Example.com" -> "mailto:John@Example.com",
      "Http://a.COM/p/../" -> "http://a.com/")
    cases.foreach { case (raw, want) =>
      assert(UrlResolve.canonicalize(raw) === want, s"raw=$raw")
    }
    assert(UrlResolve.canonicalize(null) === "")
  }

  test("canonicalize is idempotent on every spec vector") {
    val vectors = Seq("HTTP://WWW.Example.COM:80/a/b",
      "http://example.com/%7Euser/%2fpath", "http://example.com",
      "http://u%7Eser:p@example.com/x", "http://[2001:DB8::1]:80/x",
      "http://example.com/%zz/%4", "mailto:John@Example.com")
    vectors.foreach { v =>
      val once = UrlResolve.canonicalize(v)
      assert(UrlResolve.canonicalize(once) === once, s"v=$v")
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

  test("registrableDomain: PSL longest match, private registries, " +
    "IP literals, suffix-only hosts") {
    val rd = UrlResolve.registrableDomain _
    assert(rd("www.site.com") === "site.com")
    assert(rd("site.com") === "site.com")
    assert(rd("a.b.site.co.uk") === "site.co.uk",
      "ccTLD second-level registry")
    assert(rd("x.co.uk") === "x.co.uk")
    assert(rd("co.uk") === "co.uk", "a host that IS a suffix")
    assert(rd("a.blogspot.com") === "a.blogspot.com",
      "private registry: each subdomain its own party")
    assert(rd("deep.a.blogspot.com") === "a.blogspot.com")
    assert(rd("bucket.s3.amazonaws.com") === "bucket.s3.amazonaws.com",
      "3-label private suffix")
    assert(rd("deep.x.y.site.org") === "site.org")
    assert(rd("203.0.113.7") === "203.0.113.7", "IPv4 verbatim")
    assert(rd("999.0.113.7") === "113.7",
      "not a valid IPv4 octet -> treated as labels")
    assert(rd("[2001:db8::1]") === "[2001:db8::1]", "IPv6 verbatim")
    assert(rd("WWW.Site.COM") === "site.com", "defensive lowercase")
    assert(rd("com") === "com")
    assert(rd(null) === null)
  }
}
