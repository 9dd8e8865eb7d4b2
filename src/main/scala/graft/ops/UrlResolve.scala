package graft.ops

/** RFC 3986 URI reference resolution (§5) — the step between an
  * extracted href and a crawlable absolute URL: relative references,
  * dot segments, scheme-relative (`//host/x`), query-only and
  * fragment-only refs all resolve against the page's own URL. The
  * link-graph front end ([[LinkExtract]]) and the frontier composition
  * depend on it; q391 gates it against an independent python RFC
  * implementation triangulated with CPython's `urllib.parse.urljoin`.
  *
  * Implemented exactly per the RFC:
  *  - §B parsing regex (scheme / authority / path / query / fragment);
  *  - §5.2.2 transform references, STRICT mode (a ref carrying its own
  *    scheme is taken whole — the lenient same-scheme exception is
  *    explicitly not taken, matching the RFC's recommendation);
  *  - §5.2.3 path merge (authority-with-empty-path base → "/" + ref
  *    path, else replace after the last "/");
  *  - §5.2.4 remove_dot_segments (".." clamps at root);
  *  - §5.3 recomposition. No percent-(de)coding and no case
  *    normalization here — resolution and normalization are separate
  *    RFC sections, and a link graph wants the bytes the crawler will
  *    actually request. UrlResolveSpec pins the RFC's OWN §5.4
  *    normal + abnormal example tables verbatim. */
object UrlResolve {

  final case class Parts(scheme: String, authority: String,
      path: String, query: String, fragment: String)

  private val RfcB =
    "^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\\?([^#]*))?(#(.*))?".r

  /** RFC appendix-B split; missing components are null (the RFC's
    * defined/undefined distinction matters: an EMPTY query is not an
    * ABSENT query). */
  def parse(uri: String): Parts = {
    val m = RfcB.findFirstMatchIn(Option(uri).getOrElse("")).get
    Parts(m.group(2), m.group(4), Option(m.group(5)).getOrElse(""),
      m.group(7), m.group(9))
  }

  /** §5.2.4 remove_dot_segments. */
  private[ops] def removeDotSegments(path: String): String = {
    val out = new StringBuilder
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        val cut = out.toString.lastIndexOf('/')
        out.setLength(math.max(cut, 0))
      } else if (in == "/..") {
        in = "/"
        val cut = out.toString.lastIndexOf('/')
        out.setLength(math.max(cut, 0))
      } else if (in == "." || in == "..") in = ""
      else {
        val next = in.indexOf('/', 1)
        if (next < 0) { out.append(in); in = "" }
        else { out.append(in.substring(0, next)); in = in.substring(next) }
      }
    }
    out.toString
  }

  /** §5.2.3 merge. */
  private def merge(base: Parts, refPath: String): String =
    if (base.authority != null && base.path.isEmpty) "/" + refPath
    else {
      val cut = base.path.lastIndexOf('/')
      if (cut < 0) refPath else base.path.substring(0, cut + 1) + refPath
    }

  /** §5.2.2 + §5.3: resolve `ref` against absolute `base`. */
  def resolve(base: String, ref: String): String = {
    val b = parse(base)
    val r = parse(ref)
    val t =
      if (r.scheme != null)
        Parts(r.scheme, r.authority, removeDotSegments(r.path),
          r.query, r.fragment)
      else if (r.authority != null)
        Parts(b.scheme, r.authority, removeDotSegments(r.path),
          r.query, r.fragment)
      else if (r.path.isEmpty) {
        val q = if (r.query != null) r.query else b.query
        Parts(b.scheme, b.authority, b.path, q, r.fragment)
      } else {
        val p = if (r.path.startsWith("/")) removeDotSegments(r.path)
          else removeDotSegments(merge(b, r.path))
        Parts(b.scheme, b.authority, p, r.query, r.fragment)
      }
    val sb = new StringBuilder
    if (t.scheme != null) { sb.append(t.scheme); sb.append(':') }
    if (t.authority != null) { sb.append("//"); sb.append(t.authority) }
    sb.append(t.path)
    if (t.query != null) { sb.append('?'); sb.append(t.query) }
    if (t.fragment != null) { sb.append('#'); sb.append(t.fragment) }
    sb.toString
  }

  // ---------------- RFC 3986 §6 normalization ----------------

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' ||
      c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  private val HexUpper = "0123456789ABCDEF"

  /** §6.2.2.2 percent-encoding normalization over one component:
    * decode escapes of UNRESERVED characters (only those — decoding a
    * reserved char could change which octets act as delimiters),
    * uppercase the hex digits of every retained escape. Invalid
    * escapes (truncated or non-hex) pass through verbatim — hostile
    * bytes never throw. `lower` additionally lowercases literal and
    * decoded characters (the host's §6.2.2.1 case rule) without
    * touching retained escape hex digits. */
  private[ops] def pctNormalize(s: String, lower: Boolean): String = {
    val n = s.length
    val sb = new StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n && hexVal(s.charAt(i + 1)) >= 0 &&
        hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        val ch = v.toChar
        if (v < 0x80 && isUnreserved(ch))
          sb.append(if (lower) Character.toLowerCase(ch) else ch)
        else {
          sb.append('%')
          sb.append(HexUpper.charAt(v >> 4))
          sb.append(HexUpper.charAt(v & 0xf))
        }
        i += 3
      } else {
        sb.append(if (lower) Character.toLowerCase(c) else c)
        i += 1
      }
    }
    sb.toString
  }

  /** Scheme → default port (§6.2.3; the schemes a crawl pipeline
    * meets). Unknown schemes drop only an EMPTY port. */
  private def defaultPort(scheme: String): String = scheme match {
    case "http" | "ws" => "80"
    case "https" | "wss" => "443"
    case "ftp" => "21"
    case _ => null
  }

  private def canonAuthority(a: String, scheme: String): String = {
    val at = a.lastIndexOf('@')
    val (user, hostPort) =
      if (at >= 0) (a.substring(0, at), a.substring(at + 1))
      else (null, a)
    // IPv6 literals keep their brackets; the port follows the LAST
    // ':' outside brackets (the host() rule)
    val close = hostPort.lastIndexOf(']')
    val colon = hostPort.indexOf(':', math.max(close, 0))
    val (host, port) =
      if (colon >= 0) (hostPort.substring(0, colon),
        hostPort.substring(colon + 1))
      else (hostPort, null)
    val sb = new StringBuilder
    if (user != null) { sb.append(pctNormalize(user, lower = false)); sb.append('@') }
    sb.append(pctNormalize(host, lower = true))
    // §6.2.3: omit the ':' when the port is empty or the scheme default
    if (port != null && port.nonEmpty &&
      (scheme == null || port != defaultPort(scheme))) {
      sb.append(':'); sb.append(port)
    }
    sb.toString
  }

  /** RFC 3986 §6.2.2 syntax-based + §6.2.3 scheme-based normalization
    * of an ABSOLUTE URL — the canonical graph-node / dedup key
    * ([[resolve]] stops at §5 by design: resolution and normalization
    * are separate RFC sections, and the raw resolved bytes are what a
    * strict crawler requests; canonicalization is the equivalence
    * step stacked on top for keys). Applied rules:
    *
    *  - §6.2.2.1 case: scheme and host lowercase;
    *  - §6.2.2.2 percent-encoding: decode escapes of unreserved
    *    characters, uppercase the hex of retained escapes (per
    *    component — userinfo/host/path/query/fragment);
    *  - §6.2.2.3 path segments: remove_dot_segments;
    *  - §6.2.3 scheme-based: drop the port when empty or the scheme
    *    default (http/ws 80, https/wss 443, ftp 21); empty path with
    *    an authority → "/" for http(s).
    *
    * Defined/undefined distinctions survive (an EMPTY query keeps its
    * '?'; the RFC leaves that equivalence to individual schemes).
    * Null → "". Relative references are not this function's domain
    * (resolve first); dot segments are still removed if one is
    * passed. q395 gates it against an independent python twin with
    * urllib quote/unquote triangulation where semantics agree. */
  def canonicalize(url: String): String = {
    val p = parse(url)
    val scheme = if (p.scheme == null) null else p.scheme.toLowerCase
    val auth =
      if (p.authority == null) null else canonAuthority(p.authority, scheme)
    var path = removeDotSegments(pctNormalize(p.path, lower = false))
    if (auth != null && path.isEmpty &&
      (scheme == "http" || scheme == "https")) path = "/"
    val sb = new StringBuilder
    if (scheme != null) { sb.append(scheme); sb.append(':') }
    if (auth != null) { sb.append("//"); sb.append(auth) }
    sb.append(path)
    if (p.query != null) {
      sb.append('?'); sb.append(pctNormalize(p.query, lower = false))
    }
    if (p.fragment != null) {
      sb.append('#'); sb.append(pctNormalize(p.fragment, lower = false))
    }
    sb.toString
  }

  /** Host of an absolute URL (authority minus userinfo/port),
    * lowercased — the link-graph aggregation key. Null when the URL
    * has no authority. */
  def host(url: String): String = {
    val a = parse(url).authority
    if (a == null) null
    else {
      val afterUser = {
        val at = a.lastIndexOf('@')
        if (at >= 0) a.substring(at + 1) else a
      }
      // IPv6 literals keep their brackets; a port follows the LAST
      // ':' outside brackets
      val close = afterUser.lastIndexOf(']')
      val colon = afterUser.indexOf(':', math.max(close, 0))
      val h = if (colon >= 0) afterUser.substring(0, colon) else afterUser
      if (h.isEmpty) null else h.toLowerCase
    }
  }

  /** Multi-label PUBLIC suffixes — a FROZEN subset of the Public
    * Suffix List (publicsuffix.org; Mozilla's registry of suffixes
    * under which domains are registered to distinct parties). The
    * full list is ~10k entries and versioned; a crawl deployment
    * ships the current file and feeds it through the same
    * longest-match rule — the subset here covers the major ccTLD
    * second-level registries plus the highest-traffic PRIVATE
    * registries (a.blogspot.com and b.blogspot.com are different
    * publishers and must not share a politeness clock or an
    * authority score). Single-label suffixes (com, org, any TLD)
    * need no table: they are the longest-match fallback. */
  private val MultiLabelSuffixes: Set[String] = Set(
    // ccTLD second-level registries
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "org.mx", "gob.mx",
    "co.in", "net.in", "org.in", "gov.in",
    "co.kr", "or.kr", "go.kr",
    "com.tw", "org.tw", "com.sg", "com.hk", "com.my",
    "co.za", "org.za", "com.ar", "com.tr", "com.pl",
    "co.nz", "org.nz", "net.nz",
    // private registries (PSL "PRIVATE DOMAINS" section)
    "blogspot.com", "github.io", "gitlab.io", "herokuapp.com",
    "appspot.com", "netlify.app", "vercel.app", "web.app",
    "s3.amazonaws.com", "cloudfront.net", "azurewebsites.net",
    "wordpress.com", "tumblr.com", "neocities.org")

  private def isIpv4(host: String): Boolean = {
    val parts = host.split("\\.", -1)
    parts.length == 4 && parts.forall(p =>
      p.nonEmpty && p.length <= 3 && p.forall(_.isDigit) &&
        p.toInt <= 255)
  }

  /** Registrable domain (eTLD+1) of a host — the PARTY boundary a
    * crawler schedules and scores by: `www.site.com` and `site.com`
    * are one publisher (one politeness clock, one authority bucket);
    * `a.blogspot.com` and `b.blogspot.com` are two. Longest-suffix
    * match against [[MultiLabelSuffixes]] (3- then 2-label), else
    * the single-label TLD; registrable = suffix + one label. A host
    * that IS a suffix (or shorter) returns itself; IPv4 literals and
    * bracketed IPv6 return verbatim (an IP is its own party); null →
    * null. Input is assumed already lowercased ([[canonicalize]] /
    * [[host]] output) but is lowercased defensively. */
  def registrableDomain(hostName: String): String = {
    if (hostName == null) return null
    val h = hostName.toLowerCase
    if (h.isEmpty || h.startsWith("[") || isIpv4(h)) return h
    val labels = h.split("\\.", -1)
    val n = labels.length
    val suffixLen =
      if (n >= 4 && MultiLabelSuffixes(labels.takeRight(3).mkString(".")))
        3
      else if (n >= 3 &&
        MultiLabelSuffixes(labels.takeRight(2).mkString("."))) 2
      else if (n >= 3 &&
        MultiLabelSuffixes(labels.takeRight(3).mkString("."))) 3
      else 1
    if (n <= suffixLen + 1) h
    else labels.takeRight(suffixLen + 1).mkString(".")
  }
}
