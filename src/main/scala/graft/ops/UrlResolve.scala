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
}
