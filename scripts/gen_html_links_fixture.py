#!/usr/bin/env python3
"""Generate the HTML link-extraction fixture + twin for the q391 gate
(graft.ops.LinkExtract + graft.ops.UrlResolve — hrefs of opening <a>
tags resolved per RFC 3986 §5 against the page URL).

INDEPENDENT python implementations of the same two documented specs
(no code shared with the Scala ops): the quote-aware tag walk with
comment/declaration skip and script/style/noscript swallow, the
attribute scanner (first href wins, quoted or unquoted, one-pass
entity decode, ASCII trim), and the RFC resolution algorithm
(§5.2.2–§5.2.4 strict). Every resolved value is TRIANGULATED against
CPython's urllib.parse.urljoin (an RFC 3986 implementation maintained
independently of both) — asserted equal on every fixture link.

Planted: relative/dot-segment/beyond-root refs, scheme-relative
//host, query-only, fragment-only, empty href (base minus fragment),
entity-encoded &amp; in a query string, unquoted and single-quoted
and mixed-case HREF, a boolean href (no value — skipped), <a> without
href, hrefs inside comments and scripts (must NOT extract), a '>'
inside a quoted attribute value, multibyte text around tags.

  python3 scripts/gen_html_links_fixture.py

Outputs: src/test/resources/graft/sources/html_links/page_N.html
         src/test/resources/graft/sources/html_links_twin.parquet
"""
import os
import re
from urllib.parse import urljoin

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
HL_DIR = os.path.join(OUT, "html_links")

NAMED = {"amp": "&", "lt": "<", "gt": ">", "quot": '"',
         "apos": "'", "nbsp": " "}
RAW = {"script", "style", "noscript"}
WS = " \t\n\r\f"


def decode_entities(s):
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "&":
            semi = s.find(";", i + 1)
            if semi > i and semi - i <= 12:
                body = s[i + 1:semi]
                if body in NAMED:
                    out.append(NAMED[body])
                    i = semi + 1
                    continue
                if len(body) > 1 and body[0] == "#":
                    try:
                        cp = (int(body[2:], 16)
                              if body[1] in "xX" else int(body[1:]))
                    except ValueError:
                        cp = -1
                    if 0 <= cp < 0x110000:
                        out.append(chr(cp))
                        i = semi + 1
                        continue
        out.append(c)
        i += 1
    return "".join(out)


def find_href(html, from_, until):
    k = from_
    while k < until:
        while k < until and (html[k] in WS or html[k] == "/"):
            k += 1
        name_start = k
        while k < until and html[k] not in WS and html[k] != "=":
            k += 1
        name = html[name_start:k]
        while k < until and html[k] in WS:
            k += 1
        value = None
        if k < until and html[k] == "=":
            k += 1
            while k < until and html[k] in WS:
                k += 1
            if k < until and html[k] in "\"'":
                q = html[k]
                close = html.find(q, k + 1)
                stop = until if (close < 0 or close > until) else close
                value = html[k + 1:stop]
                k = until if (close < 0 or close > until) else close + 1
            else:
                vs = k
                while k < until and html[k] not in WS:
                    k += 1
                value = html[vs:k]
        if name.lower() == "href" and value is not None:
            return decode_entities(value).strip(WS)
        if name_start == k:
            k += 1
    return None


def anchors(html):
    """(href, anchor_text) pairs — same walk as the Scala op: a new
    <a or a </a> closes the open anchor (no nesting); tags emit
    nothing into anchor text; comments/raw bodies skip; entities
    decode one-pass; U+00A0 -> space; explicit ASCII-ws runs collapse
    to one space and single leading/trailing spaces strip."""
    out = []
    n = len(html)
    i = 0
    cur_href = None
    cur_text = []

    def close_anchor():
        nonlocal cur_href
        if cur_href is not None:
            t = "".join(cur_text).replace("\u00a0", " ")
            t = re.sub("[ \t\n\r\f\x0b]+", " ", t)
            if t.startswith(" "):
                t = t[1:]
            if t.endswith(" "):
                t = t[:-1]
            out.append((cur_href, t))
            cur_href = None
        cur_text.clear()

    while i < n:
        c = html[i]
        if c == "<" and html[i + 1:i + 4] == "!--":
            end = html.find("-->", i + 4)
            i = n if end < 0 else end + 3
        elif c == "<" and i + 1 < n and html[i + 1] == "!":
            end = html.find(">", i + 2)
            i = n if end < 0 else end + 1
        elif c == "<" and i + 1 < n and (html[i + 1].isalpha()
                                         or html[i + 1] == "/"):
            closing = html[i + 1] == "/"
            j = i + (2 if closing else 1)
            name_start = j
            while j < n and html[j].isalnum():
                j += 1
            name = html[name_start:j].lower()
            quote = None
            end = -1
            k = j
            while end < 0 and k < n:
                ch = html[k]
                if quote:
                    if ch == quote:
                        quote = None
                elif ch in "\"'":
                    quote = ch
                elif ch == ">":
                    end = k
                k += 1
            if name == "a":
                close_anchor()
                # unterminated tag: consume to end, fabricate NO link
                if not closing and end >= 0:
                    h = find_href(html, j, end)
                    if h is not None:
                        cur_href = h
            i = n if end < 0 else end + 1
            if not closing and name in RAW and end >= 0:
                m = re.compile("</" + name, re.I).search(html, i)
                if m:
                    gt = html.find(">", m.start() + 2)
                    i = n if gt < 0 else gt + 1
                else:
                    i = n
        elif c == "&" and cur_href is not None:
            semi = html.find(";", i + 1)
            if semi > i and semi - i <= 12:
                body = html[i + 1:semi]
                if body in NAMED:
                    cur_text.append(NAMED[body])
                    i = semi + 1
                    continue
                if len(body) > 1 and body[0] == "#":
                    try:
                        cp = (int(body[2:], 16)
                              if body[1] in "xX" else int(body[1:]))
                    except ValueError:
                        cp = -1
                    if 0 <= cp < 0x110000:
                        cur_text.append(chr(cp))
                        i = semi + 1
                        continue
            cur_text.append(c)
            i += 1
        else:
            if cur_href is not None:
                cur_text.append(c)
            i += 1
    close_anchor()  # torn anchor at EOF keeps its text
    return out


# --------------- independent RFC 3986 §5 implementation ---------------

RFC_B = re.compile(
    r"^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?")


def parse(uri):
    m = RFC_B.match(uri)
    return (m.group(2), m.group(4), m.group(5) or "",
            m.group(7), m.group(9))


def remove_dot_segments(path):
    out = ""
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            out = out[:max(out.rfind("/"), 0)]
        elif path == "/..":
            path = "/"
            out = out[:max(out.rfind("/"), 0)]
        elif path in (".", ".."):
            path = ""
        else:
            nxt = path.find("/", 1)
            if nxt < 0:
                out += path
                path = ""
            else:
                out += path[:nxt]
                path = path[nxt:]
    return out


def resolve(base, ref):
    bs, ba, bp, bq, bf = parse(base)
    rs, ra, rp, rq, rf = parse(ref)
    if rs is not None:
        t = (rs, ra, remove_dot_segments(rp), rq, rf)
    elif ra is not None:
        t = (bs, ra, remove_dot_segments(rp), rq, rf)
    elif rp == "":
        t = (bs, ba, bp, rq if rq is not None else bq, rf)
    else:
        if rp.startswith("/"):
            p = remove_dot_segments(rp)
        else:
            merged = ("/" + rp if (ba is not None and bp == "")
                      else bp[:bp.rfind("/") + 1] + rp)
            p = remove_dot_segments(merged)
        t = (bs, ba, p, rq, rf)
    s, a, p, q, f = t
    out = ""
    if s is not None:
        out += s + ":"
    if a is not None:
        out += "//" + a
    out += p
    if q is not None:
        out += "?" + q
    if f is not None:
        out += "#" + f
    return out


# ----------------------------- fixtures ------------------------------

PAGES = [
    (0, "http://t.example/dir/page0.html", """<!DOCTYPE html><html>
<!-- <a href="http://commented.example/no"> -->
<body><a href="sub/one">rel</a>
<a href="./two">dot</a>
<a href="../up/three">up</a>
<a href="../../../beyond">clamped</a>
<a href="/rooted">root</a>
<a href="//cdn.example/lib">scheme-rel</a>
<a href="?q=1">query-only</a>
<a href="#frag">frag-only</a>
<a href="">empty</a>
<script>var x = '<a href="http://script.example/no">';</script>
</body></html>"""),
    (1, "http://u.example/a/b?base=q", """<html><body>
<a HREF=unquoted.html>caps-unquoted</a>
<a href='single'>single</a>
<a href="/x?a=1&amp;b=2">entity</a>
<a href="http://abs.example/p#s">absolute</a>
<a title="x > y" href="gt/inside">quoted-gt</a>
<a href>boolean-skipped</a>
<a name="anchor-only">no-href</a>
<a href="  spaced  ">trimmed</a>
日本語 <a href="多バイト/path">multibyte</a>
</body></html>"""),
    (2, "http://v.example", "<a href=\"x/y\">empty-base-path</a>"),
    (3, "http://w.example/only", "no links at all"),
]


def main():
    os.makedirs(HL_DIR, exist_ok=True)
    for old in os.listdir(HL_DIR):
        os.remove(os.path.join(HL_DIR, old))
    rows = []
    for pid, url, html in PAGES:
        with open(os.path.join(HL_DIR, f"page_{pid}.html"), "w",
                  encoding="utf-8") as f:
            f.write(html)
        for idx, (h, anc) in enumerate(anchors(html)):
            r = resolve(url, h)
            # triangulate with CPython's own RFC 3986 implementation
            third = urljoin(url, h)
            assert third == r, (url, h, r, third)
            rows.append((pid, url, idx, h, r, anc))
    byp = {}
    for r in rows:
        byp.setdefault(r[0], []).append(r)
    # planted truths
    p0 = [r[3] for r in byp[0]]
    assert "http://commented.example/no" not in [r[4] for r in byp[0]]
    assert all("script.example" not in r[4] for r in byp[0])
    assert len(p0) == 9, p0
    res0 = {r[3]: r[4] for r in byp[0]}
    assert res0["../../../beyond"] == "http://t.example/beyond"
    assert res0["//cdn.example/lib"] == "http://cdn.example/lib"
    assert res0["?q=1"] == "http://t.example/dir/page0.html?q=1"
    assert res0[""] == "http://t.example/dir/page0.html"
    res1 = {r[3]: r[4] for r in byp[1]}
    assert res1["/x?a=1&b=2"] == "http://u.example/x?a=1&b=2"
    assert res1["spaced"] == "http://u.example/a/spaced"
    assert res1["gt/inside"] == "http://u.example/a/gt/inside"
    assert len(byp[1]) == 7, byp[1]          # boolean + no-href skipped
    assert byp[2][0][4] == "http://v.example/x/y"  # empty-base-path merge
    assert 3 not in byp
    # anchor texts: tags contribute nothing, whitespace collapses
    anc0 = {r[3]: r[5] for r in byp[0]}
    assert anc0["sub/one"] == "rel"
    anc1 = {r[3]: r[5] for r in byp[1]}
    assert anc1["gt/inside"] == "quoted-gt"
    assert anc1["多バイト/path"] == "multibyte"

    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "page_id": pa.array([r[0] for r in rows], pa.int64()),
        "page_url": pa.array([r[1] for r in rows], pa.string()),
        "link_idx": pa.array([r[2] for r in rows], pa.int32()),
        "href": pa.array([r[3] for r in rows], pa.string()),
        "resolved": pa.array([r[4] for r in rows], pa.string()),
        "anchor": pa.array([r[5] for r in rows], pa.string()),
    }), os.path.join(OUT, "html_links_twin.parquet"))
    print(f"wrote {len(PAGES)} pages + twin ({len(rows)} links, "
          "all urljoin-triangulated)")


if __name__ == "__main__":
    main()
