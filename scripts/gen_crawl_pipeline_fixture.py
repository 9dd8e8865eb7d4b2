#!/usr/bin/env python3
"""Fixture + twins for the q400 END-TO-END crawl pipeline gate — the
round-14 shelf composed into ONE pipeline (the q365 funnel discipline:
stage interactions certified, per-host disposition):

  robots `Sitemap:` seeds (q388) → sitemap frontier walk (q379) →
  RFC 9309 admission (q386) → WARC fetch (q355 family) → HTML link
  extraction + RFC 3986 resolution (q391) → host graph (q392) →
  PageRank (q393).

Every stage's python half is the ALREADY-CERTIFIED independent twin,
imported — robots parse/is_allowed from gen_robots_fixture, RFC 3986
resolve from gen_html_links_fixture (urljoin-triangulated here again),
WARC record framing from gen_warc_fixture — so a divergence in any
stage interaction breaks the hash compare without any shared Scala
code.

Construction (agent `graftbot`):
  h0.example  robots: own-group Disallow /blocked/; sitemap INDEX
              sm0 → sm0a (/p/0..3) + sm0b (/p/4,/p/5,/blocked/x,y)
              — admitted 6/8; /p/5 planted as a FETCH FAILURE.
  h1.example  robots: * group /private/ denied, /private/ok allowed
              back (longest-match); urlset /private/secret,
              /private/ok/page, /a, /b — admitted 3/4; /b fetch fails.
  h2.example  robots: sitemap record only, no rules — 2/2 admitted.
  h3.example  robots: Disallow / — discovered 2, admitted 0 (the
              host-level dangling PageRank node).
Fetched pages carry links: a RELATIVE link (resolves on own host), an
absolute ext{i%2}.example link, an absolute next-host link (h0→h1→h2→
h0), every third page an entity-encoded /r?a=1&amp;b=i query link, and
a DECOY href inside <script> that must never reach the graph.

  python3 scripts/gen_crawl_pipeline_fixture.py

Outputs: src/test/resources/graft/sources/crawl_pipeline/robots/<host>.txt
         src/test/resources/graft/sources/crawl_pipeline/sitemaps/<host>--<name>
         src/test/resources/graft/sources/crawl_pipeline/arcs/arc_NNN.warc
         src/test/resources/graft/sources/crawl_pipeline_urls_twin.parquet
         src/test/resources/graft/sources/crawl_pipeline_edges_twin.parquet
"""
import os
from urllib.parse import urlsplit, urljoin

import pyarrow as pa
import pyarrow.parquet as pq

from gen_robots_fixture import parse as rb_parse, is_allowed
from gen_html_links_fixture import resolve as rfc_resolve
from gen_warc_fixture import record, http_response

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
PIPE = os.path.join(OUT, "crawl_pipeline")

AGENT = "graftbot"
NS = "http://www.sitemaps.org/schemas/sitemap/0.9"

ROBOTS = {
    "h0.example": ("Sitemap: http://h0.example/sm0.xml\n"
                   "User-agent: graftbot\nDisallow: /blocked/\n"),
    "h1.example": ("Sitemap: http://h1.example/sm1.xml\n"
                   "User-agent: *\nDisallow: /private/\n"
                   "Allow: /private/ok\n"),
    "h2.example": "Sitemap: http://h2.example/sm2.xml\n",
    "h3.example": ("Sitemap: http://h3.example/sm3.xml\n"
                   "User-agent: *\nDisallow: /\n"),
}


def urlset(locs):
    body = "".join(f"  <url><loc>{u}</loc></url>\n" for u in locs)
    return (f'<?xml version="1.0" encoding="UTF-8"?>\n'
            f'<urlset xmlns="{NS}">\n{body}</urlset>\n')


def smindex(locs):
    body = "".join(f"  <sitemap><loc>{u}</loc></sitemap>\n" for u in locs)
    return (f'<?xml version="1.0" encoding="UTF-8"?>\n'
            f'<sitemapindex xmlns="{NS}">\n{body}</sitemapindex>\n')


H0_PAGES = [f"http://h0.example/p/{i}" for i in range(6)] + \
    ["http://h0.example/blocked/x", "http://h0.example/blocked/y"]
H1_PAGES = ["http://h1.example/private/secret",
            "http://h1.example/private/ok/page",
            "http://h1.example/a", "http://h1.example/b"]
H2_PAGES = ["http://h2.example/only", "http://h2.example/two"]
H3_PAGES = ["http://h3.example/x", "http://h3.example/y"]

SITEMAPS = {  # filename (host--name) -> body
    "h0.example--sm0.xml": smindex(["http://h0.example/sm0a.xml",
                                    "http://h0.example/sm0b.xml"]),
    "h0.example--sm0a.xml": urlset(H0_PAGES[:4]),
    "h0.example--sm0b.xml": urlset(H0_PAGES[4:]),
    "h1.example--sm1.xml": urlset(H1_PAGES),
    "h2.example--sm2.xml": urlset(H2_PAGES),
    "h3.example--sm3.xml": urlset(H3_PAGES),
}

# (loc, depth) discovered by the frontier: index children's pages are
# depth 1; direct-urlset seeds are depth 0
DISCOVERED = [(u, 1) for u in H0_PAGES] + \
    [(u, 0) for u in H1_PAGES + H2_PAGES + H3_PAGES]

FETCH_FAIL = {"http://h0.example/p/5", "http://h1.example/b"}

NEXT_HOST = {"h0.example": "h1.example", "h1.example": "h2.example",
             "h2.example": "h0.example"}


def page_html(i, host):
    extra = (f'<a href="/r?a=1&amp;b={i}">q</a>' if i % 3 == 0 else "")
    return (f"<html><body><p>page {i}</p>"
            f'<a href="l{i}">self</a>'
            f'<a href="http://ext{i % 2}.example/t">ext</a>'
            f'<a href="http://{NEXT_HOST[host]}/z">next</a>'
            f"{extra}"
            "<script>var a='<a href=\"http://decoy.example/x\">';"
            "</script></body></html>")


def main():
    for d in ("robots", "sitemaps", "arcs"):
        os.makedirs(os.path.join(PIPE, d), exist_ok=True)
    for host, txt in ROBOTS.items():
        with open(os.path.join(PIPE, "robots", host + ".txt"), "w") as f:
            f.write(txt)
    for name, body in SITEMAPS.items():
        with open(os.path.join(PIPE, "sitemaps", name), "w") as f:
            f.write(body)

    groups = {h: rb_parse(t) for h, t in ROBOTS.items()}
    url_rows = []      # (loc, host, depth, allowed, fetched)
    fetched_urls = []  # in admission order
    for loc, depth in DISCOVERED:
        u = urlsplit(loc)
        path = u.path or "/"
        allowed = is_allowed(groups[u.hostname], AGENT, path)
        fetched = allowed and loc not in FETCH_FAIL
        url_rows.append((loc, u.hostname, depth, allowed, fetched))
        if fetched:
            fetched_urls.append(loc)

    # planted admission truths
    byl = {r[0]: r[3] for r in url_rows}
    assert byl["http://h0.example/p/0"] and \
        not byl["http://h0.example/blocked/x"]
    assert not byl["http://h1.example/private/secret"]
    assert byl["http://h1.example/private/ok/page"], "longest-match"
    assert byl["http://h2.example/only"]
    assert not byl["http://h3.example/x"], "deny-all host"
    assert sum(1 for r in url_rows if r[4]) == 9

    # WARC archives: arc_000 = h0 pages, arc_001 = h1 + h2 pages
    links = []  # (src_url, href, resolved)
    arcs = {0: [], 1: []}
    for i, loc in enumerate(fetched_urls):
        host = urlsplit(loc).hostname
        html = page_html(i, host)
        arcs[0 if host == "h0.example" else 1].append((loc, html))
        hrefs = [f"l{i}", f"http://ext{i % 2}.example/t",
                 f"http://{NEXT_HOST[host]}/z"]
        if i % 3 == 0:
            hrefs.append(f"/r?a=1&b={i}")  # &amp; entity-decoded
        for h in hrefs:
            r = rfc_resolve(loc, h)
            assert r == urljoin(loc, h), (loc, h)  # triangulation
            links.append((loc, h, r))

    for arc_id, pages in arcs.items():
        blob = b""
        blob += record("warcinfo", {"WARC-Record-ID": f"<urn:a{arc_id}>"},
                       b"software: graft-fixture\r\n")
        for loc, html in pages:
            payload = http_response(200, "text/html; charset=utf-8",
                                    html.encode("utf-8"))
            blob += record("response",
                           {"WARC-Target-URI": loc,
                            "WARC-Record-ID": f"<urn:r{loc}>"}, payload)
        with open(os.path.join(PIPE, "arcs", f"arc_{arc_id:03d}.warc"),
                  "wb") as f:
            f.write(blob)

    # host edges from the RESOLVED links (decoy never entered `links`)
    edges = {}
    for src_url, _, resolved in links:
        sh = urlsplit(src_url).hostname
        dh = urlsplit(resolved).hostname
        assert dh != "decoy.example"
        edges[(sh, dh)] = edges.get((sh, dh), 0) + 1

    pq.write_table(pa.table({
        "loc": pa.array([r[0] for r in url_rows], pa.string()),
        "host": pa.array([r[1] for r in url_rows], pa.string()),
        "depth": pa.array([r[2] for r in url_rows], pa.int32()),
        "allowed": pa.array([r[3] for r in url_rows], pa.bool_()),
        "fetched": pa.array([r[4] for r in url_rows], pa.bool_()),
    }), os.path.join(OUT, "crawl_pipeline_urls_twin.parquet"))

    ek = sorted(edges)
    pq.write_table(pa.table({
        "src_host": pa.array([k[0] for k in ek], pa.string()),
        "dst_host": pa.array([k[1] for k in ek], pa.string()),
        "n_links": pa.array([edges[k] for k in ek], pa.int64()),
    }), os.path.join(OUT, "crawl_pipeline_edges_twin.parquet"))
    print(f"wrote {len(url_rows)} urls, {len(ek)} host edges, "
          f"{len(fetched_urls)} fetched pages in 2 arcs")


if __name__ == "__main__":
    main()
