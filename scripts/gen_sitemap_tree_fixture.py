#!/usr/bin/env python3
"""Generate the two-level sitemap TREE fixture + twin for the q379
frontier gate (graft.ops.Sitemap.frontier — sitemapindex -> child
sitemap -> urlset composition per sitemaps.org 0.9).

Planted: a root index naming two children, ITSELF (cycle), a loc-less
sitemap entry (dropped), and a never-fetched child (dangling — the
inner blob join drops it); a second-level index re-referencing an
already-visited child (diamond) and a gzipped grandchild; a seed that
is directly a urlset (depth-0 pages). The twin WALKS the same tree
with CPython's xml.etree (independent XML stack) under the same
documented rules: loc required + trimmed, visited-set cycle guard,
depth = levels below the seed.

  python3 scripts/gen_sitemap_tree_fixture.py

Outputs: src/test/resources/graft/sources/sitemap_tree/<name>
         src/test/resources/graft/sources/sitemap_tree_twin.parquet
"""
import gzip
import os
import xml.etree.ElementTree as ET

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
TREE_DIR = os.path.join(OUT, "sitemap_tree")

NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
BASE = "https://t.example/"

FILES = {
    # root: namespaced index — 2 real children, a self-cycle, a
    # loc-less entry, a dangling (never fetched) child
    "root.xml": f"""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="{NS}">
  <sitemap><loc>{BASE}child1.xml</loc>
    <lastmod>2026-04-01</lastmod></sitemap>
  <sitemap><loc>{BASE}child2.xml</loc></sitemap>
  <sitemap><loc>{BASE}root.xml</loc></sitemap>
  <sitemap><lastmod>2026-04-02</lastmod></sitemap>
  <sitemap><loc>{BASE}missing.xml</loc></sitemap>
</sitemapindex>
""",
    # child1: bare urlset — 2 pages + a loc-less url (dropped)
    "child1.xml": f"""<urlset>
  <url><loc>{BASE}pages/a</loc><changefreq>daily</changefreq>
    <priority>0.9</priority></url>
  <url><lastmod>2026-04-03</lastmod></url>
  <url><loc>  {BASE}pages/b  </loc></url>
</urlset>
""",
    # child2: second-level index — the gz grandchild plus a DIAMOND
    # re-reference to child1 (already visited at this point)
    "child2.xml": f"""<sitemapindex>
  <sitemap><loc>{BASE}grandchild.xml.gz</loc></sitemap>
  <sitemap><loc>{BASE}child1.xml</loc></sitemap>
</sitemapindex>
""",
    # leaf: a seed that is directly a urlset (depth-0 pages)
    "leaf.xml": f"""<urlset xmlns="{NS}">
  <url><loc>{BASE}leafpage</loc><priority>0.25</priority></url>
</urlset>
""",
}

# grandchild.xml.gz: gz-delivered urlset at depth 2
GZ_BODY = f"""<urlset>
  <url><loc>{BASE}deep/x</loc><lastmod>2026-05-05</lastmod></url>
  <url><loc>{BASE}deep/y</loc></url>
</urlset>
"""

SEEDS = [BASE + "root.xml", BASE + "leaf.xml"]
MAX_DEPTH = 5


def parse_blob(body_bytes):
    """(kind, kept entries) under the documented field rules."""
    if body_bytes[:2] == b"\x1f\x8b":
        body_bytes = gzip.decompress(body_bytes)
    try:
        root = ET.fromstring(body_bytes.decode("utf-8"))
    except (ET.ParseError, UnicodeDecodeError):
        return "", []
    tag = root.tag.split("}")[-1]
    if tag not in ("urlset", "sitemapindex"):
        return "", []
    child = "url" if tag == "urlset" else "sitemap"
    out = []
    for el in root:
        if el.tag.split("}")[-1] != child:
            continue
        f = {c.tag.split("}")[-1]: (c.text or "").strip() for c in el}
        if not f.get("loc"):
            continue
        pr = None
        if "priority" in f:
            try:
                pr = float(f["priority"])
            except ValueError:
                pr = None
        out.append((f["loc"], f.get("lastmod", ""),
                    f.get("changefreq", ""), pr))
    return tag, out


def walk(blobs):
    """Independent frontier walk: visited-set guard, bounded depth."""
    rows = []
    cur = sorted(set(SEEDS))
    visited = set(cur)
    depth = 0
    while cur and depth <= MAX_DEPTH:
        nxt = set()
        for sm_url in cur:
            if sm_url not in blobs:
                continue  # dangling ref: the blob join drops it
            kind, entries = parse_blob(blobs[sm_url])
            if kind == "urlset":
                for i, (loc, lm, cf, pr) in enumerate(entries):
                    rows.append((sm_url, depth, i, loc, lm, cf, pr))
            elif kind == "sitemapindex":
                for loc, _, _, _ in entries:
                    loc = loc.strip()
                    if loc and loc not in visited:
                        nxt.add(loc)
                        visited.add(loc)
        cur = sorted(nxt)
        depth += 1
    return rows


def main():
    os.makedirs(TREE_DIR, exist_ok=True)
    for old in os.listdir(TREE_DIR):
        os.remove(os.path.join(TREE_DIR, old))
    blobs = {}
    for name, body in FILES.items():
        with open(os.path.join(TREE_DIR, name), "w",
                  encoding="utf-8") as f:
            f.write(body)
        blobs[BASE + name] = body.encode("utf-8")
    gz = gzip.compress(GZ_BODY.encode("utf-8"))
    with open(os.path.join(TREE_DIR, "grandchild.xml.gz"), "wb") as f:
        f.write(gz)
    blobs[BASE + "grandchild.xml.gz"] = gz

    rows = walk(blobs)
    # planted truths
    by_depth = {}
    for r in rows:
        by_depth.setdefault(r[1], []).append(r)
    assert len(by_depth[0]) == 1                       # leaf seed only
    assert by_depth[0][0][3] == BASE + "leafpage"
    assert len(by_depth[1]) == 2                       # child1, loc-less dropped
    assert {r[3] for r in by_depth[1]} == {BASE + "pages/a",
                                           BASE + "pages/b"}
    assert len(by_depth[2]) == 2                       # gz grandchild
    assert {r[3] for r in by_depth[2]} == {BASE + "deep/x",
                                           BASE + "deep/y"}
    assert max(by_depth) == 2                          # cycle+diamond cut
    assert all(BASE + "missing.xml" != r[0] for r in rows)
    assert len(rows) == 5

    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "sm_url": pa.array([r[0] for r in rows], pa.string()),
        "depth": pa.array([r[1] for r in rows], pa.int32()),
        "entry_idx": pa.array([r[2] for r in rows], pa.int32()),
        "loc": pa.array([r[3] for r in rows], pa.string()),
        "lastmod": pa.array([r[4] for r in rows], pa.string()),
        "changefreq": pa.array([r[5] for r in rows], pa.string()),
        "priority": pa.array([r[6] for r in rows], pa.float64()),
    }), os.path.join(OUT, "sitemap_tree_twin.parquet"))
    print(f"wrote {len(FILES) + 1} tree files + twin ({len(rows)} rows)")


if __name__ == "__main__":
    main()
