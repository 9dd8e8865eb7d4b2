#!/usr/bin/env python3
"""Generate committed sitemap fixtures + twin for the q377 gate
(graft.ops.Sitemap — the sitemaps.org 0.9 protocol).

Fixtures are hand-written XML (namespaced and bare, full and minimal
fields, a sitemapindex, a gzipped sitemap, CDATA-free entities, and a
hostile DOCTYPE file that must yield zero rows); the twin re-parses
them with CPython's xml.etree — an XML parser independent of the JDK
SAX stack under test — applying the same documented field rules
(loc required, lastmod/changefreq verbatim, priority to double or
null).

  python3 scripts/gen_sitemap_fixture.py

Outputs: src/test/resources/graft/sources/sitemaps/map_NNN.xml[.gz]
         src/test/resources/graft/sources/sitemap_twin.parquet
"""
import gzip
import os
import xml.etree.ElementTree as ET

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
SM_DIR = os.path.join(OUT, "sitemaps")

NS = "http://www.sitemaps.org/schemas/sitemap/0.9"

FIXTURES = {
    # namespaced urlset, all fields
    "map_000.xml": f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="{NS}">
  <url>
    <loc>https://a.example/</loc>
    <lastmod>2026-01-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url>
    <loc>https://a.example/about?x=1&amp;y=2</loc>
    <priority>0.50</priority>
  </url>
  <url>
    <loc>https://a.example/minimal</loc>
  </url>
</urlset>
""",
    # bare (un-namespaced) urlset; malformed priority -> null
    "map_001.xml": """<urlset>
  <url><loc>https://b.example/p1</loc><changefreq>weekly</changefreq>
    <priority>high</priority></url>
  <url><lastmod>2026-02-02</lastmod></url>
  <url><loc>  https://b.example/p2  </loc></url>
</urlset>
""",
    # sitemapindex
    "map_002.xml": f"""<sitemapindex xmlns="{NS}">
  <sitemap><loc>https://c.example/s1.xml.gz</loc>
    <lastmod>2026-03-01T10:00:00Z</lastmod></sitemap>
  <sitemap><loc>https://c.example/s2.xml.gz</loc></sitemap>
</sitemapindex>
""",
    # hostile: DOCTYPE must be rejected (zero rows, no XXE)
    "map_004.xml": """<?xml version="1.0"?>
<!DOCTYPE urlset [<!ENTITY x SYSTEM "file:///etc/passwd">]>
<urlset><url><loc>&x;</loc></url></urlset>
""",
    # not XML at all
    "map_005.xml": "this is not xml {",
}

# map_003.xml.gz: the gz delivery form of a small urlset
GZ_BODY = """<urlset>
  <url><loc>https://gz.example/only</loc><priority>1.0</priority></url>
</urlset>
"""


def twin_rows():
    """Independent parse with xml.etree over the same field rules."""
    rows = []
    contents = dict(FIXTURES)
    contents["map_003.xml.gz"] = GZ_BODY
    for name in sorted(contents):
        sid = int(name.split("_")[1].split(".")[0])
        body = contents[name]
        try:
            root = ET.fromstring(body)
        except ET.ParseError:
            continue
        tag = root.tag.split("}")[-1]
        if tag not in ("urlset", "sitemapindex"):
            continue
        # xml.etree EXPANDS internal entities; the gate expects the
        # hostile DOCTYPE file to yield ZERO rows (SAX rejects the
        # doctype) — drop it here explicitly, asserting it is the
        # planted one
        if "<!DOCTYPE" in body:
            assert sid == 4
            continue
        idx = 0
        child = "url" if tag == "urlset" else "sitemap"
        for el in root:
            if el.tag.split("}")[-1] != child:
                continue
            f = {c.tag.split("}")[-1]: (c.text or "").strip()
                 for c in el}
            if "loc" not in f or not f["loc"]:
                continue
            pr = None
            if "priority" in f:
                try:
                    pr = float(f["priority"])
                except ValueError:
                    pr = None
            rows.append((sid, tag, idx, f["loc"],
                         f.get("lastmod", ""), f.get("changefreq", ""),
                         pr))
            idx += 1
    return rows


def main():
    os.makedirs(SM_DIR, exist_ok=True)
    for old in os.listdir(SM_DIR):
        os.remove(os.path.join(SM_DIR, old))
    for name, body in FIXTURES.items():
        with open(os.path.join(SM_DIR, name), "w", encoding="utf-8") as f:
            f.write(body)
    with open(os.path.join(SM_DIR, "map_003.xml.gz"), "wb") as f:
        f.write(gzip.compress(GZ_BODY.encode("utf-8")))
    rows = twin_rows()
    # planted truths
    assert len([r for r in rows if r[0] == 0]) == 3
    assert [r for r in rows if r[0] == 1][0][6] is None  # bad priority
    assert len([r for r in rows if r[0] == 1]) == 2      # loc-less drop
    assert [r for r in rows if r[0] == 2][0][1] == "sitemapindex"
    assert all(r[0] != 4 for r in rows)                  # DOCTYPE: zero
    assert all(r[0] != 5 for r in rows)                  # garbage: zero
    assert [r for r in rows if r[0] == 3][0][3] == "https://gz.example/only"
    assert [r for r in rows if r[0] == 1][1][3] == "https://b.example/p2"

    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "map_id": pa.array([r[0] for r in rows], pa.int64()),
        "kind": pa.array([r[1] for r in rows], pa.string()),
        "entry_idx": pa.array([r[2] for r in rows], pa.int32()),
        "loc": pa.array([r[3] for r in rows], pa.string()),
        "lastmod": pa.array([r[4] for r in rows], pa.string()),
        "changefreq": pa.array([r[5] for r in rows], pa.string()),
        "priority": pa.array([r[6] for r in rows], pa.float64()),
    }), os.path.join(OUT, "sitemap_twin.parquet"))
    print(f"wrote {len(FIXTURES) + 1} sitemaps + twin ({len(rows)} rows)")


if __name__ == "__main__":
    main()
