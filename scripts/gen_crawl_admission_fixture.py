#!/usr/bin/env python3
"""Generate the robots body + twin for the q386 crawl-admission gate —
the literal composition of the crawl loop's two halves: the q379
sitemap frontier (what exists) filtered by the q371 RFC 9309 evaluator
(what may be fetched).

Reuses the q379 tree walk (imported from gen_sitemap_tree_fixture) and
the q371 independent python RFC implementation (imported from
gen_robots_fixture); the robots body for t.example disallows /deep/
for graftbot but allows /deep/x back (longest-match), and disallows
/pages/ for everyone else — so the admitted set exercises own-group
vs * precedence ON frontier output, not hand-typed probes.

  python3 scripts/gen_crawl_admission_fixture.py

Outputs: src/test/resources/graft/sources/crawl_robots/t.example.txt
         src/test/resources/graft/sources/crawl_admission_twin.parquet
"""
import os
from urllib.parse import urlsplit

from gen_robots_fixture import parse, is_allowed
from gen_sitemap_tree_fixture import FILES, GZ_BODY, BASE, walk
import gzip

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
RB_DIR = os.path.join(OUT, "crawl_robots")

ROBOTS_TXT = (
    "User-agent: graftbot\n"
    "Disallow: /deep/\n"
    "Allow: /deep/x\n"
    "User-agent: *\n"
    "Disallow: /pages/\n")

AGENT = "graftbot"


def main():
    blobs = {BASE + n: b.encode("utf-8") for n, b in FILES.items()}
    blobs[BASE + "grandchild.xml.gz"] = gzip.compress(
        GZ_BODY.encode("utf-8"))
    frontier = walk(blobs)  # (sm_url, depth, idx, loc, lastmod, cf, pr)
    groups = parse(ROBOTS_TXT)
    rows = []
    for sm_url, depth, idx, loc, _, _, _ in frontier:
        u = urlsplit(loc)
        path = u.path or "/"
        allowed = is_allowed(groups, AGENT, path) \
            if u.hostname == "t.example" else True
        rows.append((loc, depth, allowed))
    byl = {r[0]: r[2] for r in rows}
    # planted truths: graftbot's own group governs /deep/ (x allowed
    # back by longest-match, y denied); /pages/ only binds OTHER agents
    assert byl[BASE + "deep/x"] is True
    assert byl[BASE + "deep/y"] is False
    assert byl[BASE + "pages/a"] is True
    assert byl[BASE + "pages/b"] is True
    assert byl[BASE + "leafpage"] is True
    assert len(rows) == 5

    os.makedirs(RB_DIR, exist_ok=True)
    with open(os.path.join(RB_DIR, "t.example.txt"), "w") as f:
        f.write(ROBOTS_TXT)
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "loc": pa.array([r[0] for r in rows], pa.string()),
        "depth": pa.array([r[1] for r in rows], pa.int32()),
        "allowed": pa.array([r[2] for r in rows], pa.bool_()),
    }), os.path.join(OUT, "crawl_admission_twin.parquet"))
    print(f"wrote robots + twin ({len(rows)} pages, "
          f"{sum(1 for r in rows if r[2])} admitted)")


if __name__ == "__main__":
    main()
