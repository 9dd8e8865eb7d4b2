#!/usr/bin/env python3
"""Generate committed WARC fixtures + twin for the q363 streaming
curation front door (graft.ops.Warc.curatedPages: WARC -> byte-sniffed
charset -> charset-aware decode -> HTML extract, in one micro-batch).

Two archives (one plain, one per-record-gzipped) hold pages in FOUR
charsets — ascii, multibyte utf-8, utf-8 with BOM, and latin-1 (the
crawl tail a utf-8-blind decode mangles: 0xE9 is invalid UTF-8) — plus
a 404 and a non-HTML 200 that must be filtered. Expected rows compose
THREE independent python twins: the charset verdict from
gen_encoding_fixture.expected (CPython strict decode), the text from
gen_html_fixture.extract, and decode-per-charset mirroring the
documented rule. Quality columns are NOT in the twin — the oracle
computes them in DuckDB SQL from the twin text with the exact
q29-certified expressions.

  python3 scripts/gen_warc_curated_fixture.py

Outputs: src/test/resources/graft/sources/warc_curated/arc_NNN.warc[.gz]
         src/test/resources/graft/sources/warc_curated_twin.parquet
"""
import gzip
import importlib.util
import os

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
CUR_DIR = os.path.join(OUT, "warc_curated")


def load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(os.path.dirname(__file__), name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


html_extract = load("gen_html_fixture").extract
charset_of = load("gen_encoding_fixture").expected


def decode(body, cs):
    if cs == "utf-8-bom":
        return body[3:].decode("utf-8")
    if cs == "latin-1":
        return body.decode("latin-1")
    if cs in ("utf-16le", "utf-16be"):
        return body.decode("utf-16")
    return body.decode("utf-8")         # ascii, utf-8


def record(rec_type, url, payload, idx):
    h = ["WARC/1.0", f"WARC-Type: {rec_type}"]
    if url:
        h.append(f"WARC-Target-URI: {url}")
    h.append(f"WARC-Record-ID: <urn:uuid:{idx:08d}>")
    h.append(f"Content-Length: {len(payload)}")
    head = ("\r\n".join(h) + "\r\n\r\n").encode("latin-1")
    return head + payload + b"\r\n\r\n"


def http_response(status, ctype, body):
    reason = {200: "OK", 404: "Not Found"}[status]
    head = (f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode("latin-1")
    return head + body


# (url, html_bytes) per archive; charset planted via the BYTES
ARC_PAGES = [
    [  # arc_000.warc
        ("http://cur.test/ascii",
         b"<p>plain ascii page with <a href='x'>a link</a></p>"),
        ("http://cur.test/utf8",
         "<div>café page ☕ multibyte</div><p>tail</p>"
         .encode("utf-8")),
    ],
    [  # arc_001.warc.gz
        ("http://cur.test/bom",
         b"\xef\xbb\xbf" + "<p>BOM page café</p>".encode("utf-8")),
        ("http://cur.test/latin1",
         "<ul><li>café latin</li><li>naïve</li></ul>"
         .encode("latin-1")),
    ],
]


def build_archive(pages, start_idx):
    recs = []
    idx = start_idx
    for url, html in pages:
        recs.append(record("response", url, http_response(
            200, "text/html; charset=ignored", html), idx))
        idx += 1
    # filtered: a 404 and a non-html 200
    recs.append(record("response", "http://cur.test/gone",
                       http_response(404, "text/html", b"<p>gone</p>"),
                       idx))
    recs.append(record("response", "http://cur.test/j",
                       http_response(200, "application/json", b"{}"),
                       idx + 1))
    return recs


def main():
    os.makedirs(CUR_DIR, exist_ok=True)
    for old in os.listdir(CUR_DIR):
        os.remove(os.path.join(CUR_DIR, old))
    rows = []
    for arc_id, pages in enumerate(ARC_PAGES):
        recs = build_archive(pages, 0)
        if arc_id == 0:
            with open(os.path.join(CUR_DIR, "arc_000.warc"), "wb") as f:
                f.write(b"".join(recs))
        else:
            with open(os.path.join(CUR_DIR, "arc_001.warc.gz"),
                      "wb") as f:
                for m in recs:
                    f.write(gzip.compress(m))
        for i, (url, html) in enumerate(pages):
            cs = charset_of(html)
            text, links = html_extract(decode(html, cs))
            rows.append((arc_id, i, url, cs, text, links))
    # planted truths: all four charsets present, latin-1 text correct
    assert sorted(r[3] for r in rows) == \
        ["ascii", "latin-1", "utf-8", "utf-8-bom"], rows
    by_url = {r[2]: r[4] for r in rows}
    assert by_url["http://cur.test/latin1"] == "café latin\nnaïve"
    assert by_url["http://cur.test/bom"] == "BOM page café"
    assert "gone" not in str(rows)

    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "arc_id": pa.array([r[0] for r in rows], pa.int64()),
        "rec_idx": pa.array([r[1] for r in rows], pa.int32()),
        "url": pa.array([r[2] for r in rows], pa.string()),
        "charset": pa.array([r[3] for r in rows], pa.string()),
        "text": pa.array([r[4] for r in rows], pa.string()),
        "n_links": pa.array([r[5] for r in rows], pa.int32()),
    }), os.path.join(OUT, "warc_curated_twin.parquet"))
    print(f"wrote 2 curated archives + twin ({len(rows)} pages)")


if __name__ == "__main__":
    main()
