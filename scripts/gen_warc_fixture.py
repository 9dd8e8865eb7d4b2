#!/usr/bin/env python3
"""Generate committed WARC fixtures + twins for the q355/q356 gates
(graft.ops.Warc).

Writes spec-correct WARC 1.0 files with stdlib only (no shared code
with the Scala parser): a plain .warc with warcinfo/request/response
records, and a .warc.gz whose records are gzipped as SEPARATE
CONCATENATED members (the Common Crawl layout — exercises the JDK
multi-member inflate). Response bodies are HTML; q356's expected text
comes from gen_html_fixture.extract — the SAME independent python
implementation of the HtmlExtract spec that gates q351 — composed
here over the HTTP payloads, so the end-to-end WARC -> HTTP -> HTML ->
text chain is certified against twins that never touched the Scala
code.

  python3 scripts/gen_warc_fixture.py

Outputs: src/test/resources/graft/sources/warc/arc_NNN.warc[.gz]
         src/test/resources/graft/sources/warc_records_twin.parquet
         src/test/resources/graft/sources/warc_pages_twin.parquet
"""
import gzip
import importlib.util
import os

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
WARC_DIR = os.path.join(OUT, "warc")

spec = importlib.util.spec_from_file_location(
    "gen_html_fixture",
    os.path.join(os.path.dirname(__file__), "gen_html_fixture.py"))
ghf = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ghf)
html_extract = ghf.extract


def record(rec_type, headers, payload):
    h = [f"WARC/1.0"]
    h.append(f"WARC-Type: {rec_type}")
    for k, v in headers.items():
        h.append(f"{k}: {v}")
    h.append(f"Content-Length: {len(payload)}")
    head = ("\r\n".join(h) + "\r\n\r\n").encode("latin-1")
    return head + payload + b"\r\n\r\n"


def http_response(status, ctype, body):
    reason = {200: "OK", 404: "Not Found", 301: "Moved"}[status]
    head = (f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode("latin-1")
    return head + body


PAGES = {
    "http://example.com/a": ("<html><body><h1>Front page</h1><p>welcome "
                             "to the <a href='/b'>site</a></p>"
                             "<script>x<1</script></body></html>"),
    "http://example.com/b": ("<div>second&nbsp;page</div><ul><li>one</li>"
                             "<li>two</li></ul>"),
    "http://example.com/c": ("<p>third page with &amp; entity and "
                             "<a href='x'>two</a> <a href='y'>links</a>"
                             "</p>"),
}


def build_records():
    recs = []  # (rec_type, url, status, ctype, payload)
    recs.append(("warcinfo", "", 0, "",
                 b"software: graft-fixture-writer/1.0\r\n"))
    for url, html in PAGES.items():
        recs.append(("request", url, 0, "",
                     f"GET {url} HTTP/1.1\r\nHost: x\r\n\r\n"
                     .encode("latin-1")))
        recs.append(("response", url, 200, "text/html",
                     http_response(200, "text/html; charset=utf-8",
                                   html.encode("utf-8"))))
    # a 404 and a non-html 200: must be enumerated but NOT extracted
    recs.append(("response", "http://example.com/missing", 404,
                 "text/html",
                 http_response(404, "text/html", b"<p>gone</p>")))
    recs.append(("response", "http://example.com/data.json", 200,
                 "application/json",
                 http_response(200, "application/json",
                               b'{"k": "v"}')))
    return recs


def main():
    os.makedirs(WARC_DIR, exist_ok=True)
    for old in os.listdir(WARC_DIR):
        os.remove(os.path.join(WARC_DIR, old))
    recs = build_records()
    raw_members = []
    for (rt, url, status, ctype, payload) in recs:
        hdrs = {}
        if url:
            hdrs["WARC-Target-URI"] = url
        hdrs["WARC-Record-ID"] = f"<urn:uuid:{len(raw_members):08d}>"
        raw_members.append(record(rt, hdrs, payload))
    # arc_000.warc: plain concatenation
    with open(os.path.join(WARC_DIR, "arc_000.warc"), "wb") as f:
        f.write(b"".join(raw_members))
    # arc_001.warc.gz: SAME records, each gzipped as its own member
    with open(os.path.join(WARC_DIR, "arc_001.warc.gz"), "wb") as f:
        for m in raw_members:
            f.write(gzip.compress(m))

    # twins: both archives hold identical records
    rec_rows = []
    page_rows = []
    for arc_id in (0, 1):
        for i, (rt, url, status, ctype, payload) in enumerate(recs):
            body_len = len(payload)
            st, ct = 0, ""
            if rt == "response":
                st, ct = status, ctype
                # http body length = payload minus the http head
                head, _, body = payload.partition(b"\r\n\r\n")
                body_len = len(body)
            rec_rows.append((arc_id, i, rt, url, st, ct, body_len))
            if rt == "response" and st == 200 and ct == "text/html":
                _, _, body = payload.partition(b"\r\n\r\n")
                text, links = html_extract(body.decode("utf-8"))
                page_rows.append((arc_id, i, url, text, links))
    # planted truths
    texts = {r[2]: r[3] for r in page_rows if r[0] == 0}
    assert texts["http://example.com/a"] == "Front page\nwelcome to the site"
    assert texts["http://example.com/b"] == "second page\none\ntwo"
    assert "gone" not in str(texts)          # 404 not extracted
    assert len(page_rows) == 6               # 3 pages x 2 archives

    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "arc_id": pa.array([r[0] for r in rec_rows], pa.int64()),
        "rec_idx": pa.array([r[1] for r in rec_rows], pa.int32()),
        "rec_type": pa.array([r[2] for r in rec_rows], pa.string()),
        "url": pa.array([r[3] for r in rec_rows], pa.string()),
        "http_status": pa.array([r[4] for r in rec_rows], pa.int32()),
        "content_type": pa.array([r[5] for r in rec_rows], pa.string()),
        "body_len": pa.array([r[6] for r in rec_rows], pa.int64()),
    }), os.path.join(OUT, "warc_records_twin.parquet"))
    pq.write_table(pa.table({
        "arc_id": pa.array([r[0] for r in page_rows], pa.int64()),
        "rec_idx": pa.array([r[1] for r in page_rows], pa.int32()),
        "url": pa.array([r[2] for r in page_rows], pa.string()),
        "text": pa.array([r[3] for r in page_rows], pa.string()),
        "n_links": pa.array([r[4] for r in page_rows], pa.int32()),
    }), os.path.join(OUT, "warc_pages_twin.parquet"))
    print(f"wrote 2 archives ({len(recs)} records each) + twins")


if __name__ == "__main__":
    main()
