#!/usr/bin/env python3
"""Generate committed WARC truncation fixtures + twin for the q361 gate
(graft.ops.Warc.ledger — the observable-truncation ledger).

Plants one archive per cap/corruption class, sized so the gate's SMALL
caps (maxInflate=4096, maxRecords=3) bite on a committable fixture while
production keeps the 64 MiB / 100k defaults:

  arc_000.warc     clean, 2 records             -> (2, false, "")
  arc_001.warc     5 records, record cap at 3   -> (3, true, "record_cap")
  arc_002.warc.gz  inflates past 4096 bytes     -> (n_fit, true, "inflate_cap")
  arc_003.warc     tail record's Content-Length
                   exceeds remaining bytes      -> (2, true, "torn_tail")
  arc_004.warc     NON-NUMERIC Content-Length
                   (the ADVICE r12 regression:
                   must keep the 2 records
                   already parsed, not throw)   -> (2, true, "torn_tail")
  arc_005.warc     pure garbage bytes           -> (0, true, "torn_tail")

Expected rows are computed from CONSTRUCTION ARITHMETIC only (member
byte offsets the generator itself laid down) — no WARC parser is
duplicated here, so a Scala parser bug cannot self-certify.

  python3 scripts/gen_warc_trunc_fixture.py

Outputs: src/test/resources/graft/sources/warc_trunc/arc_NNN.warc[.gz]
         src/test/resources/graft/sources/warc_trunc_twin.parquet
"""
import gzip
import os

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
TRUNC_DIR = os.path.join(OUT, "warc_trunc")

MAX_INFLATE = 4096
MAX_RECORDS = 3


def record(rec_type, url, payload, idx, content_length=None):
    h = ["WARC/1.0", f"WARC-Type: {rec_type}"]
    if url:
        h.append(f"WARC-Target-URI: {url}")
    h.append(f"WARC-Record-ID: <urn:uuid:{idx:08d}>")
    cl = len(payload) if content_length is None else content_length
    h.append(f"Content-Length: {cl}")
    head = ("\r\n".join(h) + "\r\n\r\n").encode("latin-1")
    return head, payload


def full(rec_type, url, payload, idx):
    head, p = record(rec_type, url, payload, idx)
    return head + p + b"\r\n\r\n"


def main():
    os.makedirs(TRUNC_DIR, exist_ok=True)
    for old in os.listdir(TRUNC_DIR):
        os.remove(os.path.join(TRUNC_DIR, old))
    rows = []  # (arc_id, n_records, truncated, reason)

    # arc_000: clean
    recs = [full("resource", f"http://t/{i}", b"x" * 50, i)
            for i in range(2)]
    with open(os.path.join(TRUNC_DIR, "arc_000.warc"), "wb") as f:
        f.write(b"".join(recs))
    rows.append((0, 2, False, ""))

    # arc_001: 5 records; the gate's maxRecords=3 stops with bytes left
    recs = [full("resource", f"http://t/{i}", b"y" * 40, i)
            for i in range(5)]
    with open(os.path.join(TRUNC_DIR, "arc_001.warc"), "wb") as f:
        f.write(b"".join(recs))
    rows.append((1, MAX_RECORDS, True, "record_cap"))

    # arc_002: gz whose inflated stream exceeds MAX_INFLATE; count the
    # members that fit ENTIRELY (head + payload) inside the first
    # MAX_INFLATE inflated bytes — construction arithmetic, no parsing
    members = []
    for i in range(3):
        head, p = record("resource", f"http://big/{i}", b"z" * 3000, i)
        members.append(head + p + b"\r\n\r\n")
    blob = b"".join(members)
    assert len(blob) > MAX_INFLATE
    n_fit = 0
    off = 0
    for i, m in enumerate(members):
        head, p = record("resource", f"http://big/{i}", b"z" * 3000, i)
        if off + len(head) + len(p) <= MAX_INFLATE:
            n_fit += 1
        off += len(m)
    assert n_fit == 1, n_fit  # record 1's body crosses the cap
    # keep a comfortable margin from the boundary paddings
    assert abs((len(members[0])) - MAX_INFLATE) > 8
    with open(os.path.join(TRUNC_DIR, "arc_002.warc.gz"), "wb") as f:
        f.write(gzip.compress(blob))
    rows.append((2, n_fit, True, "inflate_cap"))

    # arc_003: torn tail — declared length exceeds remaining bytes
    good = [full("resource", f"http://t/{i}", b"a" * 30, i)
            for i in range(2)]
    head, _ = record("resource", "http://t/torn", b"", 2,
                     content_length=9999)
    with open(os.path.join(TRUNC_DIR, "arc_003.warc"), "wb") as f:
        f.write(b"".join(good) + head + b"only-a-few-bytes")
    rows.append((3, 2, True, "torn_tail"))

    # arc_004: NON-NUMERIC Content-Length after 2 good records — the
    # ADVICE r12 case: the malformed length must terminate the scan
    # cleanly, KEEPING the 2 parsed records (not throw-and-drop-all)
    good = [full("resource", f"http://t/{i}", b"b" * 30, i)
            for i in range(2)]
    head, _ = record("resource", "http://t/bad", b"payload", 2,
                     content_length="banana")
    with open(os.path.join(TRUNC_DIR, "arc_004.warc"), "wb") as f:
        f.write(b"".join(good) + head + b"payload\r\n\r\n")
    rows.append((4, 2, True, "torn_tail"))

    # arc_005: not WARC at all
    with open(os.path.join(TRUNC_DIR, "arc_005.warc"), "wb") as f:
        f.write(b"NOTAWARC " * 20)
    rows.append((5, 0, True, "torn_tail"))

    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "arc_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_records": pa.array([r[1] for r in rows], pa.int32()),
        "truncated": pa.array([r[2] for r in rows], pa.bool_()),
        "reason": pa.array([r[3] for r in rows], pa.string()),
    }), os.path.join(OUT, "warc_trunc_twin.parquet"))
    print(f"wrote {len(rows)} truncation archives + twin")


if __name__ == "__main__":
    main()
