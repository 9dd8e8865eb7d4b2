#!/usr/bin/env python3
"""Generate committed raw-bytes fixtures + twin for the q352 charset
detection gate (graft.ops.EncodingDetect).

The twin's utf-8 verdicts come from CPython's OWN strict decoder
(`bytes.decode('utf-8')`) — a real-world reference validator that
shares nothing with the Scala RFC 3629 state machine — so the gate
certifies overlong / surrogate / out-of-range / truncation rejection
against an independent implementation, not a re-derivation. BOM rows
are constructed with stdlib codecs.

  python3 scripts/gen_encoding_fixture.py

Outputs: src/test/resources/graft/sources/encodings/enc_NNN.bin
         src/test/resources/graft/sources/encodings_twin.parquet
"""
import os

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
ENC_DIR = os.path.join(OUT, "encodings")

FIXTURES = {
    0: b"plain ascii text, nothing fancy 123",
    1: "héllo wörld — naïve café".encode("utf-8"),
    2: "日本語のテキストです".encode("utf-8"),
    3: "emoji \U0001F600 astral".encode("utf-8"),
    4: "bom'd utf-8 text".encode("utf-8-sig"),
    5: "utf-16 little".encode("utf-16-le") and b"\xff\xfe" +
       "utf-16 little".encode("utf-16-le"),
    6: b"\xfe\xff" + "utf-16 big".encode("utf-16-be"),
    7: b"\xff\xfe\x00\x00" + "u32le".encode("utf-32-le"),
    8: b"\x00\x00\xfe\xff" + "u32be".encode("utf-32-be"),
    9: "café au lait, señor, Müller".encode("latin-1"),
    10: b"overlong slash \xc0\xaf banned",          # C0 AF = overlong '/'
    11: b"surrogate \xed\xa0\x80 banned",           # ED A0 80 = U+D800
    12: b"too big \xf5\x80\x80\x80 banned",         # F5 lead
    13: "truncated tail ".encode("utf-8") + b"\xe6\x97",  # cut 3-byte seq
    14: b"overlong nul \xc0\x80 (CESU/modified) is invalid",
    15: b"f0 overlong \xf0\x8f\xbf\xbf banned",     # < U+10000 in 4 bytes
    16: b"e0 overlong \xe0\x9f\xbf banned",         # < U+0800 in 3 bytes
    17: b"\xf4\x8f\xbf\xbf max codepoint ok",       # U+10FFFF exactly
    18: b"\xf4\x90\x80\x80 past max banned",        # U+110000
    19: b"lone continuation \x80 banned",
}


def expected(b):
    if len(b) >= 4 and b[:4] == b"\xff\xfe\x00\x00":
        return "utf-32le"
    if len(b) >= 4 and b[:4] == b"\x00\x00\xfe\xff":
        return "utf-32be"
    if len(b) >= 3 and b[:3] == b"\xef\xbb\xbf":
        return "utf-8-bom"
    if len(b) >= 2 and b[:2] == b"\xff\xfe":
        return "utf-16le"
    if len(b) >= 2 and b[:2] == b"\xfe\xff":
        return "utf-16be"
    if all(x < 0x80 for x in b):
        return "ascii"
    try:
        b.decode("utf-8", "strict")   # CPython: the independent verdict
        return "utf-8"
    except UnicodeDecodeError:
        return "latin-1"


def main():
    os.makedirs(ENC_DIR, exist_ok=True)
    for old in os.listdir(ENC_DIR):
        os.remove(os.path.join(ENC_DIR, old))
    rows = []
    for eid, blob in sorted(FIXTURES.items()):
        with open(os.path.join(ENC_DIR, f"enc_{eid:03d}.bin"), "wb") as f:
            f.write(blob)
        enc = expected(blob)
        rows.append((eid, enc, len(blob),
                     sum(1 for x in blob if x >= 0x80)))
    byid = {r[0]: r[1] for r in rows}
    # planted truths: CPython must agree with the intended labels
    assert byid[0] == "ascii" and byid[1] == "utf-8" and byid[2] == "utf-8"
    assert byid[3] == "utf-8" and byid[4] == "utf-8-bom"
    assert byid[5] == "utf-16le" and byid[6] == "utf-16be"
    assert byid[7] == "utf-32le" and byid[8] == "utf-32be"
    assert byid[9] == "latin-1"
    for k in (10, 11, 12, 13, 14, 15, 16, 18, 19):
        assert byid[k] == "latin-1", (k, byid[k])
    assert byid[17] == "utf-8"

    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({
        "enc_id": pa.array([r[0] for r in rows], pa.int64()),
        "encoding": pa.array([r[1] for r in rows], pa.string()),
        "n_bytes": pa.array([r[2] for r in rows], pa.int64()),
        "n_non_ascii": pa.array([r[3] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(OUT, "encodings_twin.parquet"))
    print(f"wrote {len(rows)} encoding fixtures + twin")


if __name__ == "__main__":
    main()
