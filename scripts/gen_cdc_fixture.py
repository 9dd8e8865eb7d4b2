#!/usr/bin/env python3
"""Generate the content-defined-chunking fixture + twin for the q384
gate (graft.ops.ContentChunk — gear-hash CDC in the FastCDC family).

An INDEPENDENT python implementation of the same documented spec
(splitmix64 gear table, h = (h<<1) + GEAR[b] with 64-bit wraparound,
cut at >= minSize when (h & mask) == 0 or unconditionally at maxSize,
h resets per chunk, tail emitted, FNV-1a 64 chunk identity) chunks the
same committed texts. Planted: two documents sharing a long pasted
span that must produce IDENTICAL interior (hash, length) chunks at
different offsets (the whole point of content-defined boundaries vs
fixed-width blocks), a doc shorter than minSize (single tail chunk),
an empty doc and a NULL doc (zero chunks), an all-same-byte
degenerate run (no gear boundary fires; maxSize cap chunks it), and
multibyte UTF-8 (chunking is over BYTES).

  python3 scripts/gen_cdc_fixture.py

Outputs: src/test/resources/graft/sources/cdc_fixture.parquet
         src/test/resources/graft/sources/cdc_twin.parquet
"""
import os

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")

M64 = (1 << 64) - 1
MIN_SIZE, AVG_BITS, MAX_SIZE = 16, 5, 96
MASK = (1 << AVG_BITS) - 1


def splitmix64(seed):
    z = (seed + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return (z ^ (z >> 31)) & M64


GEAR = [splitmix64(i) for i in range(256)]


def fnv1a64(b):
    h = 0xcbf29ce484222325
    for x in b:
        h = ((h ^ x) * 0x100000001b3) & M64
    return h


def chunks(data):
    out = []
    start, h = 0, 0
    for i, b in enumerate(data):
        h = ((h << 1) + GEAR[b]) & M64
        ln = i - start + 1
        if (ln >= MIN_SIZE and (h & MASK) == 0) or ln >= MAX_SIZE:
            out.append((start, ln, fnv1a64(data[start:i + 1])))
            start, h = i + 1, 0
    if start < len(data):
        out.append((start, len(data) - start,
                    fnv1a64(data[start:])))
    return out


def signed64(u):
    return u - (1 << 64) if u >= (1 << 63) else u


# a long "pasted" span shared verbatim between docs 0 and 1 at
# DIFFERENT byte offsets — deterministic pseudo-prose
SHARED = " ".join(f"token{splitmix64(i) % 997}" for i in range(80))

DOCS = [
    (0, "intro paragraph before the paste. " + SHARED + " coda zero."),
    (1, "a different and much longer preamble sits here first; " +
        SHARED + " then another ending entirely."),
    (2, "short doc"),                      # < minSize: single tail chunk
    (3, ""),                               # empty: zero chunks
    (4, None),                             # null: zero chunks
    (5, "z" * 300),                        # degenerate: maxSize cap only
    (6, "日本語のテキストはバイト単位で切られる。" * 8),  # multibyte
    # repeats SHARED a third time — lands in the LAST micro-batch of
    # the q390 streaming drive, so cross-batch chunk suppression is
    # exercised against docs 0/1 from the first batch
    (7, "yet another distinct preamble paragraph " + SHARED +
        " and a distinct closing line."),
]


def main():
    rows = []
    for did, text in DOCS:
        data = (text or "").encode("utf-8")
        for idx, (off, ln, h) in enumerate(chunks(data)):
            rows.append((did, idx, off, ln, signed64(h)))
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r[0], []).append(r)
    # planted truths
    assert 3 not in by_doc and 4 not in by_doc
    assert len(by_doc[2]) == 1 and by_doc[2][0][3] == len(b"short doc")
    # degenerate run: every chunk is exactly maxSize except the tail
    z = by_doc[5]
    assert all(c[3] == MAX_SIZE for c in z[:-1]) and len(z) > 1
    # conservation: chunk lengths tile the byte length exactly
    for did, text in DOCS:
        blen = len((text or "").encode("utf-8"))
        got = sum(c[3] for c in by_doc.get(did, []))
        assert got == blen, (did, got, blen)
    # the shared span yields >= 2 identical interior (hash, length)
    # chunks across docs 0 and 1 despite different offsets
    h0 = {(c[4], c[3]) for c in by_doc[0][1:-1]}
    h1 = {(c[4], c[3]) for c in by_doc[1][1:-1]}
    h7 = {(c[4], c[3]) for c in by_doc[7][1:-1]}
    shared = h0 & h1
    assert len(shared) >= 2, (len(shared), len(h0), len(h1))
    assert len(h0 & h7) >= 2, len(h0 & h7)  # cross-batch repeat for q390

    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
        "text": pa.array([d[1] for d in DOCS], pa.string()),
    }), os.path.join(OUT, "cdc_fixture.parquet"))
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "chunk_idx": pa.array([r[1] for r in rows], pa.int32()),
        "offset": pa.array([r[2] for r in rows], pa.int64()),
        "length": pa.array([r[3] for r in rows], pa.int64()),
        "chunk_hash": pa.array([r[4] for r in rows], pa.int64()),
    }), os.path.join(OUT, "cdc_twin.parquet"))
    print(f"wrote {len(DOCS)} docs + twin ({len(rows)} chunks, "
          f"{len(shared)} shared)")


if __name__ == "__main__":
    main()
