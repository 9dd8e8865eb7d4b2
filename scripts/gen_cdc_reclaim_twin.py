#!/usr/bin/env python3
"""Twin for the q408 sub-document dedup RECLAIM gate
(graft.ops.ContentChunk.reclaim — the rewrite dupMass only measures):
replay the q384-certified python chunker over the committed CDC
fixture, elect each chunk content's globally-first occurrence
(minimal (doc_id, chunk_idx)), and rebuild every document as the byte
concatenation of its kept chunks in document order. The kept content
is certified through its md5 (byte-exact, charset-free — CDC
boundaries may split multibyte sequences, so a decoded-string compare
would drag in replacement-char semantics).

  python3 scripts/gen_cdc_reclaim_twin.py

Outputs: src/test/resources/graft/sources/cdc_reclaim_twin.parquet
"""
import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

from gen_cdc_fixture import chunks, signed64

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")


def main():
    docs = sorted(
        (r["doc_id"], r["text"]) for r in
        pq.read_table(os.path.join(OUT, "cdc_fixture.parquet"))
        .to_pylist())
    per_doc = {}
    first = {}  # (hash, length) -> (doc_id, idx)
    for doc_id, text in docs:
        data = (text or "").encode("utf-8")
        cs = chunks(data)
        per_doc[doc_id] = (data, cs)
        for idx, (off, ln, h) in enumerate(cs):
            key = (signed64(h), ln)
            if key not in first or (doc_id, idx) < first[key]:
                first[key] = (doc_id, idx)

    rows = []
    for doc_id, (data, cs) in per_doc.items():
        kept = b""
        n_kept = 0
        for idx, (off, ln, h) in enumerate(cs):
            if first[(signed64(h), ln)] == (doc_id, idx):
                kept += data[off:off + ln]
                n_kept += 1
        rows.append((doc_id, len(cs), n_kept,
                     sum(c[1] for c in cs), len(kept),
                     hashlib.md5(kept).hexdigest()))

    # planted truths: the fixture's pasted span drops from exactly one
    # of docs 0/1; doc 5's triple max-size repeat keeps one copy
    byd = {r[0]: r for r in rows}
    assert byd[0][2] == byd[0][1], "doc 0 keeps all its chunks"
    assert byd[1][2] < byd[1][1], "doc 1 drops the shared span chunks"
    assert any(r[2] < r[1] for r in rows)

    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_chunks": pa.array([r[1] for r in rows], pa.int32()),
        "n_kept": pa.array([r[2] for r in rows], pa.int32()),
        "total_bytes": pa.array([r[3] for r in rows], pa.int64()),
        "kept_bytes": pa.array([r[4] for r in rows], pa.int64()),
        "kept_md5": pa.array([r[5] for r in rows], pa.string()),
    }), os.path.join(OUT, "cdc_reclaim_twin.parquet"))
    print(f"wrote {len(rows)} reclaim rows")


if __name__ == "__main__":
    main()
