#!/usr/bin/env python3
"""Generate the twin for the q390 STREAMING chunk-novelty gate
(graft.streaming.StreamingChunkDedup.novelChunks — first-seen state on
(chunk_hash, length) keys over the CDC chunk stream; the
incremental-ingest metric: how many NEW bytes did each document
contribute, given everything seen before it?).

Replays the same protocol as the gate: the cdc_fixture docs stream in
THREE micro-batches (doc_id order, ceil(n/3) per batch); within a
batch a chunk content's first occurrence by (doc_id, chunk_idx) is the
novel one, later occurrences and all cross-batch repeats are
suppressed by state. Per-doc aggregation (n_chunks, total_bytes,
novel_bytes) over the emitted rows. Imports the CDC chunker from
gen_cdc_fixture — the same independent python implementation q384
certifies.

  python3 scripts/gen_cdc_stream_fixture.py

Outputs: src/test/resources/graft/sources/cdc_stream_twin.parquet
"""
import math
import os

from gen_cdc_fixture import DOCS, chunks, signed64

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")

N_BATCHES = 3


def main():
    docs = sorted(DOCS)
    per = math.ceil(len(docs) / N_BATCHES)
    batches = [docs[i:i + per] for i in range(0, len(docs), per)]
    seen = set()
    agg = {did: [0, 0, 0] for did, _ in docs}  # n_chunks, total, novel
    for batch in batches:
        batch_rows = []
        for did, text in batch:
            data = (text or "").encode("utf-8")
            for idx, (off, ln, h) in enumerate(chunks(data)):
                batch_rows.append((did, idx, ln, signed64(h)))
        # group by key; first occurrence in (doc_id, chunk_idx) order
        # is the batch's candidate; novel iff the key is globally new
        batch_rows.sort()
        batch_first = set()
        for did, idx, ln, h in batch_rows:
            key = (h, ln)
            novel = key not in seen and key not in batch_first
            if key not in seen:
                batch_first.add(key)
            agg[did][0] += 1
            agg[did][1] += ln
            agg[did][2] += ln if novel else 0
        seen |= batch_first
    rows = [(did, a[0], a[1], a[2]) for did, a in sorted(agg.items())]
    byd = {r[0]: r for r in rows}
    # planted truths: doc 0 is all-novel (first in batch 1); doc 1
    # repeats the shared span in the SAME batch (within-batch
    # suppression); doc 7 repeats it from batch 3 (cross-batch
    # suppression); doc 5's repeated max-size chunks dedup within one
    # doc; empty/null docs emit zero rows
    assert byd[0][3] == byd[0][2]                       # all novel
    assert 0 < byd[1][3] < byd[1][2]                    # partly novel
    assert 0 < byd[7][3] < byd[7][2]
    assert byd[5][3] == 96 + (byd[5][2] - 3 * 96)       # 1 of 3 dup-96s
    assert byd[3] == (3, 0, 0, 0) and byd[4] == (4, 0, 0, 0)

    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_chunks": pa.array([r[1] for r in rows], pa.int64()),
        "total_bytes": pa.array([r[2] for r in rows], pa.int64()),
        "novel_bytes": pa.array([r[3] for r in rows], pa.int64()),
    }), os.path.join(OUT, "cdc_stream_twin.parquet"))
    print(f"wrote stream twin ({len(rows)} docs, "
          f"novel {sum(r[3] for r in rows)}/{sum(r[2] for r in rows)})")


if __name__ == "__main__":
    main()
