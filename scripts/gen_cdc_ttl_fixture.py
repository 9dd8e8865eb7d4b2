#!/usr/bin/env python3
"""Fixture + twin for the q398 streaming chunk-novelty TTL gate
(graft.streaming.StreamingChunkDedup.novelChunksEventTime): CDC
chunk-level first-seen dedup whose state EXPIRES on an event-time TTL
— the recrawl-scale production form next to q390's NoTimeout form.

The twin REPLAYS the documented flatMapGroupsWithState protocol (the
StreamingDedupSpec TTL discipline) on the q384-certified python CDC
chunker (imported from gen_cdc_fixture — no Scala code anywhere near
this script):

  - watermark before batch N = max event time over batches 1..N-1
    (delay 0);
  - a group WITH data in the batch is processed normally (novel iff
    its state is absent, marked on the (doc_id, chunk_idx)-minimal
    occurrence; every occurrence emits) and re-arms its timeout to
    max(batch event time) + TTL;
  - a group WITHOUT data whose timeout < watermark is REMOVED during
    the batch (emitting nothing) — so a chunk recurring in a LATER
    batch reads novel again: the planted expiry.

Planted truths (TTL = 30 s, batches split on doc_id at 3/5/6):
  alpha: novel@id0, within-batch dup@id2, EXPIRES during batch 3
    (timeout 10+30=40 < watermark 100), novel AGAIN @id6, dup @id8;
  beta: novel@id1, batch-2 repeat@id3 re-arms (15+30=45), still
    expires during batch 3 (45 < 100), novel again @id7;
  spacer-one/two: the watermark-advancing rows (each novel once);
  id9 empty text: zero chunks, emits nothing, never throws.

  python3 scripts/gen_cdc_ttl_fixture.py

Outputs: src/test/resources/graft/sources/cdc_ttl_fixture.parquet
         src/test/resources/graft/sources/cdc_ttl_twin.parquet
"""
import os

import pyarrow as pa
import pyarrow.parquet as pq

from gen_cdc_fixture import chunks

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")

TTL_SEC = 30

# (doc_id, ts_sec, text) — every text < MIN_SIZE(16) bytes, so the
# chunker emits exactly one tail chunk per doc (chunking itself is
# q384/q385's domain; THIS gate certifies the TTL state machine)
ROWS = [
    (0, 10, "alpha-chunk"),
    (1, 11, "beta-chunk"),
    (2, 12, "alpha-chunk"),
    (3, 15, "beta-chunk"),
    (4, 100, "spacer-one"),
    (5, 101, "spacer-two"),
    (6, 102, "alpha-chunk"),
    (7, 103, "beta-chunk"),
    (8, 104, "alpha-chunk"),
    (9, 105, ""),
]

# gate-side batch split points (doc_id exclusive upper bounds)
BATCH_SPLITS = [3, 5, 6, 10]


def replay():
    """The documented protocol, replayed batch by batch."""
    state = {}  # chunk key -> (count, timeout_sec)
    watermark = 0
    out = []
    lo = 0
    for hi in BATCH_SPLITS:
        batch = [r for r in ROWS if lo <= r[0] < hi]
        lo = hi
        # chunk every row through the certified python chunker
        occ = {}  # key -> [(doc_id, chunk_idx, length, ts)]
        for doc_id, ts, text in batch:
            for idx, (off, ln, h) in enumerate(chunks(text.encode())):
                occ.setdefault((h, ln), []).append((doc_id, idx, ln, ts))
        # groups WITHOUT data whose timeout passed the watermark expire
        for key in [k for k, (_, to) in state.items()
                    if k not in occ and watermark > to]:
            del state[key]
        # groups WITH data: emit every occurrence; novel on the
        # (doc_id, chunk_idx)-minimal row iff state absent
        for key, rows in occ.items():
            seen_before = key in state
            first = min(rows)
            max_ts = max(r[3] for r in rows)
            cnt = (state[key][0] if seen_before else 0) + len(rows)
            state[key] = (cnt, max_ts + TTL_SEC)
            for r in sorted(rows):
                out.append((r[0], r[1], r[2],
                            (not seen_before) and r == first))
        watermark = max([watermark] + [r[1] for r in batch])
    return sorted(out)


def main():
    rows = replay()
    # planted truths: expiry makes alpha/beta novel AGAIN in batch 4
    novel = {(d, i): n for d, i, _, n in rows}
    assert novel[(0, 0)] is True and novel[(2, 0)] is False
    assert novel[(1, 0)] is True and novel[(3, 0)] is False
    assert novel[(6, 0)] is True, "alpha must expire and re-emit"
    assert novel[(7, 0)] is True, "beta must expire and re-emit"
    assert novel[(8, 0)] is False, "batch-4 within-batch dup"
    assert (9, 0) not in novel, "empty text emits nothing"

    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in ROWS], pa.int64()),
        "ts_sec": pa.array([r[1] for r in ROWS], pa.int64()),
        "text": pa.array([r[2] for r in ROWS], pa.string()),
    }), os.path.join(OUT, "cdc_ttl_fixture.parquet"))

    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "chunk_idx": pa.array([r[1] for r in rows], pa.int32()),
        "length": pa.array([r[2] for r in rows], pa.int64()),
        "novel": pa.array([r[3] for r in rows], pa.bool_()),
    }), os.path.join(OUT, "cdc_ttl_twin.parquet"))
    print(f"wrote {len(ROWS)} fixture rows, {len(rows)} twin rows")


if __name__ == "__main__":
    main()
