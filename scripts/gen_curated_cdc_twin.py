#!/usr/bin/env python3
"""Chunk-table twin for the q403 CURATED-CORPUS CDC gate — the r14
verdict's task #6 composition: the q363/q365 WARC→HTML curation front
end's OUTPUT (extractor text, entity-decoded and whitespace-collapsed)
flows through content-defined chunking into per-doc duplication mass,
so sub-document dedup is certified on extractor output, not just the
synthetic documents fixture.

Twins compose exactly as the engines do: the pages' text comes from
the ALREADY-COMMITTED q355/q363 twins (warc_pages_twin /
warc_curated_twin — independently computed from the archives by the
python HTML extractor), and the chunker is the q384-certified python
CDC twin (imported from gen_cdc_fixture). The q403 oracle then replays
the q389 dup-mass ALGEBRA in DuckDB over this chunk table — no stage
shares code with the Scala side.

Doc ids follow q365's convention: arc_id*100 + rec_idx for the warc
dir, +10000 for warc_curated. Chunk knobs are q384's (16 / 5 / 96).

  python3 scripts/gen_curated_cdc_twin.py

Outputs: src/test/resources/graft/sources/curated_cdc_chunks_twin.parquet
"""
import os

import pyarrow as pa
import pyarrow.parquet as pq

from gen_cdc_fixture import chunks, signed64

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")


def main():
    docs = {}
    t1 = pq.read_table(
        os.path.join(OUT, "warc_pages_twin.parquet")).to_pylist()
    t2 = pq.read_table(
        os.path.join(OUT, "warc_curated_twin.parquet")).to_pylist()
    for r in t1:
        docs[r["arc_id"] * 100 + r["rec_idx"]] = r["text"]
    for r in t2:
        docs[10000 + r["arc_id"] * 100 + r["rec_idx"]] = r["text"]

    rows = []
    for doc_id in sorted(docs):
        data = (docs[doc_id] or "").encode("utf-8")
        for idx, (off, ln, h) in enumerate(chunks(data)):
            rows.append((doc_id, idx, signed64(h), ln))

    # planted truth: the curated corpus DOES share chunks across docs
    # (the curated fixture re-serves warc bodies) — a vacuous gate
    # would certify nothing
    per = {}
    for d, _, h, ln in rows:
        per.setdefault((h, ln), set()).add(d)
    assert any(len(v) > 1 for v in per.values()), "no shared chunks"

    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "chunk_idx": pa.array([r[1] for r in rows], pa.int32()),
        "chunk_hash": pa.array([r[2] for r in rows], pa.int64()),
        "length": pa.array([r[3] for r in rows], pa.int64()),
    }), os.path.join(OUT, "curated_cdc_chunks_twin.parquet"))
    print(f"wrote {len(rows)} chunk rows over {len(docs)} curated docs")


if __name__ == "__main__":
    main()
