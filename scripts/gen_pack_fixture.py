#!/usr/bin/env python3
"""Generate the next-fit packing fixture + twin for the q383 gate
(graft.ops.SequencePack.packNextFit — whole-document NEXT-FIT bin
packing into a fixed token budget, the instruction-tuning packing
shape).

Planted against budget 100: an exact fit (boundary is STRICTLY
greater-than, so 60+40 stays in one pack), a one-over spill (60+41
splits), an OVERSIZE document (n > budget -> singleton pack, next doc
opens a fresh pack), zero-token documents joining the current pack, a
negative count clamping to 0, a single-document group, and two groups
interleaved by id to pin the per-group state reset. The twin is an
independent python implementation of the same documented rules.

  python3 scripts/gen_pack_fixture.py

Outputs: src/test/resources/graft/sources/pack_fixture.parquet
         src/test/resources/graft/sources/pack_twin.parquet
"""
import os

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")

BUDGET = 100

# (group, id, n_tokens)
DOCS = [
    # g1: exact fit stays, then spill
    ("g1", 1, 60), ("g1", 2, 40),      # 60+40 == 100 -> one pack
    ("g1", 3, 41), ("g1", 4, 60),      # 41, then 41+60 > 100 -> spill
    # g1: oversize singleton, then fresh pack
    ("g1", 5, 250),                    # oversize -> own pack
    ("g1", 6, 10),                     # must open a NEW pack after it
    ("g1", 7, 0),                      # zero-token: joins current pack
    ("g1", 8, -7),                     # negative clamps to 0, joins
    # g2: single doc
    ("g2", 1, 99),
    # g3: interleaves with others by id; state must be per-group
    ("g3", 1, 70), ("g3", 2, 70), ("g3", 3, 30),
]


def next_fit(docs):
    rows = []
    state = {}
    for g, i, n in docs:  # caller feeds (group, id)-sorted
        pack, fill = state.get(g, (0, 0))
        n0 = max(n, 0)
        if fill > 0 and fill + n0 > BUDGET:
            pack, fill = pack + 1, 0
        fill += n0
        state[g] = (pack, fill)
        rows.append((g, i, n0, pack, n0 > BUDGET))
    return rows


def main():
    rows = next_fit(sorted(DOCS))
    byp = {(g, i): (p, o) for g, i, _, p, o in rows}
    # planted truths
    assert byp[("g1", 1)] == (0, False) and byp[("g1", 2)] == (0, False)
    assert byp[("g1", 3)] == (1, False)   # exact fit stayed; 41 spilled
    assert byp[("g1", 4)] == (2, False)   # 41+60 > 100
    assert byp[("g1", 5)] == (3, True)    # oversize singleton
    assert byp[("g1", 6)] == (4, False)   # fresh pack after oversize
    assert byp[("g1", 7)] == (4, False)   # zero joins
    assert byp[("g1", 8)] == (4, False)   # negative clamps + joins
    assert byp[("g2", 1)] == (0, False)
    assert byp[("g3", 2)] == (1, False)   # 70+70 > 100
    assert byp[("g3", 3)] == (1, False)   # 70+30 == 100 exact fit stays

    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "grp": pa.array([d[0] for d in DOCS], pa.string()),
        "doc_id": pa.array([d[1] for d in DOCS], pa.int64()),
        "n_tok": pa.array([d[2] for d in DOCS], pa.int64()),
    }), os.path.join(OUT, "pack_fixture.parquet"))
    pq.write_table(pa.table({
        "grp": pa.array([r[0] for r in rows], pa.string()),
        "doc_id": pa.array([r[1] for r in rows], pa.int64()),
        "n_tokens": pa.array([r[2] for r in rows], pa.int64()),
        "pack_id": pa.array([r[3] for r in rows], pa.int64()),
        "oversize": pa.array([r[4] for r in rows], pa.bool_()),
    }), os.path.join(OUT, "pack_twin.parquet"))
    print(f"wrote {len(DOCS)} docs + twin")


if __name__ == "__main__":
    main()
