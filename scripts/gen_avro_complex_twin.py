#!/usr/bin/env python3
"""Twin parquet for the q399 Avro complex-type gate: the SAME row
formula as scripts/GenAvroComplexFixture.java, implemented
independently with pyarrow (no avro library anywhere near this script).

The gate projects the container columns into SQL-comparable scalars
(sizes, csv joins, per-key lookups) so the twin stores those scalars
directly — a mis-decoded element, wrong order, dropped entry, or
container/primitive desync in the Scala reader breaks the hash compare.

  python3 scripts/gen_avro_complex_twin.py

Outputs: src/test/resources/graft/sources/avro_complex_twin.parquet
"""
import os

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")

rows = range(60)


def tags(i):
    return ["t" + str((i + j) % 7) for j in range(i % 4)]


def opt_ids(i):
    return None if i % 6 == 0 else [i * 10 + j for j in range(i % 3)]


pq.write_table(pa.table({
    "id": pa.array([i for i in rows], pa.int64()),
    "n_tags": pa.array([len(tags(i)) for i in rows], pa.int32()),
    "tags_csv": pa.array([",".join(tags(i)) for i in rows], pa.string()),
    "w": pa.array([i / 4.0 for i in rows], pa.float64()),
    "n_scores": pa.array([0 if i % 5 == 0 else 2 for i in rows],
                         pa.int32()),
    "score_a": pa.array([None if i % 5 == 0 else i * 0.5 for i in rows],
                        pa.float64()),
    "score_b": pa.array([None if i % 5 == 0 else i * 0.25 for i in rows],
                        pa.float64()),
    "n_opt": pa.array([-1 if opt_ids(i) is None else len(opt_ids(i))
                       for i in rows], pa.int32()),
    "opt_csv": pa.array([None if opt_ids(i) is None else
                         ",".join(str(x) for x in opt_ids(i))
                         for i in rows], pa.string()),
    "label": pa.array(["r" + str(i) for i in rows], pa.string()),
}), os.path.join(OUT, "avro_complex_twin.parquet"))
print("wrote 60 twin rows")
