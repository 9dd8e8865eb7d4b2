#!/usr/bin/env python3
"""Twin parquet for the q369 Avro gate: the SAME row formula as
scripts/GenAvroFixture.java, implemented independently with pyarrow
(no avro library anywhere near this script) — a divergence in either
implementation of the formula, or any decode bug in the Scala reader,
breaks the hash compare.

  python3 scripts/gen_avro_twin.py

Outputs: src/test/resources/graft/sources/avro_twin.parquet
"""
import os

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")

import pyarrow as pa
import pyarrow.parquet as pq
import struct


def f32(x):
    """Round-trip through IEEE single precision (avro float field)."""
    return struct.unpack("<f", struct.pack("<f", x))[0]


rows = range(100)
pq.write_table(pa.table({
    "id": pa.array([i for i in rows], pa.int64()),
    "rank": pa.array([1000 - i for i in rows], pa.int32()),
    "name": pa.array(
        [f"n_{i}" + ("_café" if i % 7 == 0 else "") for i in rows],
        pa.string()),
    "value": pa.array([i * 1.25 - 30 for i in rows], pa.float64()),
    "ratio": pa.array([f32(i / 8.0) for i in rows], pa.float32()),
    "flag": pa.array([i % 3 == 0 for i in rows], pa.bool_()),
    "opt_qty": pa.array(
        [None if i % 4 == 0 else i * 7 for i in rows], pa.int64()),
    "payload": pa.array(
        [bytes(((i & 0xff), ((i + 1) & 0xff), ((i + 2) & 0xff)))
         for i in rows], pa.binary()),
}), os.path.join(OUT, "avro_twin.parquet"))
print("wrote avro_twin.parquet (100 rows)")
