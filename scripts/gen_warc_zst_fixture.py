#!/usr/bin/env python3
"""Generate committed .warc.zst fixtures + twin for the q373 gate
(graft.ops.Warc zstd container support — the IIPC .warc.zst layout).

The SAME records as warc/arc_000 (imported from gen_warc_fixture, so
the record content is shared INPUT, not re-derived), compressed with
the SYSTEM zstd binary — an encoder entirely independent of the
zstd-jni decoder under test. Two archives:

  arc_000.warc.zst  one whole-archive frame
  arc_001.warc.zst  one frame PER RECORD, concatenated (the
                    per-record layout, exercising continuous-mode
                    multi-frame decode)

Both must enumerate IDENTICALLY to the plain arc_000.warc (twin rows
re-keyed per archive), so a zstd-path bug shows as archives
disagreeing — the q355 dual-archive discipline.

  python3 scripts/gen_warc_zst_fixture.py

Outputs: src/test/resources/graft/sources/warc_zst/arc_NNN.warc.zst
         src/test/resources/graft/sources/warc_zst_twin.parquet
"""
import importlib.util
import os
import subprocess

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
ZST_DIR = os.path.join(OUT, "warc_zst")

spec = importlib.util.spec_from_file_location(
    "gen_warc_fixture",
    os.path.join(os.path.dirname(__file__), "gen_warc_fixture.py"))
gwf = importlib.util.module_from_spec(spec)
spec.loader.exec_module(gwf)


def zstd_compress(data):
    p = subprocess.run(["zstd", "-q", "-c", "-9"], input=data,
                       stdout=subprocess.PIPE, check=True)
    return p.stdout


def main():
    os.makedirs(ZST_DIR, exist_ok=True)
    for old in os.listdir(ZST_DIR):
        os.remove(os.path.join(ZST_DIR, old))
    recs = gwf.build_records()
    members = []
    for i, (rt, url, status, ctype, payload) in enumerate(recs):
        hdrs = {}
        if url:
            hdrs["WARC-Target-URI"] = url
        hdrs["WARC-Record-ID"] = f"<urn:uuid:{i:08d}>"
        members.append(gwf.record(rt, hdrs, payload))
    blob = b"".join(members)
    with open(os.path.join(ZST_DIR, "arc_000.warc.zst"), "wb") as f:
        f.write(zstd_compress(blob))           # one whole-archive frame
    with open(os.path.join(ZST_DIR, "arc_001.warc.zst"), "wb") as f:
        for m in members:                      # one frame per record
            f.write(zstd_compress(m))

    rows = []
    for arc_id in (0, 1):
        for i, (rt, url, status, ctype, payload) in enumerate(recs):
            body_len = len(payload)
            st, ct = 0, ""
            if rt == "response":
                st, ct = status, ctype
                _, _, body = payload.partition(b"\r\n\r\n")
                body_len = len(body)
            rows.append((arc_id, i, rt, url, st, ct, body_len))
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "arc_id": pa.array([r[0] for r in rows], pa.int64()),
        "rec_idx": pa.array([r[1] for r in rows], pa.int32()),
        "rec_type": pa.array([r[2] for r in rows], pa.string()),
        "url": pa.array([r[3] for r in rows], pa.string()),
        "http_status": pa.array([r[4] for r in rows], pa.int32()),
        "content_type": pa.array([r[5] for r in rows], pa.string()),
        "body_len": pa.array([r[6] for r in rows], pa.int64()),
    }), os.path.join(OUT, "warc_zst_twin.parquet"))
    print(f"wrote 2 zst archives ({len(recs)} records each) + twin")


if __name__ == "__main__":
    main()
