#!/usr/bin/env python3
"""Generate committed MJPEG AVI fixtures + frame-mapping twin for the
q350 video frame-sampling gate (MediaCodec.aviFrames /
Multimodal.videoFrameDHash).

The AVIs are written HERE from the public VfW RIFF layout (stdlib
struct — no code shared with the Scala container walk), each '00dc'
frame being one of the COMMITTED JPEG fixtures byte-for-byte. The twin
records which source image landed at which (video_id, frame_idx), so
the gate can demand: every sampled frame's dHash lands within hamming
<= 3 of the INDEPENDENT python twin hash of that image's pre-encoding
pixels (the q344 contract, now reached THROUGH the container walk),
with exact dims. One video nests its frames inside a 'rec ' grouping
LIST (some muxers do) to exercise the lenient walk.

  python3 scripts/gen_avi_fixture.py

Outputs: src/test/resources/graft/sources/videos/vid_NNN.avi
         src/test/resources/graft/sources/video_frames_twin.parquet
"""
import os
import re
import struct

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
JPEG_DIR = os.path.join(OUT, "images_jpeg")
VID_DIR = os.path.join(OUT, "videos")


def chunk(fourcc, payload):
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def lst(listtype, payload):
    return chunk(b"LIST", listtype + payload)


def build_avi(frames, w, h, rec_group=False):
    n = len(frames)
    avih = struct.pack("<14I", 40000, 0, 0, 0x10, n, 0, 1, 0, w, h,
                       0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<10I", 0, 0, 0, 1, 25, 0,
                                            n, 0, 0xFFFFFFFF, 0)
            + struct.pack("<4h", 0, 0, w, h))
    strf = struct.pack("<IiiHH", 40, w, h, 1, 24) + b"MJPG" + \
        struct.pack("<IiiII", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    frame_chunks = b"".join(chunk(b"00dc", f) for f in frames)
    if rec_group:
        movi = lst(b"movi", lst(b"rec ", frame_chunks))
    else:
        movi = lst(b"movi", frame_chunks)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def main():
    os.makedirs(VID_DIR, exist_ok=True)
    for old in os.listdir(VID_DIR):
        os.remove(os.path.join(VID_DIR, old))
    jpegs = sorted(os.listdir(JPEG_DIR))
    ids = [int(re.match(r"img_(\d+)\.jpg", f).group(1)) for f in jpegs]
    blobs = {i: open(os.path.join(JPEG_DIR, f), "rb").read()
             for i, f in zip(ids, jpegs)}
    rows = []  # (video_id, frame_idx, img_id)
    for v in range(5):
        fr_ids = [ids[(v * 6 + f) % len(ids)] for f in range(6)]
        frames = [blobs[i] for i in fr_ids]
        # header dims from frame 0's SOF0 (FFC0: len(2) prec(1) h(2) w(2));
        # per-frame JPEGs carry their own dims, the AVI header is nominal
        sof = frames[0].find(b"\xff\xc0")
        h0, w0 = struct.unpack(">HH", frames[0][sof + 5: sof + 9])
        avi = build_avi(frames, w0, h0, rec_group=(v == 4))
        with open(os.path.join(VID_DIR, f"vid_{v:03d}.avi"), "wb") as f:
            f.write(avi)
        for fi, img in enumerate(fr_ids):
            rows.append((v, fi, img))
    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({
        "video_id": pa.array([r[0] for r in rows], pa.int64()),
        "frame_idx": pa.array([r[1] for r in rows], pa.int32()),
        "img_id": pa.array([r[2] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(OUT, "video_frames_twin.parquet"))
    print(f"wrote 5 AVIs ({len(rows)} frames) + mapping twin")


if __name__ == "__main__":
    main()
