#!/usr/bin/env python3
"""Generate COLOR source images + twin dHashes for the q362 color-JPEG
gate (verdict r12 #4: real image corpora are chroma-subsampled COLOR
JPEG — the dominant case — and the q344/q348/q359 gates are grayscale
fixtures only).

Writes SMOOTH low-frequency color pixel arrays (r≠g≠b everywhere, so
the luma collapse is genuinely exercised — a channel mixup moves the
hash) as 24-bpp BMPs into a STAGING dir, and the 64-bit luma dHash of
each PRE-ENCODING pixel array into the committed twin parquet. The
companion scripts/GenColorJpegFixture.java then re-encodes the staged
BMPs as chroma-subsampled color JPEGs (the committed gate inputs),
asserting 4:2:0 subsampling from the SOF marker bytes and a <=2-bit
round-trip margin (the gate allows 3). This script shares no code with
the Scala decoder; near-dup pairs (330..334 perturb 300..304) are
asserted <= 3 bits apart and sampled non-pairs > 3 bits BEFORE writing.

  python3 scripts/gen_color_image_fixture.py

Outputs: /tmp/graft_color_src/img_NNN.bmp            (staging, 40 imgs)
         src/test/resources/graft/sources/images_color_twin.parquet
"""
import math
import os
import struct

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
STAGE = "/tmp/graft_color_src"


def gen_pixels(i, w, h):
    """Smooth low-frequency COLOR pattern (JPEG-stable): per-channel
    phase/scale varies with i so ids hash far apart, channels differ
    everywhere so luma != any single channel."""
    px = []
    fx = 1.0 + (i % 5) * 0.7
    fy = 1.0 + ((i * 3) % 7) * 0.5
    ph = i * 0.9
    for y in range(h):
        row = []
        for x in range(w):
            r = int(127 + 110 * math.sin(fx * 2 * math.pi * x / w + ph))
            g = int(127 + 110 * math.cos(fy * 2 * math.pi * y / h - ph))
            b = int(127 + 110 * math.sin(
                2 * math.pi * (x + y) / (w + h) + ph * 2))
            row.append((max(0, min(255, r)), max(0, min(255, g)),
                        max(0, min(255, b))))
        px.append(row)
    return px


def perturb(px, i):
    """Brighten one smooth quadrant blob slightly: a visually-near
    duplicate whose luma dHash stays within 3 bits (asserted)."""
    h, w = len(px), len(px[0])
    cx, cy = (i * 31) % w, (i * 17) % h
    out = [list(row) for row in px]
    for y in range(h):
        for x in range(w):
            d2 = ((x - cx) / w) ** 2 + ((y - cy) / h) ** 2
            if d2 < 0.01:
                r, g, b = out[y][x]
                out[y][x] = (min(255, r + 12), min(255, g + 12),
                             min(255, b + 12))
    return out


def write_bmp(path, px):
    h, w = len(px), len(px[0])
    row_size = (w * 3 + 3) // 4 * 4
    data_size = row_size * h
    with open(path, "wb") as f:
        f.write(b"BM")
        f.write(struct.pack("<IHHI", 54 + data_size, 0, 0, 54))
        f.write(struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            data_size, 2835, 2835, 0, 0))
        for y in range(h - 1, -1, -1):
            row = bytearray()
            for x in range(w):
                r, g, b = px[y][x]
                row += bytes((b, g, r))
            row += b"\x00" * (row_size - len(row))
            f.write(row)


def dhash(px):
    h, w = len(px), len(px[0])
    gray = [[(299 * r + 587 * g + 114 * b) // 1000 for (r, g, b) in row]
            for row in px]
    hval = 0
    for y2 in range(8):
        sy = y2 * h // 8
        for x2 in range(8):
            a = gray[sy][x2 * w // 9]
            b = gray[sy][(x2 + 1) * w // 9]
            if a < b:
                hval |= 1 << (y2 * 8 + x2)
    if hval >= 1 << 63:
        hval -= 1 << 64
    return hval


def hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def main():
    os.makedirs(STAGE, exist_ok=True)
    for old in os.listdir(STAGE):
        os.remove(os.path.join(STAGE, old))
    sizes = [(96, 64), (80, 60), (64, 64), (112, 72), (88, 56)]
    imgs = {}
    for k in range(30):                       # 300..329 base
        w, h = sizes[k % len(sizes)]
        imgs[300 + k] = gen_pixels(k, w, h)
    for k in range(5):                        # 330..334 near-dup 300..304
        imgs[330 + k] = perturb(imgs[300 + k], k + 1)
    hashes = {i: dhash(px) for i, px in imgs.items()}
    for k in range(5):
        d = hamming(hashes[300 + k], hashes[330 + k])
        assert d <= 3, (300 + k, d)
    planted = {frozenset((300 + k, 330 + k)) for k in range(5)}
    seen = sorted(imgs)
    import random
    rng = random.Random(13)
    for _ in range(60):                       # sampled non-pairs stay apart
        a, b = rng.sample(seen, 2)
        if frozenset((a, b)) in planted:
            continue
        assert hamming(hashes[a], hashes[b]) > 3, (a, b)
    for i, px in imgs.items():
        write_bmp(os.path.join(STAGE, f"img_{i:03d}.bmp"), px)
    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = sorted(imgs)
    pq.write_table(pa.table({
        "img_id": pa.array([i - 300 for i in rows], pa.int64()),
        "width": pa.array([len(imgs[i][0]) for i in rows], pa.int32()),
        "height": pa.array([len(imgs[i]) for i in rows], pa.int32()),
        "dhash": pa.array([hashes[i] for i in rows], pa.int64()),
    }), os.path.join(OUT, "images_color_twin.parquet"))
    print(f"staged {len(rows)} color BMPs + committed twin")


if __name__ == "__main__":
    main()
