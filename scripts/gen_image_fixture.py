#!/usr/bin/env python3
"""Generate committed BMP image fixtures + dHash twin for the image
perceptual-hash operators (MediaCodec.decodeBmpGray / dHash64,
Multimodal.imageDHash / dhashNearDupPairs).

Writes real 24-bpp bottom-up BI_RGB BMP files pixel-by-pixel and
computes each image's 64-bit difference hash INDEPENDENTLY from the
same pixel arrays (this script shares no code with the Scala decoder),
so the q340 gate certifies decoder + grayscale + resize + hash
end-to-end: a wrong row order, BGR mixup, padding slip or sampling
offset breaks the hash compare.

The documented dHash rule (both sides implement it exactly):
  gray  = (299*R + 587*G + 114*B) // 1000            (integer floor)
  s(x,y) = gray[y2*h//8][x2*w//9]  for x2 in 0..8, y2 in 0..7
  bit(y*8+x) = 1  iff  s(x,y) < s(x+1,y)             (left < right)
  hash = sum(bit << (y*8+x)) as a SIGNED int64

Fixture population (60 images, 64x48 .. irregular sizes):
  - base images: deterministic gradient + sinusoid patterns per id
  - ids 50..59: NEAR-DUPLICATES of ids 0..9 (same pattern, a few
    pixels perturbed) — planted so dHash hamming <= 3
The script asserts every planted pair lands <= 3 bits and every
sampled non-pair > 3 bits before writing anything.

  python3 scripts/gen_image_fixture.py

Outputs: src/test/resources/graft/sources/images/img_NNN.bmp
         src/test/resources/graft/sources/images_twin.parquet
"""
import math
import os
import struct

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
IMG_DIR = os.path.join(OUT, "images")


def gen_pixels(i, w, h):
    """Deterministic RGB pattern for image id i (top-down rows)."""
    px = []
    for y in range(h):
        row = []
        for x in range(w):
            r = (x * 7 + y * 3 + i * 11) % 256
            g = int(127 + 120 * math.sin((x + i) / 5.0) +
                    y * (i % 5)) % 256
            b = (x * x + y * y + i * 31) % 256
            row.append((r, g, b))
        px.append(row)
    return px


def perturb(px, i):
    """Flip a handful of pixels: visually-near duplicate."""
    h, w = len(px), len(px[0])
    out = [list(row) for row in px]
    for k in range(4):
        x = (i * 13 + k * 29) % w
        y = (i * 7 + k * 17) % h
        r, g, b = out[y][x]
        out[y][x] = ((r + 40) % 256, g, (b + 60) % 256)
    return out


def write_bmp(path, px):
    """24-bpp bottom-up BI_RGB BMP, rows padded to 4 bytes."""
    h, w = len(px), len(px[0])
    row_size = (w * 3 + 3) // 4 * 4
    data_size = row_size * h
    with open(path, "wb") as f:
        f.write(b"BM")
        f.write(struct.pack("<IHHI", 54 + data_size, 0, 0, 54))
        f.write(struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            data_size, 2835, 2835, 0, 0))
        for y in range(h - 1, -1, -1):       # bottom-up
            row = bytearray()
            for x in range(w):
                r, g, b = px[y][x]
                row += bytes((b, g, r))      # BGR
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
    if hval >= 1 << 63:                      # signed int64
        hval -= 1 << 64
    return hval


def hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def main():
    os.makedirs(IMG_DIR, exist_ok=True)
    sizes = [(64, 48), (80, 60), (72, 40), (96, 64), (64, 64)]
    imgs = {}
    for i in range(50):
        w, h = sizes[i % len(sizes)]
        imgs[i] = gen_pixels(i, w, h)
    for j in range(10):                      # 50..59 near-dup 0..9
        imgs[50 + j] = perturb(imgs[j], j)

    hashes = {i: dhash(px) for i, px in imgs.items()}
    # planted near-dups must land <= 3 bits; everything else sampled
    # must be far — otherwise the fixture can't discriminate
    for j in range(10):
        d = hamming(hashes[j], hashes[50 + j])
        assert d <= 3, (j, d)
    for a in range(50):
        for b in range(a + 1, 50):
            d = hamming(hashes[a], hashes[b])
            assert d > 3, (a, b, d)
    pairs = sorted((j, 50 + j) for j in range(10))
    print(f"planted pairs verified: {pairs}")

    for i, px in imgs.items():
        write_bmp(os.path.join(IMG_DIR, f"img_{i:03d}.bmp"), px)

    import pyarrow as pa
    import pyarrow.parquet as pq
    ids = sorted(imgs)
    tbl = pa.table({
        "img_id": pa.array(ids, pa.int64()),
        "width": pa.array([len(imgs[i][0]) for i in ids], pa.int32()),
        "height": pa.array([len(imgs[i]) for i in ids], pa.int32()),
        "dhash": pa.array([hashes[i] for i in ids], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(OUT, "images_twin.parquet"))
    print(f"wrote {len(ids)} BMPs + twin")


if __name__ == "__main__":
    main()
