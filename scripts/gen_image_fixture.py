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


def write_png(path, px, color_type):
    """8-bit non-interlaced PNG written from scratch (zlib stdlib —
    no imaging library involved). Per-row filter types CYCLE 0..4 so
    the Scala decoder's None/Sub/Up/Average/Paeth paths are all
    exercised by real committed bytes. color_type: 0 gray (pixels must
    be (v,v,v)), 2 RGB, 6 RGBA (alpha deterministic, must be ignored
    by the luma pipeline)."""
    import zlib
    h, w = len(px), len(px[0])
    channels = {0: 1, 2: 3, 6: 4}[color_type]

    def sample(y, x):
        r, g, b = px[y][x]
        if color_type == 0:
            assert r == g == b, "gray PNG needs r==g==b"
            return bytes((r,))
        if color_type == 2:
            return bytes((r, g, b))
        return bytes((r, g, b, (x * 3 + y) % 256))

    raw = bytearray()
    prev = bytearray(w * channels)
    for y in range(h):
        cur = bytearray()
        for x in range(w):
            cur += sample(y, x)
        f = y % 5
        raw.append(f)
        bpp = channels
        for i in range(len(cur)):
            a = cur[i - bpp] if i >= bpp else 0
            up = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                v = cur[i]
            elif f == 1:
                v = (cur[i] - a) % 256
            elif f == 2:
                v = (cur[i] - up) % 256
            elif f == 3:
                v = (cur[i] - (a + up) // 2) % 256
            else:
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (up if pb <= pc else c)
                v = (cur[i] - pred) % 256
            raw.append(v)
        prev = cur

    def chunk(typ, data):
        body = typ + data
        return (struct.pack(">I", len(data)) + body +
                struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(
            ">IIBBBBB", w, h, 8, color_type, 0, 0, 0)))
        f.write(chunk(b"IDAT", zlib.compress(bytes(raw), 6)))
        f.write(chunk(b"IEND", b""))


def gen_gray(i, w, h):
    return [[((x * 11 + y * 5 + i * 23) % 256,) * 3
             for x in range(w)] for y in range(h)]


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
    for old in os.listdir(IMG_DIR):
        os.remove(os.path.join(IMG_DIR, old))
    sizes = [(64, 48), (80, 60), (72, 40), (96, 64), (64, 64)]
    imgs = {}
    for i in range(50):
        w, h = sizes[i % len(sizes)]
        imgs[i] = gen_pixels(i, w, h)
    for j in range(10):                      # 50..59 near-dup 0..9
        imgs[50 + j] = perturb(imgs[j], j)
    # 100..109: the SAME pixels as 0..9, committed as PNG (RGB, all
    # five filters) — cross-FORMAT exact duplicates, hamming 0
    for j in range(10):
        imgs[100 + j] = imgs[j]
    # 110..119: fresh grayscale patterns, PNG color type 0
    for j in range(10):
        w, h = sizes[j % len(sizes)]
        imgs[110 + j] = gen_gray(300 + j * 7, w, h)
    # 120..129: fresh RGB patterns, PNG color type 6 (alpha ignored);
    # slope/orientation varies with j so dHashes stay far apart
    for j in range(10):
        w, h = sizes[(j + 2) % len(sizes)]
        imgs[120 + j] = [
            [((x * (3 + j) + y * (11 - j) + j * 41) % 256,
              (x * x // (j + 2) + y * 9 + j * 77) % 256,
              ((x + j * 5) * (y + 3) // 4) % 256)
             for x in range(w)] for y in range(h)]

    hashes = {i: dhash(px) for i, px in imgs.items()}
    # planted relations: near-dups <= 3 bits, re-encodes EXACTLY 0;
    # every unrelated pair must be far or the fixture can't discriminate
    for j in range(10):
        assert hamming(hashes[j], hashes[50 + j]) <= 3
        assert hashes[100 + j] == hashes[j]
    related = {(j, 50 + j) for j in range(10)}
    related |= {(j, 100 + j) for j in range(10)}
    related |= {(50 + j, 100 + j) for j in range(10)}
    ids = sorted(imgs)
    n_close = 0
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            d = hamming(hashes[a], hashes[b])
            if (a, b) in related:
                assert d <= 3, (a, b, d)
                n_close += 1
            else:
                assert d > 3, (a, b, d)
    print(f"planted relations verified: {n_close} close pairs, "
          f"{len(ids) * (len(ids) - 1) // 2 - n_close} far")

    for i, px in imgs.items():
        if i < 100:
            write_bmp(os.path.join(IMG_DIR, f"img_{i:03d}.bmp"), px)
        elif i < 110:
            write_png(os.path.join(IMG_DIR, f"img_{i:03d}.png"), px, 2)
        elif i < 120:
            write_png(os.path.join(IMG_DIR, f"img_{i:03d}.png"), px, 0)
        else:
            write_png(os.path.join(IMG_DIR, f"img_{i:03d}.png"), px, 6)

    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({
        "img_id": pa.array(ids, pa.int64()),
        "width": pa.array([len(imgs[i][0]) for i in ids], pa.int32()),
        "height": pa.array([len(imgs[i]) for i in ids], pa.int32()),
        "dhash": pa.array([hashes[i] for i in ids], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(OUT, "images_twin.parquet"))
    print(f"wrote {len(ids)} images (60 BMP + 30 PNG) + twin")


if __name__ == "__main__":
    main()
