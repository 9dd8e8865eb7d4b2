#!/usr/bin/env python3
"""Generate committed sas7bdat fixtures for the graft-sas7bdat source.

A from-scratch sas7bdat ENCODER (32-bit little-endian layout, one meta
page + data pages; optional SASYZCRL run-length compression), assembled
per the publicly documented reverse-engineered layout (the sas7bdat
format is described by the parso and ReadStat projects and by the
"SAS7BDAT Database Binary Format" technical note; pandas carries an
independent reader). pandas.read_sas is the GROUND TRUTH here: the
script fails unless pandas reads back every fixture cell exactly, so
the committed fixtures are certified by the reference's own reader —
the same recipe that validated the .dta/.xpt fixtures in round 10.

  python3 scripts/gen_sas7bdat_fixture.py

Outputs under src/test/resources/graft/sources/:
  mixed.sas7bdat / mixed_twin.parquet          uncompressed, 3 data pages
  mixed_rle.sas7bdat                           same VALUES, SASYZCRL rows
                                               (char runs exercise the
                                               blank/zero/repeat commands)
"""
import math
import os
import struct

import pandas as pd

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")

MAGIC = (b"\x00\x00\x00\x00\x00\x00\x00\x00"
         b"\x00\x00\x00\x00\xc2\xea\x81\x60"
         b"\xb3\x14\x11\xcf\xbd\x92\x08\x00"
         b"\x09\xc7\x31\x8c\x18\x1f\x10\x11")

HEADER_LEN = 1024
PAGE_LEN = 2048
BIT_OFFSET = 16          # 32-bit page header prefix
PTR_LEN = 12             # 32-bit subheader pointer

SIG_ROWSIZE = b"\xF7\xF7\xF7\xF7"
SIG_COLSIZE = b"\xF6\xF6\xF6\xF6"
SIG_COLTEXT = b"\xFD\xFF\xFF\xFF"
SIG_COLNAME = b"\xFF\xFF\xFF\xFF"
SIG_COLATTR = b"\xFC\xFF\xFF\xFF"
SIG_FMTLBL = b"\xFE\xFB\xFF\xFF"


def u16(v):
    return struct.pack("<H", v)


def u32(v):
    return struct.pack("<I", v)


def header(page_count, name=b"MIXED"):
    h = bytearray(HEADER_LEN)
    h[0:32] = MAGIC
    h[32] = 0x22          # NOT 0x33 -> 32-bit file, no align2
    h[35] = 0x22          # NOT 0x33 -> no align1
    h[37] = 0x01          # little-endian
    h[39] = ord("1")      # unix
    h[70] = 20            # utf-8
    h[92:92 + len(name)] = name
    h[156:156 + 8] = b"DATA    "
    # creation/modification dates (seconds since 1960): arbitrary
    h[164:172] = struct.pack("<d", 2.0e9)
    h[172:180] = struct.pack("<d", 2.0e9)
    h[196:200] = u32(HEADER_LEN)
    h[200:204] = u32(PAGE_LEN)
    h[204:208] = u32(page_count)
    h[216:224] = b"9.0401M2"
    h[224:240] = b"Linux".ljust(16)
    return bytes(h)


def subheaders(cols, n_rows, row_len, compressed):
    """Build the metadata subheader blobs in processing order.

    cols: list of (name, kind 'd'|'s', width).
    Returns [(blob, compression_flag, type_flag), ...]."""
    ncols = len(cols)

    rowsize = bytearray(480)
    rowsize[0:4] = SIG_ROWSIZE
    rowsize[5 * 4:5 * 4 + 4] = u32(row_len)     # row length
    rowsize[6 * 4:6 * 4 + 4] = u32(n_rows)      # total row count
    rowsize[9 * 4:9 * 4 + 4] = u32(ncols)       # col_count_p1
    rowsize[10 * 4:10 * 4 + 4] = u32(0)         # col_count_p2
    rowsize[15 * 4:15 * 4 + 4] = u32(0)         # rows on mix page
    # lcs (354) / lcp (378) left 0: no creator-proc text

    colsize = bytearray(24)
    colsize[0:4] = SIG_COLSIZE
    colsize[4:8] = u32(ncols)

    # column text blob: [u16 size][6 pad][optional SASYZCRL][names...];
    # name offsets are relative to the blob START (the size field
    # included — that is how readers slice column_names_raw)
    text = bytearray()
    text += b"\x00\x00"   # size placeholder
    text += b"\x00" * 6
    if compressed:
        text += b"SASYZCRL"
    name_refs = []        # (offset, length) per column
    for name, _, _ in cols:
        nb = name.encode("utf-8")
        name_refs.append((len(text), len(nb)))
        text += nb
        if len(text) % 4:
            text += b"\x00" * (4 - len(text) % 4)
    text[0:2] = u16(len(text))
    coltext = bytearray(4 + len(text))
    coltext[0:4] = SIG_COLTEXT
    coltext[4:] = text

    colname = bytearray(20 + 8 * ncols)
    colname[0:4] = SIG_COLNAME
    for i, (off, ln) in enumerate(name_refs):
        base = 12 + 8 * i
        colname[base:base + 2] = u16(0)       # text subheader index
        colname[base + 2:base + 4] = u16(off)
        colname[base + 4:base + 6] = u16(ln)

    colattr = bytearray(20 + 12 * ncols)
    colattr[0:4] = SIG_COLATTR
    off = 0
    for i, (_, kind, width) in enumerate(cols):
        base = 12 + 12 * i
        colattr[base:base + 4] = u32(off)
        colattr[base + 4:base + 8] = u32(width)
        colattr[base + 10] = 1 if kind == "d" else 2
        off += width
    assert off == row_len

    out = [(bytes(rowsize), 0, 0), (bytes(colsize), 0, 0),
           (bytes(coltext), 0, 0), (bytes(colname), 0, 0),
           (bytes(colattr), 0, 0)]
    for _ in cols:
        fmt = bytearray(64)
        fmt[0:4] = SIG_FMTLBL
        # all text refs zero -> no format, no label, no datetime coercion
        out.append((bytes(fmt), 0, 0))
    return out


def page(ptype, blocks, pointers_and_blobs):
    """One page: [16 pad][u16 type][u16 block_count][u16 sub_count]
    [2 pad][pointers][blobs from the page END downward]."""
    pg = bytearray(PAGE_LEN)
    pg[BIT_OFFSET:BIT_OFFSET + 2] = u16(ptype)
    pg[BIT_OFFSET + 2:BIT_OFFSET + 4] = u16(blocks)
    pg[BIT_OFFSET + 4:BIT_OFFSET + 6] = u16(len(pointers_and_blobs))
    tail = PAGE_LEN
    for i, (blob, comp, typ) in enumerate(pointers_and_blobs):
        tail -= len(blob)
        pg[tail:tail + len(blob)] = blob
        base = BIT_OFFSET + 8 + PTR_LEN * i
        pg[base:base + 4] = u32(tail)
        pg[base + 4:base + 8] = u32(len(blob))
        pg[base + 8] = comp
        pg[base + 9] = typ
    ptr_end = BIT_OFFSET + 8 + PTR_LEN * len(pointers_and_blobs)
    assert tail >= ptr_end, "page overflow"
    return bytes(pg)


def data_page(rows_bytes):
    """Type-0x100 page with rows packed from BIT_OFFSET + 8."""
    pg = bytearray(PAGE_LEN)
    pg[BIT_OFFSET:BIT_OFFSET + 2] = u16(0x0100)
    pg[BIT_OFFSET + 2:BIT_OFFSET + 4] = u16(len(rows_bytes))
    pg[BIT_OFFSET + 4:BIT_OFFSET + 6] = u16(0)
    pos = BIT_OFFSET + 8
    for r in rows_bytes:
        pg[pos:pos + len(r)] = r
        pos += len(r)
    assert pos <= PAGE_LEN
    return bytes(pg)


def encode_row(cols, row):
    out = bytearray()
    for (name, kind, width), v in zip(cols, row):
        if kind == "d":
            out += struct.pack("<d", float("nan") if v is None else v)
        else:
            b = (v or "").encode("utf-8")
            assert len(b) <= width, (name, v)
            out += b.ljust(width)
    return bytes(out)


def rle_encode(raw):
    """SASYZCRL encoding using the pandas-verified command subset:
    0x6 blank-run 17+, 0x7 zero-run 17+, 0xE blank 2-17, 0xF zero 2-17,
    0xC repeat-byte 3-18, 0x8/0x0 literal copies. pandas decoding these
    back bit-exactly IS the certification of the command semantics the
    Scala decoder mirrors."""
    out = bytearray()
    i, n = 0, len(raw)
    lit = bytearray()

    def flush():
        nonlocal lit
        j = 0
        while len(lit) - j >= 64:
            take = min(len(lit) - j, 4159)
            out.append(((take - 64) >> 8) & 0x0F)
            out.append((take - 64) & 0xFF)
            out += lit[j:j + take]
            j += take
        while len(lit) - j > 0:
            take = min(len(lit) - j, 16)
            out.append(0x80 | (take - 1))
            out += lit[j:j + take]
            j += take
        lit = bytearray()

    while i < n:
        b = raw[i]
        run = 1
        while i + run < n and raw[i + run] == b:
            run += 1
        if b in (0x20, 0x00) and run >= 2:
            flush()
            cmd_long = 0x60 if b == 0x20 else 0x70
            cmd_short = 0xE0 if b == 0x20 else 0xF0
            while run >= 17:
                take = min(run, 0x0F * 256 + 255 + 17)
                out.append(cmd_long | (((take - 17) >> 8) & 0x0F))
                out.append((take - 17) & 0xFF)
                run -= take
                i += take
            if run >= 2:
                out.append(cmd_short | (run - 2))
                i += run
                run = 0
            while run > 0:
                lit.append(b)
                i += 1
                run -= 1
        elif run >= 4:
            flush()
            while run >= 3:
                take = min(run, 18)
                out.append(0xC0 | (take - 3))
                out.append(b)
                run -= take
                i += take
            while run > 0:
                lit.append(b)
                i += 1
                run -= 1
        else:
            lit += raw[i:i + run]
            i += run
    flush()
    return bytes(out)


def build(path, cols, rows, compressed):
    row_len = sum(w for _, _, w in cols)
    subs = subheaders(cols, len(rows), row_len, compressed)
    pages = [page(0x0000, len(subs), subs)]  # meta page
    encoded = [encode_row(cols, r) for r in rows]
    if not compressed:
        per_page = (PAGE_LEN - BIT_OFFSET - 8) // row_len
        for i in range(0, len(encoded), per_page):
            pages.append(data_page(encoded[i:i + per_page]))
    else:
        # compressed rows ride as subheader blocks on meta pages,
        # pointer compression=4 type=1; an incompressible row is stored
        # RAW at exactly row_length (readers treat len==row_length as
        # uncompressed — SAS does the same)
        blocks = []
        for r in encoded:
            enc = rle_encode(r)
            blocks.append((enc if len(enc) < row_len else r, 4, 1))
        cur = []
        used = 0
        budget = PAGE_LEN - BIT_OFFSET - 8
        for blob in blocks:
            need = len(blob[0]) + PTR_LEN
            if cur and used + need > budget:
                pages.append(page(0x0000, len(cur), cur))
                cur, used = [], 0
            cur.append(blob)
            used += need
        if cur:
            pages.append(page(0x0000, len(cur), cur))
    with open(path, "wb") as f:
        f.write(header(len(pages)))
        for p in pages:
            f.write(p)


COLS = [("id", "d", 8), ("score", "d", 8), ("ratio", "d", 8),
        ("city", "s", 12), ("tag", "s", 20)]


def make_rows():
    rows = []
    cities = ["tokyo", "osaka", "", "lagos paris!", "x"]
    for i in range(150):
        score = None if i % 11 == 3 else round(
            math.sin(i) * 1000, 3)
        ratio = None if i % 17 == 5 else i / 7.0
        city = cities[i % len(cities)]
        # long space/zero-ish runs so RLE exercises blank/repeat cmds
        tag = ("" if i % 4 == 0 else
               ("aaaaaaaaaaaaaaaa" if i % 4 == 1 else
                ("ab" * ((i % 7) + 1))[:20]))
        rows.append((float(i), score, ratio, city, tag))
    return rows


def check(path, rows):
    df = pd.read_sas(path, format="sas7bdat", encoding="utf-8")
    assert list(df.columns) == [c[0] for c in COLS], list(df.columns)
    assert len(df) == len(rows), (len(df), len(rows))
    for i, r in enumerate(rows):
        got = df.iloc[i]
        for (name, kind, _), v in zip(COLS, r):
            g = got[name]
            if kind == "d":
                if v is None:
                    assert isinstance(g, float) and math.isnan(g), (i, name, g)
                else:
                    assert g == v, (i, name, g, v)
            else:
                assert g == v, (i, name, repr(g), repr(v))
    print(f"pandas cross-validation OK: {path} ({len(rows)} rows)")
    return df


def main():
    os.makedirs(OUT, exist_ok=True)
    rows = make_rows()
    plain = os.path.join(OUT, "mixed.sas7bdat")
    rle = os.path.join(OUT, "mixed_rle.sas7bdat")
    build(plain, COLS, rows, compressed=False)
    build(rle, COLS, rows, compressed=True)
    check(plain, rows)
    check(rle, rows)
    # parquet twin for the DuckDB oracle: same values, doubles + strings
    # (None for missing / sas NaN)
    import pyarrow as pa
    import pyarrow.parquet as pq
    twin = {
        name: [r[j] for r in rows]
        for j, (name, kind, _) in enumerate(COLS)
    }
    tbl = pa.table({
        "id": pa.array(twin["id"], pa.float64()),
        "score": pa.array(twin["score"], pa.float64()),
        "ratio": pa.array(twin["ratio"], pa.float64()),
        "city": pa.array(twin["city"], pa.string()),
        "tag": pa.array(twin["tag"], pa.string()),
    })
    pq.write_table(tbl, os.path.join(OUT, "mixed_sas_twin.parquet"))
    print("twin written")


if __name__ == "__main__":
    main()
