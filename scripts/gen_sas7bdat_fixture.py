#!/usr/bin/env python3
"""Generate committed sas7bdat fixtures for the graft-sas7bdat source.

A from-scratch sas7bdat ENCODER (little-endian, 32-bit AND 64-bit
layouts; one meta/mix page + data pages; optional SASYZCRL run-length
compression), assembled per the publicly documented reverse-engineered
layout (the sas7bdat format is described by the parso and ReadStat
projects and by the "SAS7BDAT Database Binary Format" technical note;
pandas carries an independent reader). pandas.read_sas is the GROUND
TRUTH here: the script fails unless pandas reads back every fixture
cell exactly, so the committed fixtures are certified by the
reference's own reader — the same recipe that validated the .dta/.xpt
fixtures in round 10.

  python3 scripts/gen_sas7bdat_fixture.py

Outputs under src/test/resources/graft/sources/:
  mixed.sas7bdat       32-bit LE, uncompressed, meta page + 3 data pages
  mixed_rle.sas7bdat   32-bit LE, SASYZCRL rows as subheader blocks
                       (char runs exercise blank/zero/repeat commands;
                       incompressible rows stored raw at row_length)
  mixed_u64.sas7bdat   64-bit LE, MIX page (subheaders + first rows
                       co-located, pandas' align-correction rule) +
                       data pages
  mixed_sas_twin.parquet  the oracle twin (same values; SAS blank char
                       and numeric NaN are SQL nulls)
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
PAGE_LEN = 4096

SIGS = {
    # 32-bit signature and its 64-bit little-endian padding byte
    "rowsize": (b"\xF7\xF7\xF7\xF7", b"\x00"),
    "colsize": (b"\xF6\xF6\xF6\xF6", b"\x00"),
    "coltext": (b"\xFD\xFF\xFF\xFF", b"\xFF"),
    "colname": (b"\xFF\xFF\xFF\xFF", b"\xFF"),
    "colattr": (b"\xFC\xFF\xFF\xFF", b"\xFF"),
    "fmtlbl":  (b"\xFE\xFB\xFF\xFF", b"\xFF"),
}


def u16(v):
    return struct.pack("<H", v)


def u32(v):
    return struct.pack("<I", v)


class Layout:
    def __init__(self, u64):
        self.u64 = u64
        self.int_len = 8 if u64 else 4
        self.bit_off = 32 if u64 else 16
        self.ptr_len = 24 if u64 else 12

    def sig(self, name):
        s, pad = SIGS[name]
        return s + pad * 4 if self.u64 else s

    def uint(self, v):
        return struct.pack("<Q", v) if self.u64 else u32(v)


def header(lay, page_count, name=b"MIXED"):
    h = bytearray(HEADER_LEN)
    h[0:32] = MAGIC
    h[32] = 0x33 if lay.u64 else 0x22   # 0x33 -> 64-bit file
    h[35] = 0x22                        # no align1: header offsets plain
    h[37] = 0x01                        # little-endian
    h[39] = ord("1")                    # unix
    h[70] = 20                          # utf-8
    h[92:92 + len(name)] = name
    h[156:156 + 8] = b"DATA    "
    h[164:172] = struct.pack("<d", 2.0e9)   # created (s since 1960)
    h[172:180] = struct.pack("<d", 2.0e9)   # modified
    h[196:200] = u32(HEADER_LEN)
    h[200:204] = u32(PAGE_LEN)
    # page count: documented as 4 bytes; the 64-bit layout reads
    # int_len — little-endian with the high half zero satisfies both
    h[204:204 + lay.int_len] = lay.uint(page_count)
    h[216:224] = b"9.0401M2"
    h[224:240] = b"Linux".ljust(16)
    return bytes(h)


def subheaders(lay, cols, n_rows, row_len, mix_rows, compressed,
               formats=None):
    """Metadata subheader blobs in processing order.
    cols: list of (name, kind 'd'|'s', width); formats: optional
    per-column SAS display-format names (e.g. DATE, DATETIME) written
    into the text blob and referenced from the format subheaders."""
    ncols = len(cols)
    formats = formats or [""] * ncols
    il = lay.int_len

    rowsize = bytearray(808 if lay.u64 else 480)
    rowsize[0:il] = lay.sig("rowsize")
    rowsize[5 * il:6 * il] = lay.uint(row_len)
    rowsize[6 * il:7 * il] = lay.uint(n_rows)
    rowsize[9 * il:10 * il] = lay.uint(ncols)       # col_count_p1
    rowsize[10 * il:11 * il] = lay.uint(0)          # col_count_p2
    rowsize[15 * il:16 * il] = lay.uint(mix_rows)   # rows on mix page
    # lcs (354/682) / lcp (378/706) stay 0: no creator-proc text

    colsize = bytearray(4 * il)
    colsize[0:il] = lay.sig("colsize")
    colsize[il:2 * il] = lay.uint(ncols)

    # column text blob: [u16 size][pad to 8][optional SASYZCRL][names];
    # name offsets are relative to the blob START (the size field
    # included — readers slice column_names_raw from subhdr+int_len)
    text = bytearray()
    text += b"\x00\x00"
    text += b"\x00" * 6
    if compressed:
        text += b"SASYZCRL"
    name_refs = []
    for name, _, _ in cols:
        nb = name.encode("utf-8")
        name_refs.append((len(text), len(nb)))
        text += nb
        if len(text) % 4:
            text += b"\x00" * (4 - len(text) % 4)
    fmt_refs = []
    for f in formats:
        fb = f.encode("utf-8")
        fmt_refs.append((len(text), len(fb)))
        text += fb
        if len(text) % 4:
            text += b"\x00" * (4 - len(text) % 4)
    text[0:2] = u16(len(text))
    coltext = bytearray(il + len(text))
    coltext[0:il] = lay.sig("coltext")
    coltext[il:] = text

    colname = bytearray(2 * il + 12 + 8 * ncols)
    colname[0:il] = lay.sig("colname")
    for i, (off, ln) in enumerate(name_refs):
        base = il + 8 * (i + 1)
        colname[base:base + 2] = u16(0)     # text subheader index
        colname[base + 2:base + 4] = u16(off)
        colname[base + 4:base + 6] = u16(ln)

    colattr = bytearray(2 * il + 12 + (il + 8) * ncols)
    colattr[0:il] = lay.sig("colattr")
    off = 0
    for i, (_, kind, width) in enumerate(cols):
        stride = (il + 8) * i
        colattr[il + 8 + stride:il + 8 + stride + il] = lay.uint(off)
        colattr[2 * il + 8 + stride:2 * il + 12 + stride] = u32(width)
        colattr[2 * il + 14 + stride] = 1 if kind == "d" else 2
        off += width
    assert off == row_len

    out = [(bytes(rowsize), 0, 0), (bytes(colsize), 0, 0),
           (bytes(coltext), 0, 0), (bytes(colname), 0, 0),
           (bytes(colattr), 0, 0)]
    for i in range(ncols):
        fmt = bytearray(3 * il + 40)
        fmt[0:il] = lay.sig("fmtlbl")
        # format text ref at 3*int_len + 22/24/26 (idx, offset, length);
        # label ref (28/30/32) stays zero. A zero-length ref means no
        # format -> no datetime coercion.
        off, ln = fmt_refs[i]
        if ln:
            fmt[3 * il + 22:3 * il + 24] = u16(0)
            fmt[3 * il + 24:3 * il + 26] = u16(off)
            fmt[3 * il + 26:3 * il + 28] = u16(ln)
        out.append((bytes(fmt), 0, 0))
    return out


def page(lay, ptype, blocks, pointers_and_blobs, rows=()):
    """One page: [bit_off pad][u16 type][u16 block_count][u16 n_subs]
    [2 pad][pointers][mix rows at the align-corrected offset][subheader
    blobs packed from the page END downward]."""
    pg = bytearray(PAGE_LEN)
    pg[lay.bit_off:lay.bit_off + 2] = u16(ptype)
    pg[lay.bit_off + 2:lay.bit_off + 4] = u16(blocks)
    pg[lay.bit_off + 4:lay.bit_off + 6] = u16(len(pointers_and_blobs))
    tail = PAGE_LEN
    for i, (blob, comp, typ) in enumerate(pointers_and_blobs):
        tail -= len(blob)
        pg[tail:tail + len(blob)] = blob
        base = lay.bit_off + 8 + lay.ptr_len * i
        pg[base:base + lay.int_len] = lay.uint(tail)
        pg[base + lay.int_len:base + 2 * lay.int_len] = lay.uint(len(blob))
        pg[base + 2 * lay.int_len] = comp
        pg[base + 2 * lay.int_len + 1] = typ
    pos = lay.bit_off + 8 + lay.ptr_len * len(pointers_and_blobs)
    pos += pos % 8   # pandas' mix-page align-correction rule, verbatim
    for r in rows:
        pg[pos:pos + len(r)] = r
        pos += len(r)
    assert pos <= tail, "page overflow"
    return bytes(pg)


def data_page(lay, rows_bytes):
    """Type-0x100 page with rows packed from bit_off + 8 (no align)."""
    pg = bytearray(PAGE_LEN)
    pg[lay.bit_off:lay.bit_off + 2] = u16(0x0100)
    pg[lay.bit_off + 2:lay.bit_off + 4] = u16(len(rows_bytes))
    pg[lay.bit_off + 4:lay.bit_off + 6] = u16(0)
    pos = lay.bit_off + 8
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
    0xC repeat-byte 3-18, 0x8 literal 1-16, 0x0 literal 64-4159.
    pandas decoding these back bit-exactly IS the certification of the
    command semantics the Scala decoder mirrors."""
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
            out.extend(lit[j:j + take])
            j += take
        while len(lit) - j > 0:
            take = min(len(lit) - j, 16)
            out.append(0x80 | (take - 1))
            out.extend(lit[j:j + take])
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


def build(path, cols, rows, compressed=False, u64=False, mix_rows=0,
          formats=None):
    lay = Layout(u64)
    row_len = sum(w for _, _, w in cols)
    encoded = [encode_row(cols, r) for r in rows]
    subs = subheaders(lay, cols, len(rows), row_len, mix_rows, compressed,
                      formats)
    pages = []
    rest = encoded
    if mix_rows > 0:
        assert not compressed
        head, rest = encoded[:mix_rows], encoded[mix_rows:]
        pages.append(page(lay, 0x0200, len(subs) + len(head), subs, head))
    else:
        pages.append(page(lay, 0x0000, len(subs), subs))
    if not compressed:
        per_page = (PAGE_LEN - lay.bit_off - 8) // row_len
        for i in range(0, len(rest), per_page):
            pages.append(data_page(lay, rest[i:i + per_page]))
    else:
        # compressed rows ride as subheader blocks on meta pages,
        # pointer compression=4 type=1; an incompressible row is stored
        # RAW at exactly row_length (readers treat len==row_length as
        # uncompressed — SAS does the same)
        blocks = []
        for r in rest:
            enc = rle_encode(r)
            blocks.append((enc if len(enc) < row_len else r, 4, 1))
        cur, used = [], 0
        budget = PAGE_LEN - lay.bit_off - 8
        for blob in blocks:
            need = len(blob[0]) + lay.ptr_len
            if cur and used + need > budget:
                pages.append(page(lay, 0x0000, len(cur), cur))
                cur, used = [], 0
            cur.append(blob)
            used += need
        if cur:
            pages.append(page(lay, 0x0000, len(cur), cur))
    with open(path, "wb") as f:
        f.write(header(lay, len(pages)))
        for p in pages:
            f.write(p)


COLS = [("id", "d", 8), ("score", "d", 8), ("ratio", "d", 8),
        ("city", "s", 12), ("tag", "s", 20)]


def make_rows():
    rows = []
    cities = ["tokyo", "osaka", "", "lagos paris!", "x"]
    for i in range(150):
        score = None if i % 11 == 3 else round(math.sin(i) * 1000, 3)
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
            elif v == "" or v is None:
                # SAS char semantics: all-blank IS missing (pandas nan)
                assert isinstance(g, float) and math.isnan(g), (i, name, g)
            else:
                assert g == v, (i, name, repr(g), repr(v))
    print(f"pandas cross-validation OK: {os.path.basename(path)} "
          f"({len(rows)} rows)")


DATE_COLS = [("k", "d", 8), ("event_date", "d", 8),
             ("when_ts", "d", 8), ("note", "s", 8)]
DATE_FORMATS = ["", "DATE", "DATETIME", ""]


def make_date_rows():
    """SAS calendar values: dates as days since 1960-01-01, datetimes
    as (fractional) seconds since 1960-01-01 00:00:00."""
    rows = []
    for i in range(40):
        days = None if i % 13 == 7 else float(20000 + i * 37)  # ~2014+
        secs = None if i % 9 == 4 else (1.9e9 + i * 86471.0 + i * 0.25)
        rows.append((float(i), days, secs, f"n{i}"))
    return rows


def check_dates(path, rows):
    df = pd.read_sas(path, format="sas7bdat", encoding="utf-8")
    epoch = pd.Timestamp("1960-01-01")
    assert str(df["event_date"].dtype).startswith("datetime64"), \
        df["event_date"].dtype
    assert str(df["when_ts"].dtype).startswith("datetime64"), \
        df["when_ts"].dtype
    for i, (_, days, secs, _) in enumerate(rows):
        gd, gt = df["event_date"].iloc[i], df["when_ts"].iloc[i]
        if days is None:
            assert pd.isna(gd), (i, gd)
        else:
            assert gd == epoch + pd.Timedelta(days=days), (i, gd)
        if secs is None:
            assert pd.isna(gt), (i, gt)
        else:
            # pandas converts SAS datetimes through MILLISECONDS
            # (cast_from_unit out_unit="ms"); compare at that grain
            assert gt == epoch + pd.Timedelta(
                milliseconds=round(secs * 1000)), (i, gt)
    print(f"pandas cross-validation OK: {os.path.basename(path)} "
          f"(dates/datetimes, {len(rows)} rows)")


def main():
    os.makedirs(OUT, exist_ok=True)
    rows = make_rows()
    plain = os.path.join(OUT, "mixed.sas7bdat")
    rle = os.path.join(OUT, "mixed_rle.sas7bdat")
    u64 = os.path.join(OUT, "mixed_u64.sas7bdat")
    build(plain, COLS, rows)
    build(rle, COLS, rows, compressed=True)
    build(u64, COLS, rows, u64=True, mix_rows=20)
    check(plain, rows)
    check(rle, rows)
    check(u64, rows)
    dates = os.path.join(OUT, "dates.sas7bdat")
    drows = make_date_rows()
    build(dates, DATE_COLS, drows, formats=DATE_FORMATS)
    check_dates(dates, drows)
    # parquet twin for the DuckDB oracle: same values, doubles + strings
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
        # all-blank char IS missing (the SAS semantic; pandas nan)
        "city": pa.array([v or None for v in twin["city"]], pa.string()),
        "tag": pa.array([v or None for v in twin["tag"]], pa.string()),
    })
    pq.write_table(tbl, os.path.join(OUT, "mixed_sas_twin.parquet"))
    # dates twin: date32 + timestamp[us] on the 1970 epoch
    import datetime as dt
    ep = dt.date(1960, 1, 1)
    ept = dt.datetime(1960, 1, 1)
    dtbl = pa.table({
        "k": pa.array([r[0] for r in drows], pa.float64()),
        "event_date": pa.array(
            [None if r[1] is None else ep + dt.timedelta(days=r[1])
             for r in drows], pa.date32()),
        "when_ts": pa.array(
            [None if r[2] is None else
             ept + dt.timedelta(microseconds=round(r[2] * 1e6))
             for r in drows], pa.timestamp("us")),
        "note": pa.array([r[3] for r in drows], pa.string()),
    })
    pq.write_table(dtbl, os.path.join(OUT, "dates_sas_twin.parquet"))
    print("twins written")


if __name__ == "__main__":
    main()
