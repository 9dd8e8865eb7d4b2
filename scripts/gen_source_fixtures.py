#!/usr/bin/env python3
"""Generate the static test fixtures for the graft Stata/Excel sources.

Run once (driver-side python has pandas/pyarrow; the Scala library must
read these formats natively, so the fixtures are pre-generated and
committed). Each fixture comes with a parquet TWIN holding the same
values — the DuckDB oracle reads the twin, the Spark query reads the
foreign format, and the driver hash-compares the two.

  python3 scripts/gen_source_fixtures.py

Outputs under src/test/resources/graft/sources/:
  people.dta / people_twin.parquet     pandas-written Stata v118
  types_missing.dta / types_missing_twin.parquet
                                       hand-assembled v118 covering every
                                       numeric type's MISSING encoding
                                       (pandas cannot write int-typed
                                       missings; the spec ranges are
                                       byte>0x64, int>0x7fe4,
                                       long>0x7fffffe4, float>=0x7f000000,
                                       double>=0x7fe0000000000000)
  sample.xlsx / sample_twin.parquet    hand-zipped minimal xlsx mixing
                                       sharedStrings, inlineStr, numeric
                                       and EMPTY cells
"""
import io
import os
import struct
import zipfile

import numpy as np
import pandas as pd

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "sources")
os.makedirs(OUT, exist_ok=True)


def p(name):
    return os.path.join(OUT, name)


# ---- 1. pandas-written v118 with the common type spread --------------
people = pd.DataFrame({
    "pid": np.arange(1, 26, dtype=np.int32),
    "age": (np.arange(1, 26) * 3 % 80 + 18).astype(np.int16),
    "grp": (np.arange(1, 26) % 5).astype(np.int8),
    "score": np.round(np.linspace(0.5, 99.5, 25), 2).astype(np.float64),
    "ratio": np.round(np.linspace(0.01, 0.99, 25), 3).astype(np.float32),
    "name": [f"person_{i:02d}" for i in range(1, 26)],
})
# float/double missings (int missings need the hand-built fixture)
people.loc[3, "score"] = np.nan
people.loc[7, "ratio"] = np.nan
people.to_stata(p("people.dta"), write_index=False, version=118)
people.to_parquet(p("people_twin.parquet"), index=False)


# ---- 2. hand-assembled v118: every numeric type's missing code -------
def dta118(varlist, rows):
    """varlist: [(name, stata_type_code)]; rows: list of per-var cell
    writers (already-encoded bytes). Writes a REAL <map> (14 u64 file
    offsets) — pandas' reader seeks through it."""
    K, N = len(varlist), len(rows)
    out = io.BytesIO()
    marks = {}

    def w(s):
        out.write(s if isinstance(s, bytes) else s.encode())

    def mark(name):
        marks[name] = out.tell()

    mark("stata_data")
    w("<stata_dta>")
    w("<header>")
    w("<release>118</release><byteorder>LSF</byteorder>")
    w("<K>"); out.write(struct.pack("<H", K)); w("</K>")
    w("<N>"); out.write(struct.pack("<Q", N)); w("</N>")
    w("<label>"); out.write(struct.pack("<H", 0)); w("</label>")
    ts = "01 Jan 2026 00:00"
    w("<timestamp>"); out.write(struct.pack("<B", len(ts)))
    w(ts); w("</timestamp>")
    w("</header>")
    mark("map")
    w("<map>")
    map_pos = out.tell()
    out.write(struct.pack("<14Q", *([0] * 14)))  # patched below
    w("</map>")
    mark("variable_types")
    w("<variable_types>")
    for _, t in varlist:
        out.write(struct.pack("<H", t))
    w("</variable_types>")
    mark("varnames")
    w("<varnames>")
    for n, _ in varlist:
        out.write(n.encode().ljust(129, b"\0"))
    w("</varnames>")
    mark("sortlist")
    w("<sortlist>")
    out.write(struct.pack(f"<{K + 1}H", *([0] * (K + 1))))
    w("</sortlist>")
    mark("formats")
    w("<formats>")
    for _ in varlist:
        out.write(b"\0" * 57)
    w("</formats>")
    mark("value_label_names")
    w("<value_label_names>")
    for _ in varlist:
        out.write(b"\0" * 129)
    w("</value_label_names>")
    mark("variable_labels")
    w("<variable_labels>")
    for _ in varlist:
        out.write(b"\0" * 321)
    w("</variable_labels>")
    mark("characteristics")
    w("<characteristics></characteristics>")
    mark("data")
    w("<data>")
    for r in rows:
        for cell in r:
            out.write(cell)
    w("</data>")
    mark("strls")
    w("<strls></strls>")
    mark("value_labels")
    w("<value_labels></value_labels>")
    mark("stata_data_close")
    w("</stata_dta>")
    mark("end-of-file")
    order = ["stata_data", "map", "variable_types", "varnames",
             "sortlist", "formats", "value_label_names",
             "variable_labels", "characteristics", "data", "strls",
             "value_labels", "stata_data_close", "end-of-file"]
    buf = bytearray(out.getvalue())
    buf[map_pos:map_pos + 112] = struct.pack(
        "<14Q", *[marks[k] for k in order])
    return bytes(buf)


def sb(v):   # stata byte
    return struct.pack("<b", v)
def si(v):   # int16
    return struct.pack("<h", v)
def sl(v):   # int32
    return struct.pack("<i", v)
def sf(v):   # float
    return struct.pack("<f", v)
def sd(v):   # double
    return struct.pack("<d", v)
def ss(v, width):  # str#
    return v.encode().ljust(width, b"\0")


VARS = [("b", 65530), ("i", 65529), ("l", 65528),
        ("f", 65527), ("d", 65526), ("s", 8)]
ROWS = [
    [sb(1), si(100), sl(100000), sf(1.5), sd(2.25), ss("alpha", 8)],
    # one missing per numeric type: the reserved "." codes
    [sb(0x65), si(0x7fe5), sl(0x7fffffe5),
     struct.pack("<I", 0x7f000000), struct.pack("<Q", 0x7fe0000000000000),
     ss("", 8)],
    [sb(-5), si(-300), sl(-70000), sf(-0.25), sd(1e10), ss("gamma", 8)],
]
with open(p("types_missing.dta"), "wb") as f:
    f.write(dta118(VARS, ROWS))
twin = pd.DataFrame({
    "b": pd.array([1, None, -5], dtype="Int8"),
    "i": pd.array([100, None, -300], dtype="Int16"),
    "l": pd.array([100000, None, -70000], dtype="Int32"),
    "f": pd.array([1.5, None, -0.25], dtype="Float32"),
    "d": pd.array([2.25, None, 1e10], dtype="Float64"),
    "s": ["alpha", "", "gamma"],
})
twin.to_parquet(p("types_missing_twin.parquet"), index=False)


# ---- 3. minimal hand-zipped xlsx --------------------------------------
def cell(ref, t, v):
    if v is None:
        return f'<c r="{ref}"/>'
    if t == "s":
        return f'<c r="{ref}" t="s"><v>{v}</v></c>'
    if t == "inline":
        return f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>'
    return f'<c r="{ref}"><v>{v}</v></c>'  # numeric


shared = ["city", "pop", "note", "Paris", "Osaka"]
rows_xml = [
    # header row: shared strings + one inline
    f'<row r="1">{cell("A1", "s", 0)}{cell("B1", "s", 1)}'
    f'{cell("C1", "inline", "note")}</row>',
    f'<row r="2">{cell("A2", "s", 3)}{cell("B2", "n", 2161000)}'
    f'{cell("C2", "inline", "capital")}</row>',
    # sparse row: B3 empty-missing entirely, C3 empty tag
    f'<row r="3">{cell("A3", "s", 4)}{cell("C3", None, None)}</row>',
    f'<row r="4">{cell("A4", "inline", "Lagos")}'
    f'{cell("B4", "n", 14862000)}{cell("C4", "inline", "coastal")}</row>',
]
sheet = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
         '<worksheet xmlns="http://schemas.openxmlformats.org/'
         'spreadsheetml/2006/main"><sheetData>'
         + "".join(rows_xml) + "</sheetData></worksheet>")
sst = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
       '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
       f'2006/main" count="{len(shared)}" uniqueCount="{len(shared)}">'
       + "".join(f"<si><t>{s}</t></si>" for s in shared) + "</sst>")
wb = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
      '<workbook xmlns="http://schemas.openxmlformats.org/'
      'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats'
      '.org/officeDocument/2006/relationships"><sheets>'
      '<sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>')
wbrels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<Relationships xmlns="http://schemas.openxmlformats.org/'
          'package/2006/relationships">'
          '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
          '.org/officeDocument/2006/relationships/worksheet" '
          'Target="worksheets/sheet1.xml"/>'
          '<Relationship Id="rId2" Type="http://schemas.openxmlformats'
          '.org/officeDocument/2006/relationships/sharedStrings" '
          'Target="sharedStrings.xml"/></Relationships>')
rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships"><Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships/officeDocument" Target="xl/workbook.xml"/>'
        '</Relationships>')
ctypes = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<Types xmlns="http://schemas.openxmlformats.org/package/'
          '2006/content-types">'
          '<Default Extension="rels" ContentType="application/vnd.'
          'openxmlformats-package.relationships+xml"/>'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Override PartName="/xl/workbook.xml" ContentType="application'
          '/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main'
          '+xml"/><Override PartName="/xl/worksheets/sheet1.xml" '
          'ContentType="application/vnd.openxmlformats-officedocument.'
          'spreadsheetml.worksheet+xml"/>'
          '<Override PartName="/xl/sharedStrings.xml" ContentType='
          '"application/vnd.openxmlformats-officedocument.spreadsheetml'
          '.sharedStrings+xml"/></Types>')
with zipfile.ZipFile(p("sample.xlsx"), "w", zipfile.ZIP_DEFLATED) as z:
    z.writestr("[Content_Types].xml", ctypes)
    z.writestr("_rels/.rels", rels)
    z.writestr("xl/workbook.xml", wb)
    z.writestr("xl/_rels/workbook.xml.rels", wbrels)
    z.writestr("xl/sharedStrings.xml", sst)
    z.writestr("xl/worksheets/sheet1.xml", sheet)
xtwin = pd.DataFrame({
    "city": ["Paris", "Osaka", "Lagos"],
    "pop": ["2161000", None, "14862000"],
    "note": ["capital", None, "coastal"],
})
xtwin.to_parquet(p("sample_twin.parquet"), index=False)

print("fixtures written to", OUT)
