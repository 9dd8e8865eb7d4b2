#!/usr/bin/env python3
"""Hand-assemble a SAS Transport (XPORT v5, TS-140) fixture + parquet twin.

The XPORT v5 layout is publicly documented (SAS Technical Note TS-140):
80-byte records; ASCII library/member/namestr/obs header records; one
140-byte NAMESTR per variable; observation rows packed back-to-back
(numerics as 8-byte IBM System/360 doubles, chars space-padded), the
data section space-padded to an 80-byte boundary. Numeric missing is
'.' (0x2E) followed by zeros.

pandas.read_sas(format='xport') validates the fixture independently
(same trust chain as the hand-assembled dta-118 fixture).
"""
import os
import struct

import numpy as np
import pandas as pd

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "sources")


def ibm_double(x: float) -> bytes:
    """IEEE double -> 8-byte big-endian IBM S/360 double (TS-140 app. A)."""
    if x == 0.0:
        return b"\x00" * 8
    sign = 0
    if x < 0:
        sign = 0x80
        x = -x
    # x = m * 16^e with m in [1/16, 1)
    import math
    e = math.floor(math.log(x, 16)) + 1
    m = x / (16.0 ** e)
    while m >= 1.0:
        e += 1
        m = x / (16.0 ** e)
    while m < 1.0 / 16.0:
        e -= 1
        m = x / (16.0 ** e)
    frac = int(round(m * (1 << 56)))
    if frac >= (1 << 56):
        frac >>= 4
        e += 1
    b0 = sign | (e + 64)
    return bytes([b0]) + frac.to_bytes(7, "big")


def rec(s: str) -> bytes:
    assert len(s) <= 80, len(s)
    return s.ljust(80).encode("ascii")


def namestr(ntype: int, length: int, varnum: int, name: str,
            npos: int) -> bytes:
    # 140-byte NAMESTR (TS-140): short ntype, nhfun, nlng, nvar0;
    # char name[8], label[40]; char nform[8]; short nfl, nfd, nfj;
    # char nfill[2]; char niform[8]; short nifl, nifd; long npos;
    # char rest[52]
    return struct.pack(
        ">hhhh8s40s8shhh2s8shhl52s",
        ntype, 0, length, varnum,
        name.ljust(8).encode(), b" " * 40, b" " * 8, 0, 0, 0, b"  ",
        b" " * 8, 0, 0, npos, b" " * 52)


def build(path):
    recs = []
    recs.append(rec("HEADER RECORD*******LIBRARY HEADER RECORD!!!!!!!"
                    "000000000000000000000000000000  "))
    recs.append(rec("SAS     SAS     SASLIB  6.06    bsd4.2          "
                    "        01JAN26:00:00:00"))
    recs.append(rec("01JAN26:00:00:00"))
    recs.append(rec("HEADER RECORD*******MEMBER  HEADER RECORD!!!!!!!"
                    "000000000000000001600000000140  "))
    recs.append(rec("HEADER RECORD*******DSCRPTR HEADER RECORD!!!!!!!"
                    "000000000000000000000000000000  "))
    recs.append(rec("SAS     MIXED   SASDATA 6.06    bsd4.2          "
                    "        01JAN26:00:00:00"))
    recs.append(rec("01JAN26:00:00:00" + " " * 16 + "mixed fixture"))
    recs.append(rec("HEADER RECORD*******NAMESTR HEADER RECORD!!!!!!!"
                    "000000000300000000000000000000  "))
    # 3 variables: id numeric(8), score numeric(8), city char(10)
    ns = (namestr(1, 8, 1, "ID", 0)
          + namestr(1, 8, 2, "SCORE", 8)
          + namestr(2, 10, 3, "CITY", 16))
    # namestr block padded to 80-byte boundary
    ns += b" " * ((80 - len(ns) % 80) % 80)
    recs.append(ns)
    recs.append(rec("HEADER RECORD*******OBS     HEADER RECORD!!!!!!!"
                    "000000000000000000000000000000  "))
    # NOTE: the last row's char field is full-width on purpose - pandas'
    # tail-padding heuristic counts trailing blank 8-byte words of the
    # LAST 80-byte card as padding, which would otherwise eat a final
    # row whose char field ends in spaces (xport's inherent ambiguity).
    # (the all-space CITY row also sits EARLY for the same reason)
    rows = [
        (1.0, 3.25, "Paris"),
        (2.0, 1e10, ""),
        (3.0, None, "Osaka"),  # missing numeric
        (4.0, -17.5, "Lagos"),
        (5.0, 0.1, "QuitoEcuad"),
    ]
    data = b""
    for (i, sc, city) in rows:
        data += ibm_double(i)
        data += (b"." + b"\x00" * 7) if sc is None else ibm_double(sc)
        data += city.ljust(10).encode("ascii")
    data += b" " * ((80 - len(data) % 80) % 80)
    recs.append(data)
    with open(path, "wb") as f:
        f.write(b"".join(recs))
    twin = pd.DataFrame({
        "ID": [1.0, 2.0, 3.0, 4.0, 5.0],
        "SCORE": pd.array([3.25, 1e10, None, -17.5, 0.1], dtype="Float64"),
        "CITY": ["Paris", "", "Osaka", "Lagos", "QuitoEcuad"],
    })
    twin.to_parquet(os.path.join(OUT, "mixed_twin.parquet"), index=False)


p = os.path.join(OUT, "mixed.xpt")
build(p)
df = pd.read_sas(p, format="xport", encoding="ascii")
print(df)
assert list(df.columns) == ["ID", "SCORE", "CITY"]
assert df.ID.tolist() == [1.0, 2.0, 3.0, 4.0, 5.0]
assert df.SCORE[0] == 3.25 and pd.isna(df.SCORE[2])
assert df.SCORE[3] == -17.5 and df.SCORE[1] == 1e10 and df.SCORE[4] == 0.1
assert df.CITY.str.strip().tolist() == ["Paris", "", "Osaka", "Lagos",
                                        "QuitoEcuad"]
print("xpt fixture validated by pandas")
