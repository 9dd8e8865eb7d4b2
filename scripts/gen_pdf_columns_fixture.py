#!/usr/bin/env python3
"""Generate committed PDF fixtures + twin for the q364 POSITIONED
PDF->text gate (graft.ops.PdfExtract.extractPositioned — Td/TD/Tm/TL/
T*/' cursor tracking + reading-order reassembly; verdict r12 #7).

Every document writes its text runs in a DELIBERATELY wrong stream
order (two-column pages interleave L1 R1 L2 R2 ...) with explicit
positioning operators, and the twin pins the expected READING order
from construction knowledge alone — the y/x coordinates this script
chose — never by parsing its own output. The stream-order extractor
(q354) would emit the interleaved order, so a positioned-path bug
cannot hide behind the old path.

Planted cases:
  doc_000  two-column page via Tm, interleaved stream order
  doc_001  TD sets leading, T* advances lines (single column)
  doc_002  paragraph INDENT (x gap 18 < columnGap 100): must NOT
           split into a second column
  doc_003  same-line segments: two runs same y different x join with
           one space; consecutive Tj at the SAME origin concatenate
  doc_004  two pages, each two-column, Flate-compressed streams
  doc_005  TL + ' (move-down-and-show) line advance

  python3 scripts/gen_pdf_columns_fixture.py

Outputs: src/test/resources/graft/sources/pdfs_columns/doc_NNN.pdf
         src/test/resources/graft/sources/pdf_columns_twin.parquet
"""
import os
import zlib

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
PDF_DIR = os.path.join(OUT, "pdfs_columns")


def lit(s):
    out = s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    return "(" + out + ")"


def build_pdf(page_contents, compress):
    """page_contents: list of raw content-stream strings."""
    objs = []
    n_pages = len(page_contents)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append((1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    objs.append((2, (f"<< /Type /Pages /Kids [{kids}] "
                     f"/Count {n_pages} >>").encode()))
    for i, content in enumerate(page_contents):
        page_num = 3 + 2 * i
        cont_num = page_num + 1
        objs.append((page_num, (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {cont_num} 0 R /Resources << /Font << /F1 "
            f"999 0 R >> >> >>").encode()))
        data = content.encode("latin-1")
        if compress:
            z = zlib.compress(data)
            body = (f"<< /Length {len(z)} /Filter /FlateDecode >>\n"
                    .encode() + b"stream\n" + z + b"\nendstream")
        else:
            body = (f"<< /Length {len(data)} >>\n".encode()
                    + b"stream\n" + data + b"\nendstream")
        objs.append((cont_num, body))
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num, body in objs:
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    maxnum = max(offsets)
    out += f"xref\n0 {maxnum + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, maxnum + 1):
        out += f"{offsets.get(num, 0):010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {maxnum + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


def at(x, y, s):
    return f"1 0 0 1 {x} {y} Tm {lit(s)} Tj"


def two_col_page(left, right, lx=72, rx=320, y0=720, dy=14):
    """INTERLEAVED stream order; reading order is left col then right."""
    ops = ["BT", "/F1 12 Tf"]
    for i in range(max(len(left), len(right))):
        if i < len(left):
            ops.append(at(lx, y0 - dy * i, left[i]))
        if i < len(right):
            ops.append(at(rx, y0 - dy * i, right[i]))
    ops.append("ET")
    return "\n".join(ops), left + right


DOCS = {}

# doc_000: two-column, interleaved via Tm
c0, order0 = two_col_page(
    ["left column first line", "left second", "left third"],
    ["right column begins", "right second", "right third"])
DOCS[0] = ([c0], "\n".join(order0), False)

# doc_001: TD sets leading, T* advances
c1 = "\n".join(["BT", "/F1 12 Tf", "72 720 Td", lit("head line") + " Tj",
                "0 -16 TD", lit("after TD") + " Tj",
                "T*", lit("after first Tstar") + " Tj",
                "T*", lit("after second Tstar") + " Tj", "ET"])
DOCS[1] = ([c1], "head line\nafter TD\nafter first Tstar\n"
           "after second Tstar", False)

# doc_002: indent (x 72 -> 90, gap 18 < 100) stays ONE column
c2 = "\n".join(["BT", "/F1 12 Tf",
                at(72, 720, "paragraph opens here"),
                at(90, 706, "indented continuation"),
                at(72, 692, "back to margin"), "ET"])
DOCS[2] = ([c2], "paragraph opens here\nindented continuation\n"
           "back to margin", False)

# doc_003: same-line join rules — space when x differs, concat at the
# exact same origin (two consecutive Tj, no movement between)
c3 = "\n".join(["BT", "/F1 12 Tf",
                at(72, 720, "segA"), at(85, 720, "segB"),
                "1 0 0 1 72 700 Tm", lit("AB") + " Tj",
                lit("CD") + " Tj", "ET"])
DOCS[3] = ([c3], "segA segB\nABCD", False)

# doc_004: two pages, each two-column, compressed
c4a, order4a = two_col_page(["p1 left a", "p1 left b"],
                            ["p1 right a", "p1 right b"])
c4b, order4b = two_col_page(["p2 left only"], ["p2 right only"])
DOCS[4] = ([c4a, c4b],
           "\n".join(order4a) + "\n" + "\n".join(order4b), True)

# doc_005: TL + ' (move down one leading and show)
c5 = "\n".join(["BT", "/F1 12 Tf", "14 TL", "1 0 0 1 72 720 Tm",
                lit("quote one") + " Tj",
                lit("quote two") + " '",
                lit("quote three") + " '", "ET"])
DOCS[5] = ([c5], "quote one\nquote two\nquote three", False)


def main():
    os.makedirs(PDF_DIR, exist_ok=True)
    for old in os.listdir(PDF_DIR):
        os.remove(os.path.join(PDF_DIR, old))
    rows = []
    for did, (pages, expected, compress) in sorted(DOCS.items()):
        pdf = build_pdf(pages, compress)
        with open(os.path.join(PDF_DIR, f"doc_{did:03d}.pdf"), "wb") as f:
            f.write(pdf)
        rows.append((did, expected, len(pages)))
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "n_pages": pa.array([r[2] for r in rows], pa.int32()),
    }), os.path.join(OUT, "pdf_columns_twin.parquet"))
    print(f"wrote {len(rows)} positioned PDFs + twin")


if __name__ == "__main__":
    main()
