#!/usr/bin/env python3
"""Generate committed PDF fixtures + twin for the q354 PDF->text gate
(graft.ops.PdfExtract).

Each fixture is CONSTRUCTED here from a list of page line-lists per
the public PDF 32000-1 layout (stdlib struct/zlib only — no code
shared with the Scala parser), and the twin is those lines verbatim:
the generator never parses its own output, so a Scala parsing bug on
any planted feature (Flate streams, literal-string escapes incl.
octal and nested parens, hex strings with whitespace, TJ kerning
arrays, ', multi-page structure) breaks the match.

  python3 scripts/gen_pdf_fixture.py

Outputs: src/test/resources/graft/sources/pdfs/doc_NNN.pdf
         src/test/resources/graft/sources/pdf_twin.parquet
"""
import os
import zlib

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
PDF_DIR = os.path.join(OUT, "pdfs")


def lit(s):
    """Encode a python string as a PDF literal string token."""
    out = s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    out = out.replace("\n", r"\n").replace("\t", r"\t")
    return "(" + out + ")"


def hexstr(s):
    h = s.encode("latin-1").hex().upper()
    # plant embedded whitespace (legal) mid-token
    mid = len(h) // 2
    if mid % 2 == 1:
        mid += 1
    return "<" + h[:mid] + " " + h[mid:] + ">"


def content_ops(lines, style):
    """Build a content stream showing `lines`, exercising `style`."""
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for idx, ln in enumerate(lines):
        if idx > 0 and style != "quote":
            ops.append("0 -14 Td")
        if style == "tj":
            ops.append(lit(ln) + " Tj")
        elif style == "hex":
            ops.append(hexstr(ln) + " Tj")
        elif style == "tjarray":
            # split the line in two with a kerning number between
            cut = max(1, len(ln) // 2)
            ops.append("[" + lit(ln[:cut]) + " -250 " + lit(ln[cut:])
                       + "] TJ")
        elif style == "quote":
            # ' = move-to-next-line-and-show: no Td between lines
            if idx == 0:
                ops.append(lit(ln) + " Tj")
            else:
                ops.append(lit(ln) + " '")
        else:
            raise ValueError(style)
    ops.append("ET")
    return "\n".join(ops)


def build_pdf(pages, styles, compress):
    """pages: list of line-lists. Returns bytes."""
    objs = []  # (num, body bytes)
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append((1, f"<< /Type /Catalog /Pages 2 0 R >>".encode()))
    objs.append((2, (f"<< /Type /Pages /Kids [{kids}] "
                     f"/Count {n_pages} >>").encode()))
    for i, lines in enumerate(pages):
        page_num = 3 + 2 * i
        cont_num = page_num + 1
        objs.append((page_num, (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {cont_num} 0 R /Resources << /Font << /F1 "
            f"999 0 R >> >> >>").encode()))
        data = content_ops(lines, styles[i % len(styles)]).encode("latin-1")
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
        off = offsets.get(num, 0)
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {maxnum + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


DOCS = {
    # (pages, styles, compress)
    0: ([["Hello PDF world", "second line of page one"]], ["tj"], False),
    1: ([["compressed stream text", "deflated with zlib"]], ["tj"], True),
    2: ([["escapes: (parens) and \\ backslash", "tab\there"]],
        ["tj"], True),
    3: ([["hex encoded line", "another hex line"]], ["hex"], False),
    4: ([["kerned array line split", "TJ arrays ignore numbers"]],
        ["tjarray"], True),
    5: ([["page one text"], ["page two text", "page two line two"],
         ["page three"]], ["tj"], True),
    6: ([["quote operator line one", "quote operator line two",
          "and line three"]], ["quote"], False),
    7: ([["mixed " + "styles page", "with more text"],
         ["hex on page two"]], ["tjarray", "hex"], True),
}


def main():
    os.makedirs(PDF_DIR, exist_ok=True)
    for old in os.listdir(PDF_DIR):
        os.remove(os.path.join(PDF_DIR, old))
    rows = []
    for did, (pages, styles, compress) in sorted(DOCS.items()):
        pdf = build_pdf(pages, styles, compress)
        with open(os.path.join(PDF_DIR, f"doc_{did:03d}.pdf"), "wb") as f:
            f.write(pdf)
        text = "\n".join(ln for pg in pages for ln in pg)
        rows.append((did, text, len(pages)))
    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "n_pages": pa.array([r[2] for r in rows], pa.int32()),
    })
    pq.write_table(tbl, os.path.join(OUT, "pdf_twin.parquet"))
    print(f"wrote {len(rows)} PDFs + twin")


if __name__ == "__main__":
    main()
