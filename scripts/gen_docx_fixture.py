#!/usr/bin/env python3
"""Generate committed DOCX fixtures + twin for the q357 gate
(graft.ops.DocxExtract).

Each fixture is a spec-correct minimal OPC package (stdlib zipfile +
hand-written WordprocessingML — no code shared with the Scala parser)
built from known paragraph lists; the twin is those paragraphs
verbatim. Planted features: multi-run paragraphs (one visual line
split across w:r runs), xml:space-preserved spacing, w:tab and w:br,
XML entities in text, a table whose cells hold paragraphs, styling
elements that must contribute nothing.

  python3 scripts/gen_docx_fixture.py

Outputs: src/test/resources/graft/sources/docx/doc_NNN.docx
         src/test/resources/graft/sources/docx_twin.parquet
"""
import os
import zipfile

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
DOCX_DIR = os.path.join(OUT, "docx")

CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
</Types>"""

RELS = """<?xml version="1.0" encoding="UTF-8"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
</Relationships>"""


def esc(s):
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;"))


def p_simple(text):
    return f"<w:p><w:r><w:t>{esc(text)}</w:t></w:r></w:p>"


def p_multirun(parts):
    runs = "".join(
        f'<w:r><w:rPr><w:b/></w:rPr><w:t xml:space="preserve">{esc(p)}'
        f"</w:t></w:r>" for p in parts)
    return f"<w:p>{runs}</w:p>"


def p_tabbed(a, b):
    return (f"<w:p><w:r><w:t>{esc(a)}</w:t></w:r><w:r><w:tab/>"
            f"<w:t>{esc(b)}</w:t></w:r></w:p>")


def p_br(a, b):
    return (f"<w:p><w:r><w:t>{esc(a)}</w:t><w:br/><w:t>{esc(b)}</w:t>"
            f"</w:r></w:p>")


def document(body):
    return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
            '<w:document xmlns:w="http://schemas.openxmlformats.org/'
            'wordprocessingml/2006/main"><w:body>' + body +
            "</w:body></w:document>")


def write_docx(path, body):
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", CONTENT_TYPES)
        z.writestr("_rels/.rels", RELS)
        z.writestr("word/document.xml", document(body))


def main():
    os.makedirs(DOCX_DIR, exist_ok=True)
    for old in os.listdir(DOCX_DIR):
        os.remove(os.path.join(DOCX_DIR, old))
    rows = []  # (doc_id, text, n_paragraphs)

    # doc 0: plain paragraphs + entities
    body0 = (p_simple("First paragraph") +
             p_simple("Entities: 5 < 6 & 7 > 2") +
             p_simple("Third one"))
    write_docx(os.path.join(DOCX_DIR, "doc_000.docx"), body0)
    rows.append((0, "First paragraph\nEntities: 5 < 6 & 7 > 2\nThird one",
                 3))

    # doc 1: multi-run line with preserved spacing, styling ignored
    body1 = p_multirun(["bold start, ", "middle run, ", "end."])
    write_docx(os.path.join(DOCX_DIR, "doc_001.docx"), body1)
    rows.append((1, "bold start, middle run, end.", 1))

    # doc 2: tabs and soft breaks
    body2 = p_tabbed("left", "right") + p_br("line a", "line b")
    write_docx(os.path.join(DOCX_DIR, "doc_002.docx"), body2)
    rows.append((2, "left\tright\nline a\nline b", 2))

    # doc 3: a 2x2 table whose cells hold paragraphs
    cells = [["r1c1", "r1c2"], ["r2c1", "r2c2"]]
    tbl = "<w:tbl>" + "".join(
        "<w:tr>" + "".join(
            f"<w:tc>{p_simple(c)}</w:tc>" for c in row) + "</w:tr>"
        for row in cells) + "</w:tbl>"
    body3 = p_simple("before table") + tbl + p_simple("after table")
    write_docx(os.path.join(DOCX_DIR, "doc_003.docx"), body3)
    rows.append((3, "before table\nr1c1\nr1c2\nr2c1\nr2c2\nafter table",
                 6))

    # doc 4: empty paragraphs drop from text but count as paragraphs
    body4 = p_simple("only real line") + "<w:p/>" + "<w:p></w:p>"
    write_docx(os.path.join(DOCX_DIR, "doc_004.docx"), body4)
    rows.append((4, "only real line", 3))

    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "n_paragraphs": pa.array([r[2] for r in rows], pa.int32()),
    }), os.path.join(OUT, "docx_twin.parquet"))
    print(f"wrote {len(rows)} docx + twin")


if __name__ == "__main__":
    main()
