#!/usr/bin/env python3
"""Generate committed FULL-package DOCX fixtures + twin for the q378
gate (graft.ops.DocxExtract.extractFull — headers, footers, footnotes
on top of the q357 body extraction, closing the documented body-only
boundary).

Spec-correct minimal OPC packages (stdlib zipfile + hand-written
WordprocessingML, no shared code) from known line lists; the twin is
those lines verbatim. Planted: two headers whose FILE-NAME order the
gate pins (header2 content differs from header1), a footer, footnotes
INCLUDING the separator/continuationSeparator stubs that must
contribute nothing, a doc with no headers at all (empty strings), and
a multi-run footnote.

  python3 scripts/gen_docx_full_fixture.py

Outputs: src/test/resources/graft/sources/docx_full/doc_NNN.docx
         src/test/resources/graft/sources/docx_full_twin.parquet
"""
import os
import zipfile

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
DIR = os.path.join(OUT, "docx_full")

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


def p(text):
    return f"<w:p><w:r><w:t>{esc(text)}</w:t></w:r></w:p>"


def body_xml(paras):
    inner = "".join(p(t) for t in paras)
    return (f'<?xml version="1.0"?><w:document '
            f'xmlns:w="http://schemas.openxmlformats.org/'
            f'wordprocessingml/2006/main"><w:body>{inner}'
            f"</w:body></w:document>")


def hdrftr_xml(tag, paras):
    inner = "".join(p(t) for t in paras)
    return (f'<?xml version="1.0"?><w:{tag} '
            f'xmlns:w="http://schemas.openxmlformats.org/'
            f'wordprocessingml/2006/main">{inner}</w:{tag}>')


def footnotes_xml(notes):
    """notes: list of line-lists; separator stubs planted first."""
    parts = ['<w:footnote w:type="separator" w:id="-1"><w:p><w:r>'
             "<w:separator/></w:r></w:p></w:footnote>",
             '<w:footnote w:type="continuationSeparator" w:id="0">'
             "<w:p><w:r><w:continuationSeparator/></w:r></w:p>"
             "</w:footnote>"]
    for i, lines in enumerate(notes):
        inner = "".join(p(t) for t in lines)
        parts.append(f'<w:footnote w:id="{i + 1}">{inner}</w:footnote>')
    return (f'<?xml version="1.0"?><w:footnotes '
            f'xmlns:w="http://schemas.openxmlformats.org/'
            f'wordprocessingml/2006/main">{"".join(parts)}'
            f"</w:footnotes>")


def build(path, paras, headers=(), footers=(), footnotes=()):
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", CONTENT_TYPES)
        z.writestr("_rels/.rels", RELS)
        z.writestr("word/document.xml", body_xml(paras))
        for i, h in enumerate(headers):
            z.writestr(f"word/header{i + 1}.xml", hdrftr_xml("hdr", h))
        for i, f in enumerate(footers):
            z.writestr(f"word/footer{i + 1}.xml", hdrftr_xml("ftr", f))
        if footnotes:
            z.writestr("word/footnotes.xml", footnotes_xml(footnotes))


DOCS = {
    0: dict(paras=["body one", "body two"],
            headers=[["Chapter Heading"], ["Running Head Two"]],
            footers=[["page footer & co"]],
            footnotes=[["first note"], ["second note line a",
                                        "second note line b"]]),
    1: dict(paras=["plain body only"]),
    2: dict(paras=["body with notes"],
            footnotes=[["only note"]]),
}


def expected(d):
    body = "\n".join(d["paras"])
    hdr = "\n".join("\n".join(h) for h in d.get("headers", ()))
    ftr = "\n".join("\n".join(f) for f in d.get("footers", ()))
    fn = "\n".join("\n".join(n) for n in d.get("footnotes", ()))
    return body, hdr, ftr, fn, len(d["paras"])


def main():
    os.makedirs(DIR, exist_ok=True)
    for old in os.listdir(DIR):
        os.remove(os.path.join(DIR, old))
    rows = []
    for did, d in sorted(DOCS.items()):
        build(os.path.join(DIR, f"doc_{did:03d}.docx"), d["paras"],
              d.get("headers", ()), d.get("footers", ()),
              d.get("footnotes", ()))
        b, h, f, fn, np_ = expected(d)
        rows.append((did, b, h, f, fn, np_))
    # planted truths
    assert rows[0][2] == "Chapter Heading\nRunning Head Two"
    assert rows[0][4] == "first note\nsecond note line a\nsecond note line b"
    assert rows[1][2] == "" and rows[1][3] == "" and rows[1][4] == ""
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "body": pa.array([r[1] for r in rows], pa.string()),
        "header_text": pa.array([r[2] for r in rows], pa.string()),
        "footer_text": pa.array([r[3] for r in rows], pa.string()),
        "footnotes_text": pa.array([r[4] for r in rows], pa.string()),
        "n_paragraphs": pa.array([r[5] for r in rows], pa.int32()),
    }), os.path.join(OUT, "docx_full_twin.parquet"))
    print(f"wrote {len(rows)} full-package docx + twin")


if __name__ == "__main__":
    main()
