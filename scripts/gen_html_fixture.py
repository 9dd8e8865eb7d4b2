#!/usr/bin/env python3
"""Generate committed HTML fixtures + extraction twin for the q351
HTML->text operator (graft.ops.HtmlExtract).

This script implements the SAME documented spec (HtmlExtract.scala's
scaladoc) INDEPENDENTLY -- a separate state machine, no shared code --
and computes the expected text / link count / density for each planted
fixture, so the gate certifies every branch: comment skip, doctype,
quoted-'>' attributes, raw script/style/noscript swallowing,
block-tag newlines, one-pass entity decoding, nbsp, numeric entities,
whitespace collapse.

  python3 scripts/gen_html_fixture.py

Outputs: src/test/resources/graft/sources/html/doc_NNN.html
         src/test/resources/graft/sources/html_twin.parquet
"""
import os
import re

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
HTML_DIR = os.path.join(OUT, "html")

BLOCK = {"p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4",
         "h5", "h6", "tr", "table", "section", "article", "header",
         "footer", "blockquote", "pre"}
RAW = {"script", "style", "noscript"}
NAMED = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
         "nbsp": " "}


def extract(html):
    n = len(html)
    out = []
    links = 0
    i = 0
    while i < n:
        c = html[i]
        if html.startswith("<!--", i):
            end = html.find("-->", i + 4)
            i = n if end < 0 else end + 3
        elif html.startswith("<!", i):
            end = html.find(">", i + 2)
            i = n if end < 0 else end + 1
        elif c == "<" and i + 1 < n and (html[i + 1].isalpha()
                                         or html[i + 1] == "/"):
            closing = html[i + 1] == "/"
            j = i + (2 if closing else 1)
            name_start = j
            while j < n and html[j].isalnum():
                j += 1
            name = html[name_start:j].lower()
            quote = ""
            end = -1
            k = j
            while end < 0 and k < n:
                ch = html[k]
                if quote:
                    if ch == quote:
                        quote = ""
                elif ch in "\"'":
                    quote = ch
                elif ch == ">":
                    end = k
                k += 1
            i = n if end < 0 else end + 1
            if not closing and name == "a":
                links += 1
            if name in BLOCK:
                out.append("\n")
            if not closing and name in RAW and end >= 0:
                m = i
                found = -1
                low = html.lower()
                while found < 0 and m < n:
                    if (html[m] == "<" and m + 1 < n and html[m + 1] == "/"
                            and low.startswith(name, m + 2)):
                        gt = html.find(">", m + 2)
                        found = n if gt < 0 else gt + 1
                    else:
                        m += 1
                i = n if found < 0 else found
        elif c == "&":
            semi = html.find(";", i + 1)
            if semi > i and semi - i <= 12:
                body = html[i + 1:semi]
                if body in NAMED:
                    out.append(NAMED[body])
                    i = semi + 1
                elif len(body) > 1 and body[0] == "#":
                    try:
                        cp = (int(body[2:], 16)
                              if body[1] in "xX" else int(body[1:]))
                    except ValueError:
                        cp = -1
                    if 0 <= cp < 0x110000:
                        out.append(chr(cp))
                        i = semi + 1
                    else:
                        out.append(c)
                        i += 1
                else:
                    out.append(c)
                    i += 1
            else:
                out.append(c)
                i += 1
        else:
            out.append(c)
            i += 1
    raw = "".join(out).replace(" ", " ")
    lines = [re.sub(r"[ \t\r\f\x0b]+", " ", ln).strip()
             for ln in raw.split("\n")]
    text = "\n".join(ln for ln in lines if ln)
    return text, links


DOCS = {
    0: ("<html><head><title>T</title><script>var x = '<div>not text</div>';"
        "</script></head><body><p>Hello world</p></body></html>"),
    1: ('<body><a href="/x?a=1&b=2" title="5 > 3">link one</a> and '
        "<a href='y'>two</a><p>tail</p></body>"),
    2: ("<!DOCTYPE html><!-- a comment with <p>tags</p> inside -->"
        "<div>after&nbsp;comment</div>"),
    3: ("<ul><li>alpha</li><li>beta</li></ul><ol><li>gamma</li></ol>"),
    4: ("entities: &amp;lt; stays, &lt;b&gt; literal, &#65;&#x42;C, "
        "&unknown; kept, &broken no-semi"),
    5: ("<STYLE type='text/css'>p { color: red; } /* < > & */</STYLE>"
        "<P>CAPS TAGS</P>"),
    6: ("<pre>  spaced   text  \t tabs </pre><div>a  b</div>"),
    7: ("<noscript><img src=x></noscript><h1>Title</h1><h2>Sub</h2>"
        "plain tail"),
    8: ("< not a tag, 2 < 3 and 5 > 4 <p>real</p>"),
    9: ("<table><tr><td>c1</td><td>c2</td></tr><tr><td>c3</td></tr>"
        "</table>"),
    10: ("<script>unterminated body never closes "),
    11: ("<div class=\"x'y\" data-q='a\"b'>mixed quotes</div>"
         "<br>line2<br/>line3"),
    12: ("blockquote: <blockquote cite='q>u'>quoted > attr</blockquote>"
         "<footer>foot</footer>"),
    # extracts to EMPTY text (a boilerplate-only page); the truly-empty
    # input case lives in HtmlExtractSpec -- Spark's binaryFile source
    # skips zero-length files, so an empty FILE cannot sit on the gate
    13: ("<div><!-- nothing to see --><script>x<1</script></div>"),
}


def main():
    os.makedirs(HTML_DIR, exist_ok=True)
    for old in os.listdir(HTML_DIR):
        os.remove(os.path.join(HTML_DIR, old))
    rows = []
    for did, html in sorted(DOCS.items()):
        with open(os.path.join(HTML_DIR, f"doc_{did:03d}.html"), "w",
                  encoding="utf-8") as f:
            f.write(html)
        text, links = extract(html)
        density = 0.0 if not html else round_half_up6(len(text) / len(html))
        rows.append((did, text, links, density))
    byid = {r[0]: r for r in rows}
    # planted truths
    assert "not text" not in byid[0][1] and "Hello world" in byid[0][1]
    assert byid[1][2] == 2 and "5 > 3" not in byid[1][1]  # attr skipped
    assert byid[2][1] == "after comment"
    assert byid[3][1] == "alpha\nbeta\ngamma"
    assert byid[4][1] == ("entities: &lt; stays, <b> literal, ABC, "
                          "&unknown; kept, &broken no-semi")
    assert byid[5][1] == "CAPS TAGS" and "color" not in byid[5][1]
    assert byid[6][1] == "spaced text tabs\na b"
    assert byid[7][1] == "Title\nSub\nplain tail" and "img" not in byid[7][1]
    assert byid[8][1] == "< not a tag, 2 < 3 and 5 > 4\nreal"
    assert byid[9][1] == "c1c2\nc3"
    assert byid[10][1] == ""
    assert byid[11][1] == "mixed quotes\nline2\nline3"
    assert byid[12][1] == "blockquote:\nquoted > attr\nfoot"
    assert byid[13][1] == "" and byid[13][3] == 0.0  # boilerplate-only

    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "n_links": pa.array([r[2] for r in rows], pa.int32()),
        "text_density": pa.array([r[3] for r in rows], pa.float64()),
    })
    pq.write_table(tbl, os.path.join(OUT, "html_twin.parquet"))
    print(f"wrote {len(rows)} HTML fixtures + twin")


def round_half_up6(x):
    from decimal import Decimal, ROUND_HALF_UP
    return float(Decimal(repr(x)).quantize(
        Decimal("0.000001"), ROUND_HALF_UP))


if __name__ == "__main__":
    main()
