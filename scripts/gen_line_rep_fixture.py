#!/usr/bin/env python3
"""Generate the multi-line documents fixture for the q381 line-
repetition gate (graft.ops.TextAnalysis.lineRepetitionTable — the
Gopher duplicate-line / duplicate-line-character fractions).

The driver's documents table is single-line, so line-level signals are
vacuous there; this plants the shapes that matter: heavy boilerplate
repetition (nav/footer lines), all-distinct prose, whitespace-only and
empty lines, CRLF input (the \\r stays part of the line — 'a\\r' and
'a' must NOT merge), multibyte lines, a single-line doc, an empty doc,
and a NULL text. There is no separate twin: the oracle is DuckDB
re-deriving the same algebra from the same raw texts (the q47 CSV
discipline — two engines, one definition, one input).

  python3 scripts/gen_line_rep_fixture.py

Outputs: src/test/resources/graft/sources/line_rep_fixture.parquet
"""
import os

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")

DOCS = [
    # boilerplate: "Home | About" repeats 3x of 6 lines
    (0, "Home | About\nwelcome to the page\nHome | About\n"
        "real content here\nHome | About\nmore real content"),
    # all distinct
    (1, "alpha\nbeta\ngamma\ndelta"),
    # whitespace-only and empty lines drop; "x" repeats around them
    (2, "x\n   \n\nx\n  x  \n\t\n"),
    # CRLF: 'a\r' (from CRLF) and bare 'a' are DIFFERENT lines
    (3, "a\r\na\nb\r\nb\r"),
    # one line repeated 5x (max_line_rep hot case)
    (4, "spam\nspam\nspam\nspam\nspam"),
    # multibyte: char counts, not bytes
    (5, "héllo wörld\nhéllo wörld\n日本語の行\nunique"),
    # single line
    (6, "just one line"),
    # empty text
    (7, ""),
    # null text
    (8, None),
    # mixed: 2 dup pairs + 2 singles -> frac 4-... lines=6 distinct=4
    (9, "l1\nl2\nl1\nl3\nl2\nl4"),
]


def main():
    # sanity: doc 2's kept lines are 'x','x','x' (trim collapses the
    # padded form), tab-only line drops
    kept2 = [ln.strip(" ") for ln in DOCS[2][1].split("\n")]
    kept2 = [ln for ln in kept2 if ln]
    assert kept2 == ["x", "x", "x", "\t"], kept2
    # ... except the tab-only line: trim strips SPACES only, so a tab
    # survives as a 1-char line — a deliberate pin of the space-only
    # trim rule on both engines

    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
        "text": pa.array([d[1] for d in DOCS], pa.string()),
    }), os.path.join(OUT, "line_rep_fixture.parquet"))
    print(f"wrote {len(DOCS)} docs")


if __name__ == "__main__":
    main()
