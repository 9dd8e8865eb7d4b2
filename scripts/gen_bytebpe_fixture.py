#!/usr/bin/env python3
"""Generate committed fixtures + twin for the q372 byte-level BPE gate
(graft.ops.ByteBpe — the GPT-2 tokenizer pipeline: pretokenizer
scanner, bytes-to-unicode table, ranked merge application).

This is an INDEPENDENT python implementation of the same published
algorithm (no code shared with the Scala op): the documented scanner
rules stand in for the GPT-2 regex on both sides, bytes_to_unicode is
the published table, and merges apply lowest-rank-first fusing every
left-to-right occurrence. The merge table itself is INPUT (shipped as
bpe_merges.txt, read by both sides — a tokenizer is config, not code).

  python3 scripts/gen_bytebpe_fixture.py

Outputs: src/test/resources/graft/sources/bpe_texts.parquet
         src/test/resources/graft/sources/bpe_merges.txt
         src/test/resources/graft/sources/bpe_twin.parquet
"""
import os

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")


def bytes_to_unicode():
    keep = (list(range(ord("!"), ord("~") + 1))
            + list(range(0xA1, 0xAC + 1))
            + list(range(0xAE, 0xFF + 1)))
    out = {}
    n = 0
    for b in range(256):
        if b in keep:
            out[b] = chr(b)
        else:
            out[b] = chr(256 + n)
            n += 1
    return out


B2U = bytes_to_unicode()
CONTRACTIONS = ["'s", "'t", "'re", "'ve", "'m", "'ll", "'d"]


# The Scala op scans per UTF-16 CODE UNIT (a JVM Char): a
# supplementary-plane character is two surrogates, each of which is
# neither letter nor digit nor whitespace, so an astral char always
# classifies as "other" — and, since both halves classify identically,
# a surrogate pair can never split across pretokens. This twin pins
# the SAME documented rule by overriding the per-char classes for
# ord > 0xFFFF (python iterates code points, so one astral char here
# corresponds to exactly one unsplittable surrogate pair there).
def _alpha(c):
    return ord(c) <= 0xFFFF and c.isalpha()


def _digit(c):
    return ord(c) <= 0xFFFF and c.isdigit()


def pretokenize(s):
    out = []
    n = len(s)
    i = 0
    while i < n:
        c = s[i]
        hit = None
        if c == "'":
            for t in CONTRACTIONS:
                if s.startswith(t, i):
                    hit = t
                    break
        if hit:
            out.append(hit)
            i += len(hit)
            continue
        lead = c == " " and i + 1 < n and not s[i + 1].isspace()
        j0 = i + 1 if lead else i
        d = s[j0]
        if not d.isspace():
            j = j0
            if _alpha(d):
                while j < n and _alpha(s[j]):
                    j += 1
            elif _digit(d):
                while j < n and _digit(s[j]):
                    j += 1
            else:
                while (j < n and not s[j].isspace()
                       and not _alpha(s[j]) and not _digit(s[j])):
                    j += 1
            out.append(s[i:j])
            i = j
        else:
            j = i
            while j < n and s[j].isspace():
                j += 1
            if j < n and j - i > 1:
                out.append(s[i:j - 1])
                i = j - 1
            else:
                out.append(s[i:j])
                i = j
    return out


def apply_merges(pretoken, ranks):
    parts = [B2U[b] for b in pretoken.encode("utf-8")]
    while len(parts) >= 2:
        best = None
        for k in range(len(parts) - 1):
            r = ranks.get((parts[k], parts[k + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, parts[k], parts[k + 1])
        if best is None:
            break
        _, a, b = best
        nb = []
        k = 0
        while k < len(parts):
            if k + 1 < len(parts) and parts[k] == a and parts[k + 1] == b:
                nb.append(a + b)
                k += 2
            else:
                nb.append(parts[k])
                k += 1
        parts = nb
    return parts


def encode(text, ranks):
    toks = []
    for p in pretokenize(text):
        toks.extend(apply_merges(p, ranks))
    return toks


G = "Ġ"  # byte 0x20 under bytes_to_unicode ('Ġ')

MERGES = [
    ("h", "e"), ("t", "he"), (G, "t"), ("Ġt", "he"),
    ("a", "n"), ("an", "d"), (G, "a"), ("Ġa", "nd"),
    (G, "the"), (G, "and"),   # full-word fuses after the cascades
    ("i", "n"), ("e", "r"), ("o", "n"),
    ("Ã", "©"),            # UTF-8 é (C3 A9) fuses into one token
    ("1", "2"), ("12", "3"),
    ("c", "a"), ("ca", "f"), ("caf", "Ã©"),
    (G, G),                # whitespace-run pair (GPT-2 has these)
    ("'", "s"), ("'", "l"), ("'l", "l"), ("'", "v"), ("'v", "e"),
]

TEXTS = [
    (0, "the cat and the dog"),
    (1, "I'll say it's fine, we've seen worse"),
    (2, "café café CAFE"),
    (3, "numbers 123 and 4567 mix9ed"),
    (4, "spaces   between    words"),
    (5, "line\nbreaks\n\n  and tabs\there"),
    (6, "punct!!! runs?? (mixed) -- dashes"),
    (7, " leading space"),
    (8, "trailing space "),
    (9, ""),
    (10, "don't can't won't"),
    (11, "ÐÑÒ raw high bytes and émigré"),
    # supplementary plane: astral letters (𝕏𝕐) and an emoji classify
    # as "other" per UTF-16 unit on BOTH engines (documented rule);
    # the surrogate pair stays whole, so UTF-8 stays 4-byte proper
    (12, "astral 𝕏𝕐 pair💡end"),
]


def main():
    ranks = {m: i for i, m in enumerate(MERGES)}
    with open(os.path.join(OUT, "bpe_merges.txt"), "w",
              encoding="utf-8") as f:
        for a, b in MERGES:
            f.write(f"{a} {b}\n")
    rows = []
    for tid, text in TEXTS:
        toks = encode(text, ranks)
        rows.append((tid, text, len(toks), " ".join(toks)))
    by = {r[0]: r[3] for r in rows}
    # planted truths
    # cascade: (h,e)->(t,he) builds "the"; (a,n)->(an,d) then (Ġ,and);
    # rank order prevents (Ġ,a)/(Ġ,t) from firing first
    assert by[0] == "the Ġ ca t Ġand Ġthe Ġ d o g", by[0]
    assert "'ll" in by[1] and "'s" in by[1] and "'ve" in by[1]
    assert "cafÃ©" in by[2], by[2]            # multibyte fuse through é
    assert "Ġ123" not in by[3] and "123" in by[3]  # digit merges, no Ġ1
    assert by[9] == ""                         # empty text, zero tokens
    assert "ĠĠ" in by[4]                      # collapsed ws run token
    # astral row: letters break around the astral run; each astral
    # char contributes its 4 proper UTF-8 bytes as one contiguous
    # 4-symbol group (no CESU-8 6-byte surrogate encoding)
    x_syms = "".join(B2U[b] for b in "𝕏".encode("utf-8"))
    bulb_syms = "".join(B2U[b] for b in "💡".encode("utf-8"))
    joined12 = by[12].replace(" ", "")
    assert len(x_syms) == 4 and x_syms in joined12, by[12]
    assert len(bulb_syms) == 4 and bulb_syms in joined12, by[12]
    # conservation: concatenated symbol length == UTF-8 octet length
    # (4-byte proper encoding for astral chars, never CESU-8's 6)
    assert len(joined12) == len(TEXTS[12][1].encode("utf-8")), by[12]
    # the letter run BREAKS at the astral chars ("astral" spells out)
    assert by[12].split()[:6] == list("astral"), by[12]
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }), os.path.join(OUT, "bpe_texts.parquet"))
    pq.write_table(pa.table({
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "n_tokens": pa.array([r[2] for r in rows], pa.int64()),
        "tokens": pa.array([r[3] for r in rows], pa.string()),
    }), os.path.join(OUT, "bpe_twin.parquet"))
    print(f"wrote {len(rows)} texts + {len(MERGES)} merges + twin")


if __name__ == "__main__":
    main()
