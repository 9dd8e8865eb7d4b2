#!/usr/bin/env python3
"""Generate the VERSIONED robots fixture + twin for the q380
streaming-refresh gate (graft.streaming.StreamingRobots — probes
evaluated against the robots body that was VALID AT FETCH TIME).

robots.txt bodies change while a crawl runs; a compliant pipeline must
judge each fetch against the version in force when the fetch happened,
not the latest one. The fixture plants: a host whose rules LOOSEN at a
boundary (an Allow appears), one whose rules TIGHTEN (allow-all →
deny-all), a host whose first robots.txt arrives mid-stream (probes
before it see the no-robots default allow), and a host with no robots
at all. Validity windows are half-open [valid_from, valid_to).

The expected verdicts reuse the SAME independent RFC 9309
implementation as q371's twin (imported from gen_robots_fixture, no
code shared with the Scala evaluator).

  python3 scripts/gen_robots_versioned_fixture.py

Outputs: src/test/resources/graft/sources/robots_versions.parquet
         src/test/resources/graft/sources/robots_stream_twin.parquet
"""
import os

from gen_robots_fixture import parse, is_allowed

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")

MAX = (1 << 63) - 1

# (host, version, valid_from_us, valid_to_us, txt)
VERSIONS = [
    ("flip.example", 1, 0, 1000,
     "User-agent: *\nDisallow: /beta/\n"),
    ("flip.example", 2, 1000, MAX,
     "User-agent: *\nAllow: /beta/ok\nDisallow: /beta/\n"),
    ("tighten.example", 1, 0, 500,
     "User-agent: *\nDisallow:\n"),          # empty disallow: allow all
    ("tighten.example", 2, 500, MAX,
     "User-agent: *\nDisallow: /\n"),
    ("late.example", 1, 500, MAX,
     "User-agent: *\nDisallow: /x/\n"),
]

# (host, agent, path, fetch_ts_us)
PROBES = [
    ("flip.example", "bot", "/beta/ok", 999),    # v1: denied
    ("flip.example", "bot", "/beta/ok", 1000),   # boundary -> v2: allowed
    ("flip.example", "bot", "/beta/ok", 5000),   # v2: allowed
    ("flip.example", "bot", "/beta/z", 5000),    # v2: still denied
    ("tighten.example", "bot", "/a", 0),         # v1: allowed
    ("tighten.example", "bot", "/a", 499),       # v1: allowed
    ("tighten.example", "bot", "/a", 500),       # boundary -> v2: denied
    ("late.example", "bot", "/x/1", 100),        # pre-first-fetch: allow
    ("late.example", "bot", "/x/1", 600),        # v1: denied
    ("late.example", "bot", "/y", 600),          # v1: allowed
    ("ghost.example", "bot", "/anything", 300),  # host never fetched
]


def verdict(host, agent, path, ts):
    for h, _, lo, hi, txt in VERSIONS:
        if h == host and lo <= ts < hi:
            return is_allowed(parse(txt), agent, path)
    return True  # no robots body in force at fetch time -> allowed


def main():
    rows = [(h, a, p, ts, verdict(h, a, p, ts)) for h, a, p, ts in PROBES]
    byp = {(h, a, p, ts): al for h, a, p, ts, al in rows}
    # planted truths
    assert byp[("flip.example", "bot", "/beta/ok", 999)] is False
    assert byp[("flip.example", "bot", "/beta/ok", 1000)] is True
    assert byp[("flip.example", "bot", "/beta/z", 5000)] is False
    assert byp[("tighten.example", "bot", "/a", 499)] is True
    assert byp[("tighten.example", "bot", "/a", 500)] is False
    assert byp[("late.example", "bot", "/x/1", 100)] is True
    assert byp[("late.example", "bot", "/x/1", 600)] is False
    assert byp[("ghost.example", "bot", "/anything", 300)] is True
    # versions of one host never overlap (the op's documented precondition)
    for h in {v[0] for v in VERSIONS}:
        spans = sorted((lo, hi) for hh, _, lo, hi, _ in VERSIONS if hh == h)
        for (l1, h1), (l2, _) in zip(spans, spans[1:]):
            assert h1 <= l2, (h, spans)

    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "host": pa.array([v[0] for v in VERSIONS], pa.string()),
        "version": pa.array([v[1] for v in VERSIONS], pa.int32()),
        "valid_from_us": pa.array([v[2] for v in VERSIONS], pa.int64()),
        "valid_to_us": pa.array([v[3] for v in VERSIONS], pa.int64()),
        "txt": pa.array([v[4] for v in VERSIONS], pa.string()),
    }), os.path.join(OUT, "robots_versions.parquet"))
    pq.write_table(pa.table({
        "host": pa.array([r[0] for r in rows], pa.string()),
        "agent": pa.array([r[1] for r in rows], pa.string()),
        "path": pa.array([r[2] for r in rows], pa.string()),
        "fetch_ts_us": pa.array([r[3] for r in rows], pa.int64()),
        "allowed": pa.array([r[4] for r in rows], pa.bool_()),
    }), os.path.join(OUT, "robots_stream_twin.parquet"))
    print(f"wrote {len(VERSIONS)} versions + twin ({len(rows)} probes)")


if __name__ == "__main__":
    main()
