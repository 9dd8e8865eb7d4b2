#!/usr/bin/env python3
"""Fixture + twin for the q395 URL canonicalization gate
(graft.ops.UrlResolve.canonicalize): RFC 3986 §6.2.2 syntax-based +
§6.2.3 scheme-based normalization, implemented here INDEPENDENTLY from
the Scala engine (stdlib only; parsing via the RFC's own appendix-B
regex), then TRIANGULATED against urllib.parse where the two semantics
agree:

  - host case/port-drop vs urlsplit().hostname / .port on escape-free
    authorities;
  - unreserved-escape decode vs urllib.parse.unquote on components
    whose every escape is unreserved.

Planted: scheme/host case, default ports 80/443/21 (dropped) vs
explicit non-default and leading-zero ports (kept verbatim), empty
port, %7E→~ and %41→A decodes, retained-escape hex uppercasing
(%2f→%2F), dot segments + beyond-root clamp, empty http(s) path → "/",
userinfo escapes (case preserved), IPv6 literal hosts, invalid escapes
passing through verbatim, empty-query '?' preserved, fragments,
non-authority schemes untouched beyond scheme case.

  python3 scripts/gen_url_canon_fixture.py

Outputs: src/test/resources/graft/sources/url_canon_twin.parquet
"""
import os
import re
from urllib.parse import urlsplit, unquote

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")

RFC_B = re.compile(
    r"^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?")

UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    "0123456789-._~")

DEFAULT_PORT = {"http": "80", "ws": "80", "https": "443",
                "wss": "443", "ftp": "21"}


def parse(uri):
    m = RFC_B.match(uri or "")
    return (m.group(2), m.group(4), m.group(5) or "",
            m.group(7), m.group(9))


def remove_dot_segments(path):
    out = ""
    inp = path
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            out = out[:max(out.rfind("/"), 0)]
        elif inp == "/..":
            inp = "/"
            out = out[:max(out.rfind("/"), 0)]
        elif inp in (".", ".."):
            inp = ""
        else:
            nxt = inp.find("/", 1)
            if nxt < 0:
                out += inp
                inp = ""
            else:
                out += inp[:nxt]
                inp = inp[nxt:]
    return out


def pct_normalize(s, lower):
    out = []
    i = 0
    n = len(s)

    def hexv(c):
        return int(c, 16) if c in "0123456789abcdefABCDEF" else -1
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n and hexv(s[i + 1]) >= 0 \
                and hexv(s[i + 2]) >= 0:
            v = hexv(s[i + 1]) * 16 + hexv(s[i + 2])
            ch = chr(v)
            if v < 0x80 and ch in UNRESERVED:
                out.append(ch.lower() if lower else ch)
            else:
                out.append("%%%02X" % v)
            i += 3
        else:
            out.append(c.lower() if lower else c)
            i += 1
    return "".join(out)


def canon_authority(a, scheme):
    at = a.rfind("@")
    user, hostport = (a[:at], a[at + 1:]) if at >= 0 else (None, a)
    close = hostport.rfind("]")
    colon = hostport.find(":", max(close, 0))
    host, port = (hostport[:colon], hostport[colon + 1:]) \
        if colon >= 0 else (hostport, None)
    out = ""
    if user is not None:
        out += pct_normalize(user, False) + "@"
    out += pct_normalize(host, True)
    if port and port != DEFAULT_PORT.get(scheme or ""):
        out += ":" + port
    return out


def canonicalize(url):
    scheme, auth, path, query, frag = parse(url)
    scheme = scheme.lower() if scheme is not None else None
    cauth = canon_authority(auth, scheme) if auth is not None else None
    cpath = remove_dot_segments(pct_normalize(path, False))
    if cauth is not None and cpath == "" and scheme in ("http", "https"):
        cpath = "/"
    out = ""
    if scheme is not None:
        out += scheme + ":"
    if cauth is not None:
        out += "//" + cauth
    out += cpath
    if query is not None:
        out += "?" + pct_normalize(query, False)
    if frag is not None:
        out += "#" + pct_normalize(frag, False)
    return out


URLS = [
    "HTTP://WWW.Example.COM:80/a/b",
    "https://Example.com:443/",
    "http://example.com",
    "http://example.com:8080/x",
    "http://example.com:/x",
    "http://example.com/%7Euser/%2fpath",
    "http://example.com/a/./b/../c",
    "http://example.com/a/b/../../../x",
    "http://u%7Eser:p@example.com/x",
    "http://EXAMPLE.com/%41%62c",
    "http://example.com/x?q=%7e&b=%2F#Frag%7e",
    "HTTPS://example.com:8443/x",
    "http://[2001:DB8::1]:80/x",
    "http://[2001:db8::1]:8080/x",
    "ftp://Example.com:21/f",
    "ftp://example.com",
    "http://example.com/?",
    "http://example.com/%zz/%4",
    "mailto:John@Example.com",
    "http://example.com/a%2Fb%7Ec",
    "http://ex%41mple.com/x",
    "Http://a.COM/p/../",
    "http://example.com#f",
    "https://example.com:00443/x",
    "http://example.com/a/%2E%2E/b",
    "HTTP://User@Example.com:80/Path/File.HTML?A=b#Sec",
    "http://example.com/./x/.",
    "wss://Example.com:443/socket",
]


def main():
    canon = [canonicalize(u) for u in URLS]

    # planted truths
    got = dict(zip(URLS, canon))
    assert got["HTTP://WWW.Example.COM:80/a/b"] == \
        "http://www.example.com/a/b"
    assert got["http://example.com"] == "http://example.com/"
    assert got["http://example.com:/x"] == "http://example.com/x"
    assert got["http://example.com/%7Euser/%2fpath"] == \
        "http://example.com/~user/%2Fpath"
    assert got["http://example.com/a/b/../../../x"] == \
        "http://example.com/x"
    assert got["http://EXAMPLE.com/%41%62c"] == "http://example.com/Abc"
    assert got["http://[2001:DB8::1]:80/x"] == "http://[2001:db8::1]/x"
    assert got["https://example.com:00443/x"] == \
        "https://example.com:00443/x", "leading-zero port kept verbatim"
    assert got["http://example.com/%zz/%4"] == "http://example.com/%zz/%4"
    assert got["http://example.com/?"] == "http://example.com/?"
    # %2E is unreserved ('.'), so it decodes FIRST, and the decoded
    # dot segment is then removed: /a/%2E%2E/b -> /a/../b -> /b
    # (matching §6.2.2's ordering: 6.2.2.2 before 6.2.2.3)
    assert got["http://example.com/a/%2E%2E/b"] == "http://example.com/b"
    assert got["http://example.com#f"] == "http://example.com/#f"
    assert got["wss://Example.com:443/socket"] == \
        "wss://example.com/socket"

    # ---- urllib triangulation where semantics agree ----
    for u, c in zip(URLS, canon):
        try:
            su = urlsplit(u)
            sc2 = urlsplit(c)
        except ValueError:
            continue
        if su.hostname and "%" not in (su.netloc or ""):
            # canonical host must equal urllib's lowercased hostname
            assert sc2.hostname == su.hostname.lower(), (u, c)
            # default ports must be gone from the canonical form
            dp = DEFAULT_PORT.get((su.scheme or "").lower())
            if su.port is not None and dp and str(su.port) == dp \
                    and ":" + dp in u.split("/")[2]:
                assert sc2.port is None, (u, c)
        # unreserved-only escape decode agrees with unquote
        esc = re.findall(r"%([0-9A-Fa-f]{2})", su.path or "")
        if esc and all(chr(int(h, 16)) in UNRESERVED for h in esc):
            assert remove_dot_segments(unquote(su.path)) == sc2.path, (u, c)

    pq.write_table(pa.table({
        "url_id": pa.array(range(len(URLS)), pa.int64()),
        "raw": pa.array(URLS, pa.string()),
        "canonical": pa.array(canon, pa.string()),
    }), os.path.join(OUT, "url_canon_twin.parquet"))
    print(f"wrote {len(URLS)} url rows")


if __name__ == "__main__":
    main()
