"""Pure, pinned kernels: RFC-3986 URL canonicalization, HTML→text extraction,
outlink extraction, robots.txt parsing/matching.

These are the byte-identity anchors of the engine (BASELINE.json:6,15 —
"canonicalization (RFC-3986 normalize + xxhash64) and HTML-to-text extraction
entirely in vectorized Arrow/pandas UDFs", "extracted text byte-identical per
url"). The reference tree is empty (SURVEY.md §0.1), so byte-identity is
pinned to THESE functions: the pure-python crawl oracle
(tests/oracle_crawler.py), the synthetic pages generator
(spiderspark/pages.py) and the Spark pandas-UDF pipeline
(spiderspark/frontier.py) all import the same code, making the invariant
well-defined and testable.

Every public function here operates on ``pd.Series`` with vectorized pandas
string ops; per-element python runs only on rare-case subsets selected by a
vectorized mask (dot-segment paths) or at host granularity (robots bodies),
never per-URL on the hot path. Scalar convenience wrappers exist for the
oracle.

Canonicalization spec (pinned; tests/test_canon.py is the contract):
  1. strip surrounding whitespace; if no "://" scheme, prefix "http://".
  2. parse scheme://authority path ?query #fragment; drop the fragment.
  3. scheme → lowercase; userinfo ("user@") dropped; host → lowercase,
     trailing dots stripped; default ports removed (http:80, https:443).
  4. path: %XX hex uppercased, unreserved octets (ALPHA DIGIT - . _ ~)
     percent-decoded; dot-segments removed per RFC 3986 §5.2.4; empty
     path → "/".
  5. query: same percent-normalization, order and duplicates PRESERVED
     (no re-sorting — crawl identity must not merge distinct resources);
     an empty query ("http://h/p?") is dropped.
  6. unparseable inputs canonicalize to "" (filtered out downstream).

HTML→text spec (pinned):
  bytes → utf-8 decode (errors=replace) → strip comments → strip
  script/style blocks → every remaining tag → " " → numeric then named
  entity decode (amp lt gt quot apos nbsp; single pass each) → NBSP → " "
  → collapse [\\s]+ → " " → strip.
"""

from __future__ import annotations

import re
from html.entities import html5 as _html5_entities

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")
# userinfo ("user@", dropped per spec step 3) is consumed INSIDE the parts
# regex — one combined scan instead of extract + a second replace pass over
# the authority. `[^@/?#]*@` eats up to the FIRST '@' exactly like the old
# `^[^@/]*@` replace did on the extracted authority.
_URL_PARTS_RE = (
    r"^([A-Za-z][A-Za-z0-9+.\-]*)://(?:[^@/?#]*@)?([^/?#]*)([^?#]*)"
    r"(?:\?([^#]*))?(?:#.*)?$"
)
_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_DOT_SEG_RE = re.compile(r"(?:^|/)\.\.?(?:/|$)")
_SEG_RE = re.compile(r"^/?[^/]*")


def _pct_norm_match(m: re.Match) -> str:
    octet = int(m.group(1), 16)
    ch = chr(octet)
    if ch in _UNRESERVED:
        return ch
    return "%%%02X" % octet


def _idna_encode(host: str) -> str:
    try:
        return host.encode("idna").decode("ascii")
    except (UnicodeError, UnicodeDecodeError):
        return ""


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4, verbatim. Called only on the rare masked subset."""
    out: list[str] = []
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
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            seg = _SEG_RE.match(inp).group(0)
            out.append(seg)
            inp = inp[len(seg) :]
    return "".join(out)


# Identity fast path: a URL matching this shape is PROVABLY a fixed point of
# the full kernel below, clause by clause — lowercase http(s) scheme (step 3
# no-op); host already a valid lowercase reg-name ending in [a-z0-9] (no
# userinfo '@', no port ':', no trailing dot, ASCII only — steps 3 no-op and
# the validity gate passes); path starts '/' with no '%' (pct-norm no-op),
# and a separate guard rejects any dot-segment (step 4 no-op); optional
# query is non-empty with no '%' (step 5 no-op); no '#' anywhere (step 2
# no-op); no whitespace anywhere (strip no-op). Everything else — including
# anything merely SUSPECTED of needing work, e.g. a '/..' that actually sits
# in the query — falls through to the full kernel, so the fast path can only
# ever return byte-identical output (property-pinned against the full kernel
# in test_canon on generated, adversarial and fast-shaped inputs).
_FAST_IDENTITY_RE = re.compile(
    r"^https?://[a-z0-9](?:[a-z0-9.\-]*[a-z0-9])?/[^%?#\s]*(?:\?[^%#\s]+)?\Z"
)
# A dot segment ('.' or '..') ends at '/', at the start of the query ('?'),
# or at end-of-string ('#' cannot occur — the identity/case-port shapes
# reject fragments outright). The guard scans path+query, so a '/.' inside
# the query over-rejects to the full kernel — conservative, never unsound.
# Round-5 shipped without the '?' terminator and 'HTTP://0/.?0' escaped the
# guard (VERDICT r05 item 1); the counterexample is pinned in test_canon.
_FAST_DOTSEG_GUARD = re.compile(r"/\.\.?(?=[/?]|$)")

# Tier-2 cheap-fix path: rows whose ONLY deviations from the identity shape
# are scheme/host letter case and/or an explicit default port — the two most
# common non-canonical forms on a real frontier (mixed-case hand-entered
# hosts, ':80'/':443' emitted by naive link resolvers). For a match, the
# rebuild lower(scheme) + '://' + lower(host) + rest is provably what the
# full kernel returns: lowercasing [A-Za-z0-9.\-] lands inside the identity
# host charset with alnum ends preserved (so the validity gate passes and
# rstrip('.')/IDN/userinfo clauses are no-ops by charset exclusion), the
# matched port is dropped exactly when the kernel's is_default clause drops
# it (non-default scheme/port pairs are rejected below and fall through),
# and rest reuses the identity path/query clause verbatim (pct/dot-segment/
# whitespace no-ops, with the same dot-segment guard applied). The rebuild
# therefore matches _FAST_IDENTITY_RE by construction — a fixed point —
# and equals the full kernel's output on the original row. Anything else
# (non-default ports, userinfo, IDN, '%', dot-segments, whitespace) fails
# the match or the guard and pays the full kernel. Property-pinned against
# the full kernel in test_canon alongside the tier-1 pin.
_FAST_CASEPORT_RE = re.compile(
    r"^([Hh][Tt][Tt][Pp][Ss]?)://"
    r"([A-Za-z0-9](?:[A-Za-z0-9.\-]*[A-Za-z0-9])?)"
    r"(:(?:80|443))?"
    r"(/[^%?#\s]*(?:\?[^%#\s]+)?)\Z"
)


def canonicalize_series(urls: pd.Series) -> pd.Series:
    """Vectorized RFC-3986 canonicalization of a Series of URL strings.

    Three tiers: one combined-regex pass proves the already-canonical rows
    are fixed points (the common case on a well-behaved frontier — ~60% of
    the bench mix) and passes them through untouched; a second cheap-fix
    pass handles rows whose only deviations are scheme/host case or an
    explicit default port (lowercase + drop-port rebuild, proven equal to
    the full kernel — see _FAST_CASEPORT_RE); only the remainder pays the
    full multi-pass kernel. Byte-identical by construction."""
    s0 = urls.fillna("").astype(str)
    fast = s0.str.match(_FAST_IDENTITY_RE).to_numpy(dtype=bool)
    if fast.any():
        # dot-segment guard only over the identity-shaped subset
        fast[fast] = ~s0[fast].str.contains(_FAST_DOTSEG_GUARD).to_numpy(dtype=bool)
    if fast.all():
        return s0.copy()
    out = s0.copy()
    sub = s0[~fast]
    parts = sub.str.extract(_FAST_CASEPORT_RE)
    scheme_l = parts[0].str.lower()
    port = parts[2]
    eligible = (
        parts[0].notna()
        & (
            port.isna()
            | ((scheme_l == "http") & (port == ":80"))
            | ((scheme_l == "https") & (port == ":443"))
        )
        & ~parts[3].str.contains(_FAST_DOTSEG_GUARD, na=True)
    ).to_numpy(dtype=bool)
    if eligible.any():
        fixed = scheme_l + "://" + parts[1].str.lower() + parts[3]
        out.loc[sub.index[eligible]] = fixed[eligible]
        hard = sub.index[~eligible]
    else:
        hard = sub.index
    if len(hard):
        out.loc[hard] = _canonicalize_series_full(s0.loc[hard])
    return out


def _canonicalize_series_full(urls: pd.Series) -> pd.Series:
    """The full multi-pass kernel (every clause of the pinned spec)."""
    s = urls.fillna("").astype(str).str.strip()
    no_scheme = ~s.str.contains(_SCHEME_RE) & (s != "")
    s = s.where(~no_scheme, "http://" + s)

    parts = s.str.extract(_URL_PARTS_RE)
    scheme = parts[0].str.lower()
    auth = parts[1]
    path = parts[2].fillna("")
    query = parts[3]

    host = (
        auth.str.replace(r":\d*$", "", regex=True)
        .str.lower()
        .str.rstrip(".")
    )
    # IDN hosts → punycode (rare-case subset only; RFC 3490 via the stdlib
    # idna codec, pinned). Unencodable hosts fall through to the validity
    # gate below and are rejected.
    # explicit boolean coercion: object-dtype .fillna(False) downcasting is
    # deprecated pandas behavior — keep the kernel version-stable (pinned)
    non_ascii = (
        host.str.contains(r"[^\x00-\x7F]", regex=True)
        .astype("boolean").fillna(False).astype(bool)
    )
    if non_ascii.any():
        host = host.mask(non_ascii, host[non_ascii].map(_idna_encode))
    port = auth.str.extract(r":(\d+)$")[0]
    is_default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = (":" + port.fillna("")).where(port.notna() & ~is_default, "")

    # percent-normalization only on the subset that CONTAINS a '%': the
    # callback-regex replace is the most expensive pass in the kernel and
    # is the identity on %-free strings (the common case) — a cheap literal
    # contains() gates it; output is byte-identical by construction
    has_pct = path.str.contains("%", regex=False)
    if has_pct.any():
        path = path.mask(
            has_pct, path[has_pct].str.replace(_PCT_RE, _pct_norm_match, regex=True)
        )
    dotted = path.str.contains(_DOT_SEG_RE)
    if dotted.any():
        path = path.mask(dotted, path[dotted].map(remove_dot_segments))
    path = path.where(path != "", "/")
    needs_slash = ~path.str.startswith("/")
    path = path.where(~needs_slash, "/" + path)

    q_pct = (
        query.str.contains("%", regex=False)
        .astype("boolean").fillna(False).astype(bool)
    )
    if q_pct.any():
        query = query.mask(
            q_pct, query[q_pct].str.replace(_PCT_RE, _pct_norm_match, regex=True)
        )
    q_part = ("?" + query.fillna("")).where(query.notna() & (query != ""), "")

    out = scheme + "://" + host + port_part + path + q_part
    # reject syntactically-invalid hosts (spaces, %, parens, bare ':', …):
    # reg-name charset only — letters, digits, dots, hyphens; no leading/
    # trailing separator. Pinned: such URLs canonicalize to "" and are
    # filtered out of the frontier.
    valid_host = (
        host.str.match(r"^[a-z0-9]([a-z0-9.\-]*[a-z0-9])?$")
        .astype("boolean").fillna(False).astype(bool)
    )
    bad = scheme.isna() | host.isna() | ~valid_host
    return out.mask(bad, "").fillna("")


def canonicalize(url: str) -> str:
    """Scalar wrapper for the oracle — same code path as the Series kernel."""
    return canonicalize_series(pd.Series([url]))[0]


_HOST_RE = r"^[a-z][a-z0-9+.\-]*://([^/:?#]+)"


def host_of_series(url_norm: pd.Series) -> pd.Series:
    """Host component of already-canonicalized URLs ('' when absent)."""
    return url_norm.str.extract(_HOST_RE)[0].fillna("")


def host_of(url_norm: str) -> str:
    return host_of_series(pd.Series([url_norm]))[0]


# ---------------------------------------------------------------------------
# HTML → text extraction (pinned pure function; byte-identity anchor)
# ---------------------------------------------------------------------------

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]*>")
_ENT_HEX_RE = re.compile(r"&#[xX]([0-9a-fA-F]{1,6});")
_ENT_DEC_RE = re.compile(r"&#([0-9]{1,7});")
# full WHATWG HTML5 named-entity set via the stdlib table (pinned,
# version-stable — the html5 dict is frozen in CPython). Only the
# unambiguous ';'-terminated forms are decoded (every such name is
# alphanumeric, ≤31 chars); unknown names and legacy semicolon-less
# forms stay literal, matching the extractor's conservative contract.
_NAMED_ENTITIES = {
    k[:-1]: v for k, v in _html5_entities.items() if k.endswith(";")
}
_ENT_NAMED_RE = re.compile(r"&([a-zA-Z][a-zA-Z0-9]{0,31});")
_WS_RE = re.compile(r"\s+")


def _safe_chr(cp: int) -> str:
    if 0 <= cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
        return chr(cp)
    return ""


def _to_str_series(html: pd.Series) -> pd.Series:
    if html.dtype == object and html.map(
        lambda v: isinstance(v, (bytes, bytearray)) or v is None
    ).all():
        return html.str.decode("utf-8", errors="replace").fillna("")
    return html.fillna("").astype(str)


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized, pinned HTML→text. Input: bytes or str Series."""
    s = _to_str_series(html)
    s = s.str.replace(_COMMENT_RE, " ", regex=True)
    s = s.str.replace(_SCRIPT_STYLE_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    s = s.str.replace(_ENT_HEX_RE, lambda m: _safe_chr(int(m.group(1), 16)), regex=True)
    s = s.str.replace(_ENT_DEC_RE, lambda m: _safe_chr(int(m.group(1))), regex=True)
    s = s.str.replace(
        _ENT_NAMED_RE,
        lambda m: _NAMED_ENTITIES.get(m.group(1), m.group(0)),
        regex=True,
    )
    s = s.str.replace("\xa0", " ", regex=False)
    s = s.str.replace(_WS_RE, " ", regex=True).str.strip()
    return s


def extract_text(html: bytes | str) -> str:
    return extract_text_series(pd.Series([html]))[0]


# ---------------------------------------------------------------------------
# Outlink extraction
# ---------------------------------------------------------------------------

_HREF_RE = re.compile(r"""<a\s[^>]*?href\s*=\s*["']([^"'<>\s#]+)["']""", re.I)


def extract_outlinks_series(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """Series of lists of absolute outlink URLs.

    Absolute http(s) links pass through; path-absolute links ("/x") are
    resolved against the base URL's scheme+host (vectorized); other relative
    forms are dropped (pinned simplification — the synthetic corpus and the
    oracle share it).
    """
    s = _to_str_series(html)
    links = s.str.findall(_HREF_RE)
    origin = base_url.str.extract(r"^([a-z][a-z0-9+.\-]*://[^/?#]+)")[0].fillna("")

    def resolve(row_links: list[str], org: str) -> list[str]:
        out = []
        for link in row_links:
            if link.startswith(("http://", "https://")):
                out.append(link)
            elif link.startswith("/") and org:
                out.append(org + link)
        return out

    # Python only at list granularity; the regex scan above is the hot part.
    return pd.Series(
        [resolve(l, o) for l, o in zip(links, origin)], index=html.index
    )


def extract_outlinks(html: bytes | str, base_url: str) -> list[str]:
    return extract_outlinks_series(pd.Series([html]), pd.Series([base_url]))[0]


# ---------------------------------------------------------------------------
# robots.txt parsing + matching (reference analogue: per-server gating)
# ---------------------------------------------------------------------------


def parse_robots(body: str | None) -> tuple[list[tuple[bool, str]], float]:
    """Parse a robots.txt body for the '*' user-agent.

    Returns (rules, crawl_delay) where rules is a list of
    (allow: bool, path_prefix: str). Empty/missing body → ([], 0.0)
    (default allow). Only records whose user-agent set includes '*' apply.
    """
    if not body:
        return [], 0.0
    rules: list[tuple[bool, str]] = []
    crawl_delay = 0.0
    applies = False
    seen_directive_in_group = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if seen_directive_in_group:
                applies = False
                seen_directive_in_group = False
            if val == "*":
                applies = True
        elif key in ("allow", "disallow"):
            seen_directive_in_group = True
            if applies and val:
                rules.append((key == "allow", val))
        elif key == "crawl-delay":
            seen_directive_in_group = True
            if applies:
                try:
                    crawl_delay = float(val)
                except ValueError:
                    pass
    return rules, crawl_delay


def robots_allowed(path: str, rules: list[tuple[bool, str]]) -> bool:
    """Longest-prefix-match wins; tie → allow; no match → allow."""
    best_len = -1
    best_allow = True
    for allow, prefix in rules:
        if path.startswith(prefix):
            plen = len(prefix)
            if plen > best_len or (plen == best_len and allow):
                best_len = plen
                best_allow = allow
    return best_allow


def parse_robots_series(bodies: pd.Series) -> pd.Series:
    """Series[str|None] → Series[list[(allow, prefix)]] at HOST granularity.

    Hosts are a small dimension relative to URLs, so python-per-host here is
    off the hot path by construction (SURVEY.md §2.10 F7).
    """
    return bodies.map(lambda b: parse_robots(b)[0])


def crawl_delay_series(bodies: pd.Series) -> pd.Series:
    return bodies.map(lambda b: parse_robots(b)[1]).astype(np.float64)
