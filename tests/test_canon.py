"""Contract tests for the pinned pure kernels (SURVEY.md §5.4, §7.5.1-2).

These run without Spark — the kernels are pure pandas/numpy.
"""

import pandas as pd
import pytest

from spiderspark.canon import (
    canonicalize,
    canonicalize_series,
    crawl_delay_series,
    extract_outlinks,
    extract_text,
    extract_text_series,
    host_of,
    parse_robots,
    robots_allowed,
)


CANON_CASES = [
    # (input, expected)
    ("http://Example.COM/path", "http://example.com/path"),
    ("HTTP://EXAMPLE.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com#frag", "http://example.com/"),
    ("http://example.com/a/./b/../c", "http://example.com/a/c"),
    ("http://example.com/../a", "http://example.com/a"),
    ("http://example.com/%7Euser", "http://example.com/~user"),
    ("http://example.com/%7euser", "http://example.com/~user"),
    ("http://example.com/a%2fb", "http://example.com/a%2Fb"),
    ("http://user:pw@example.com/x", "http://example.com/x"),
    ("http://example.com./x", "http://example.com/x"),
    ("  http://example.com/x  ", "http://example.com/x"),
    ("example.com/x", "http://example.com/x"),
    ("http://example.com/p?b=2&a=1", "http://example.com/p?b=2&a=1"),  # query order kept
    ("http://example.com/p?", "http://example.com/p"),
    ("http://example.com/p?q=%41", "http://example.com/p?q=A"),
    ("", ""),
    # invalid hosts are rejected outright (pinned: canonicalize to "")
    ("not a url", ""),
    ("%%%", ""),
    ("javascript:void(0)", ""),
    ("http://ex ample.com/x", ""),
    ("http://-bad-.com/", ""),
    ("http://127.0.0.1:8080/x", "http://127.0.0.1:8080/x"),
    # IDN hosts → punycode (stdlib idna codec, pinned)
    ("http://münchen.example/pfad", "http://xn--mnchen-3ya.example/pfad"),
    ("http://中文.example/x", "http://xn--fiq228c.example/x"),
]


@pytest.mark.parametrize("url,expected", CANON_CASES)
def test_canonicalize_scalar(url, expected):
    assert canonicalize(url) == expected


def test_canonicalize_series_matches_scalar():
    urls = pd.Series([u for u, _ in CANON_CASES])
    out = canonicalize_series(urls)
    assert list(out) == [e for _, e in CANON_CASES]


def test_canonicalize_idempotent():
    urls = pd.Series([u for u, _ in CANON_CASES if u.strip()])
    once = canonicalize_series(urls)
    twice = canonicalize_series(once)
    assert list(once) == list(twice)


def test_variants_collapse():
    variants = [
        "http://HOST3.example/p/1",
        "http://host3.example:80/p/1",
        "http://host3.example/p/./1",
        "http://host3.example/q/../p/1",
        "http://host3.example/p/%31",
    ]
    assert len(set(canonicalize_series(pd.Series(variants)))) == 1


def test_host_of():
    assert host_of("http://example.com:8080/x") == "example.com"
    assert host_of("https://a.b.c/") == "a.b.c"
    assert host_of("") == ""


HTML_DOC = b"""<!DOCTYPE html><html><head>
<title>T&amp;itle</title>
<style>body { color: red; }</style>
<script type="text/javascript">var x = "<p>not text</p>";</script>
</head><body>
<!-- a comment <p>hidden</p> -->
<h1>Hello &lt;World&gt;</h1>
<P CLASS="x">caf&#233; &#x41;B&nbsp;end</P>
<a href="http://other.example/next">link text</a>
</body></html>"""


def test_extract_text_pinned():
    # The pinned golden output — byte-for-byte.
    assert (
        extract_text(HTML_DOC)
        == 'T&itle Hello <World> caf\xe9 AB end link text'
    )


def test_extract_text_series_matches_scalar():
    s = extract_text_series(pd.Series([HTML_DOC, b"", b"<b>x</b>", None]))
    assert list(s) == [extract_text(HTML_DOC), "", "x", ""]


def test_extract_text_str_input():
    assert extract_text("<i>a</i>  b") == "a b"


def test_extract_outlinks():
    html = (
        b'<a href="http://a.example/1">x</a>'
        b"<A HREF='/rel'>y</A>"
        b'<a href="mailto:z@q">no</a>'
        b'<a href="https://b.example/2?q=1">z</a>'
    )
    assert extract_outlinks(html, "http://base.example/dir/page") == [
        "http://a.example/1",
        "http://base.example/rel",
        "https://b.example/2?q=1",
    ]


ROBOTS = """# comment
User-agent: googlebot
Disallow: /google-only

User-agent: *
Disallow: /private
Allow: /private/ok
Crawl-delay: 2.5

User-agent: other
Disallow: /
"""


def test_parse_robots():
    rules, delay = parse_robots(ROBOTS)
    assert (False, "/private") in rules
    assert (True, "/private/ok") in rules
    assert all("/google-only" != p for _, p in rules)
    assert delay == 2.5


def test_robots_matching():
    rules, _ = parse_robots(ROBOTS)
    assert robots_allowed("/public", rules)
    assert not robots_allowed("/private/secret", rules)
    assert robots_allowed("/private/ok/x", rules)  # longest prefix wins
    assert robots_allowed("/", rules)


def test_robots_empty_default_allow():
    rules, delay = parse_robots(None)
    assert rules == [] and delay == 0.0
    assert robots_allowed("/anything", rules)


def test_crawl_delay_series():
    s = crawl_delay_series(pd.Series([ROBOTS, None, "User-agent: *\nCrawl-delay: 1"]))
    assert list(s) == [2.5, 0.0, 1.0]


# ---------------------------------------------------------------------------
# fast-path identity tier (round 5): canonicalize_series's combined-regex
# pass-through must be byte-identical to the full kernel on EVERY input
# ---------------------------------------------------------------------------

import re  # noqa: E402
from html.entities import html5 as _html5_table  # noqa: E402

from hypothesis import example, given, settings, strategies as st  # noqa: E402

from spiderspark.canon import (  # noqa: E402
    _FAST_CASEPORT_RE,
    _FAST_IDENTITY_RE,
    _canonicalize_series_full,
    canonicalize_series,
)


def _parity(urls: list[str]) -> None:
    s = pd.Series(urls, dtype=object)
    fast = canonicalize_series(s)
    full = _canonicalize_series_full(s)
    assert fast.tolist() == full.tolist()


def test_fast_path_parity_representative_mix():
    """The bench generator's URL shapes (clean + every noise class) plus
    edge shapes around each fast-path clause boundary."""
    _parity([
        "http://host3.example/p/123",              # fast
        "http://host3.example/p/123?x=1&y=2",      # fast with query
        "HTTP://HOST3.example/p/123",              # case → slow
        "http://host3.example:80/p/123",           # default port → slow
        "http://host3.example/a/../p/./123",       # dot segments → slow
        "http://host3.example/p/%7e123",           # pct → slow
        "http://h.example/p?",                     # empty query → slow
        "http://h.example/p#frag",                 # fragment → slow
        "http://h.example./p",                     # trailing-dot host → slow
        "http://user@h.example/p",                 # userinfo → slow
        "  http://h.example/p  ",                  # whitespace → slow
        "http://h.example/.well-known/x",          # '/.': guard → slow (conservative)
        "http://h.example/p/..",                   # trailing dot-seg → slow
        "http://h.example/p?q=/../x",              # dot-seg in QUERY → slow (conservative)
        "http://h.example/.?q",                    # dot-seg before '?' (r5 hole) → slow
        "http://h.example/..?q",                   # '..' before '?' → slow
        "http://h.example/a/..?q",                 # mid-path '..' before '?' → slow
        "http://h.example/a/.?x=1",                # '.' before '?' → slow
        "http://h.example/a/..#f",                 # dot-seg before '#' → slow (fragment)
        "http://h.example/.#f",                    # '.' before '#' → slow (fragment)
        "https://h.example/",                      # minimal fast https
        "ftp://h.example/p",                       # non-http scheme → slow
        "host.example/p",                          # schemeless → slow
        "",                                        # empty → slow
        "http://héllo.example/p",                  # IDN → slow
        "http://h_x.example/p",                    # invalid host char → slow
    ])


# derandomize=True: the round-5 dot-segment hole shipped because a sampled
# run happened not to draw the failing shape — with derandomization plus the
# explicit @example pins below, green is reproducible green (VERDICT r05
# item 3). Known counterexamples are pinned forever regardless of sampling.
@settings(max_examples=300, deadline=None, derandomize=True)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=8))
@example(urls=["HTTP://0/.?0"])
def test_fast_path_parity_arbitrary_text(urls):
    _parity(urls)


@settings(max_examples=300, deadline=None, derandomize=True)
@given(st.lists(st.from_regex(_FAST_IDENTITY_RE, fullmatch=True), min_size=1, max_size=8))
@example(urls=["http://0/.?0"])
@example(urls=["http://h/a/..?q", "http://h/..?q", "http://h/.?q"])
def test_fast_path_parity_fast_shaped(urls):
    """Inputs the fast tier actually accepts: fixed-point claim holds."""
    _parity(urls)


@settings(max_examples=300, deadline=None, derandomize=True)
@given(st.lists(st.from_regex(_FAST_CASEPORT_RE, fullmatch=True), min_size=1, max_size=8))
@example(
    urls=[
        "HTTP://0/",
        "HTTP://0/",
        "HTTP://0/",
        "HTTP://0/",
        "HTTP://0/",
        "HTTP://0/.?0",
    ],
)  # round-5 shipped counterexample (Hypothesis patch 2026-08-17--108db1c5)
@example(urls=["HTTP://H.example:80/a/..?q"])
def test_fast_path_parity_caseport_shaped(urls):
    """Inputs the tier-2 cheap-fix pattern accepts (any scheme/host case,
    any :80/:443 port combination — including the NON-default pairs the
    eligibility check must reject to the full kernel)."""
    _parity(urls)


def test_fast_path_trailing_newline_regression():
    """'$' matches before a trailing newline in Python regexes; the identity
    probe must anchor with \\Z so whitespace-stripping rows reach the full
    kernel (caught in round 5 — the tier-1 pattern originally used '$')."""
    _parity(["http://h.example/p\n", "HTTP://h.example:80/p\n", "http://h.example/p\r\n"])


def test_fast_path_parity_caseport_mix():
    """Clause boundaries of the tier-2 eligibility check."""
    _parity([
        "HTTP://HOST5.example:80/p/5",       # bench m5+m7 shape → tier 2
        "HTTPS://Host.Example:443/a?q=1",    # https default port → tier 2
        "hTtP://MiXeD.Case/p",               # case only → tier 2
        "https://h.example:80/p",            # NON-default pair → full kernel
        "HTTP://h.example:443/p",            # NON-default pair → full kernel
        "HTTP://h.example:8080/p",           # other port → full kernel
        "HTTP://HOST.example:80/a/../p",     # caseport + dot-seg → full kernel
        "HTTP://HOST.example:80/p?x=/../y",  # dot-seg in query → full kernel
        "HTTP://HOST.example:80/a/..?q",     # caseport + dot-seg before '?' → full kernel
        "HTTPS://H.example:443/.?q",         # '.' before '?' → full kernel
        "HTTP://h.example:80/p?",            # empty query → full kernel
        "HTTP://-h.example/p",               # leading hyphen host → full kernel
        "HTTPS://A/p",                       # single-char host → tier 2
    ])


def test_extract_text_full_html5_entities():
    """The named-entity pass covers the complete WHATWG ';'-terminated
    table (stdlib html.entities.html5), not a hand-picked subset; unknown
    names and semicolon-less legacy forms stay literal."""
    assert extract_text("a &mdash; b") == "a — b"
    assert extract_text("caf&eacute;") == "caf\xe9"
    assert extract_text("&CounterClockwiseContourIntegral;") == "∳"
    # unknown name: kept raw
    assert extract_text("&notanentity;") == "&notanentity;"
    # legacy semicolon-less form: NOT decoded (unambiguous subset only)
    assert extract_text("x &amp y") == "x &amp y"
    # double-encoded: single pass, no re-decode
    assert extract_text("&amp;lt;") == "&lt;"


@settings(max_examples=200, deadline=None, derandomize=True)
@given(st.sampled_from(sorted(k for k in _html5_table if k.endswith(";"))))
def test_extract_text_html5_property(name):
    """Every ';'-terminated entity in the stdlib table decodes to exactly
    its replacement (modulo the extractor's pinned NBSP→space and
    whitespace collapse), embedded in arbitrary surrounding text."""
    expected = _html5_table[name].replace("\xa0", " ")
    out = extract_text(f"pre &{name} post")
    want = re.sub(r"\s+", " ", f"pre {expected} post").strip()
    assert out == want
