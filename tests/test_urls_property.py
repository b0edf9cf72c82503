"""Property tests (hypothesis) for the canonicalizer — the single most
load-bearing scalar in the engine (every URL passes through it, and the
oracle shares it, so its invariants ARE the seen-set's invariants)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mr_crawly_spark.functions.urls import canonicalize_url

hosts = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)
paths = st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,8}){0,4}", fullmatch=True)
queries = st.one_of(st.just(""), st.from_regex(r"\?[a-z]{1,4}=[A-Za-z0-9%~]{0,6}", fullmatch=True))
fragments = st.one_of(st.just(""), st.from_regex(r"#[a-z0-9]{0,6}", fullmatch=True))
schemes = st.sampled_from(["http", "https"])


@st.composite
def urls(draw):
    return (
        f"{draw(schemes)}://{draw(hosts)}{draw(paths) or '/'}"
        f"{draw(queries)}{draw(fragments)}"
    )


rel_hrefs = st.one_of(
    st.from_regex(r"(\.\./)*[a-z0-9]{1,6}(/[a-z0-9]{1,6}){0,3}", fullmatch=True),
    st.from_regex(r"/[a-z0-9/]{0,12}", fullmatch=True),
    urls(),
)


@settings(max_examples=300, deadline=None)
@given(base=urls(), href=rel_hrefs)
def test_canonicalize_idempotent(base, href):
    """canonicalize(canonicalize(x)) == canonicalize(x) — without this the
    seen set would admit the same URL twice through different paths."""
    c = canonicalize_url(base, href)
    if c is not None:
        assert canonicalize_url(None, c) == c


@settings(max_examples=300, deadline=None)
@given(base=urls(), href=rel_hrefs)
def test_canonical_form_shape(base, href):
    c = canonicalize_url(base, href)
    if c is None:
        return
    assert c.startswith(("http://", "https://"))
    assert "#" not in c                        # fragments stripped
    rest = c.split("://", 1)[1]
    host = rest.split("/", 1)[0].split(":")[0]
    assert host == host.lower()
    assert "/" in rest or rest == host         # path present (>= "/")
    assert ":80" not in c.split("?")[0] or c.startswith("https")
    assert ":443" not in c.split("?")[0] or c.startswith("http://")


@settings(max_examples=200, deadline=None)
@given(junk=st.text(max_size=40))
def test_canonicalize_never_raises(junk):
    """Arbitrary garbage hrefs must degrade to None or a canonical URL —
    a crawler meets every malformed href the web can produce."""
    out = canonicalize_url("https://a.test/p/1", junk)
    assert out is None or out.startswith(("http://", "https://"))


@settings(max_examples=200, deadline=None)
@given(base=urls())
def test_empty_and_none_href(base):
    assert canonicalize_url(base, "") is None
    assert canonicalize_url(base, None) is None
    assert canonicalize_url(base, "   ") is None


# --------------------------------------------------------------------------
# r06: differential equivalence of the hand-rolled fast canonicalizer vs the
# urllib-built reference path. The fast path's contract is bit-for-bit
# equality on every input it accepts (falling back on the rest), so the
# property IS the correctness proof for the optimization.

from mr_crawly_spark.functions.urls import (  # noqa: E402
    _FALLBACK,
    _canonicalize_fast,
    _canonicalize_url_urllib,
)

messy_hrefs = st.one_of(
    rel_hrefs,
    st.from_regex(
        r"(https?://)?[A-Za-z0-9.:@\-]{0,12}(/[A-Za-z0-9._%~\-]{0,6}){0,3}"
        r"(\?[a-z=%&~]{0,8})?(#[a-z0-9?/]{0,6})?",
        fullmatch=True,
    ),
    st.from_regex(r"(\.{1,3}/){0,3}[a-z0-9%:@.]{0,10}", fullmatch=True),
    st.text(
        alphabet="abz09-._~!$&'()*+,/:=?#%@; \t[]\\",
        max_size=30,
    ),
)


@settings(max_examples=2000, deadline=None)
@given(base=st.one_of(st.none(), urls()), href=messy_hrefs)
def test_fast_path_matches_urllib(base, href):
    href = href.strip()
    if not href:
        return
    fast = _canonicalize_fast(base, href)
    if fast is _FALLBACK:
        return
    assert fast == _canonicalize_url_urllib(base, href)


def test_fast_path_covers_common_shapes():
    """The shapes the engine actually produces must HIT the fast path (a
    regression to fallback would silently triple the hot loop's cost)."""
    cases = [
        ("https://h.test/p/1", "../p/2"),
        ("https://h.test/p/1", "/p/2"),
        ("https://h.test/p/1", "https://h.test:443/p/2#f"),
        ("https://h.test/p/1", "https://h.test/p/2"),
        ("https://h.test/p/1", "../p/2?x=%7e"),
        ("https://h.test/p/1", "/p/2#s"),
        (None, "https://h.test/p/2"),
    ]
    for base, href in cases:
        out = _canonicalize_fast(base, href)
        assert out is not _FALLBACK, (base, href)
        assert out == _canonicalize_url_urllib(base, href)
