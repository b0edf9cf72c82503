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
