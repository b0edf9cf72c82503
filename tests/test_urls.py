"""Golden-pair tests for the RFC-3986 canonicalizer (P2/P3)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mr_crawly_spark.functions.urls import (
    canonicalize_udf,
    canonicalize_url,
    url_hash_col,
)

CASES = [
    # (base, href, expected)
    # urljoin resolves relative to the base *directory* (/p/), not the page
    ("https://a.test/p/1", "p/2", "https://a.test/p/p/2"),
    ("https://a.test/p/1", "/p/3", "https://a.test/p/3"),
    ("https://a.test/p/1", "../q/4", "https://a.test/q/4"),
    ("https://a.test/x/y/z", "../../w", "https://a.test/w"),
    ("https://a.test/p/1", "https://a.test:443/p/5#frag", "https://a.test/p/5"),
    ("http://a.test/", "http://a.test:80/q", "http://a.test/q"),
    ("http://a.test/", "http://a.test:8080/q", "http://a.test:8080/q"),
    ("https://a.test/", "HTTPS://A.Test/Q", "https://a.test/Q"),  # path case kept
    ("https://a.test/p/1", "/p?a=%7e", "https://a.test/p?a=~"),   # unreserved decoded
    ("https://a.test/p/1", "/p%2Fq", "https://a.test/p%2Fq"),     # reserved kept, upper
    ("https://a.test/p/1", "/p%2fq", "https://a.test/p%2Fq"),
    ("https://a.test/p/1", "https://b.test", "https://b.test/"),  # empty path -> /
    ("https://a.test/p/1", "mailto:x@y.z", None),                 # non-http dropped
    ("https://a.test/p/1", "", None),
    ("https://a.test/p/1", "  /sp  ", "https://a.test/sp"),
    (None, "https://a.test/p/9", "https://a.test/p/9"),
]


@pytest.mark.parametrize("base,href,expected", CASES)
def test_canonicalize_scalar(base, href, expected):
    assert canonicalize_url(base, href) == expected


def test_canonicalize_udf_matches_scalar(spark):
    pdf = pd.DataFrame(
        {"base": [c[0] for c in CASES], "href": [c[1] for c in CASES]}
    )
    df = spark.createDataFrame(pdf).withColumn(
        "canon", canonicalize_udf(F.col("base"), F.col("href"))
    )
    got = [r["canon"] for r in df.collect()]
    assert got == [c[2] for c in CASES]


def test_url_hash_is_stable_and_distinct(spark):
    urls = [f"https://h{i}.test/p/{i}" for i in range(100)]
    df = spark.createDataFrame([(u,) for u in urls], "url string").withColumn(
        "h", url_hash_col(F.col("url"))
    )
    rows = df.collect()
    again = dict((r["url"], r["h"]) for r in df.collect())
    assert len({r["h"] for r in rows}) == 100  # no collisions at this size
    for r in rows:
        assert again[r["url"]] == r["h"]  # deterministic across actions


def test_bpe_token_count_splits_punct_and_digits(spark):
    """Task brief: BPE-ish regex counting — punctuation and digit runs are
    their own pieces, unlike whitespace words."""
    from pyspark.sql import functions as F

    from mr_crawly_spark.functions.text import token_count, token_count_bpe

    df = spark.createDataFrame(
        [("Hello, world! v2.0 costs $15.99",), ("plain words only",)],
        "text string",
    )
    rows = df.select(
        token_count(F.col("text")).alias("ws"),
        token_count_bpe(F.col("text")).alias("bpe"),
    ).collect()
    # "Hello","," ," world","!"," v","2",".","0"," costs"," $","15",".","99"
    assert (rows[0]["ws"], rows[0]["bpe"]) == (5, 13)
    assert (rows[1]["ws"], rows[1]["bpe"]) == (3, 3)  # letters-only: equal


def test_url_param_count_first_question_mark(spark):
    """The query string is everything after the FIRST '?' (RFC 3986): a
    second '?' inside a query value must not reset the count."""
    from pyspark.sql import functions as F

    from mr_crawly_spark.functions.urls import url_param_count_col

    d = spark.createDataFrame(
        [("https://h.test/p?a=1&b=2?c=3",),
         ("https://h.test/p?x=1",),
         ("https://h.test/p",)],
        "url string",
    )
    got = [r[0] for r in d.select(url_param_count_col(F.col("url"))).collect()]
    assert got == [2, 1, 0]
