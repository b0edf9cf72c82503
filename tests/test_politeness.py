"""Robots gate (F2/J4, quirk B15) + politeness budgets (O3/F7) unit tests —
Spark matcher vs the oracle's reference implementation on the same rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from mr_crawly_spark import schemas as S
from mr_crawly_spark.datagen import generate_corpus, host_budget
from mr_crawly_spark.functions.urls import url_host_col
from mr_crawly_spark.operators.politeness import (
    DEFAULT_K_HOST,
    host_budgets,
    robots_gate,
)
from oracle.crawler import OracleCrawler


def test_robots_gate_matches_oracle(spark, corpus):
    oracle = OracleCrawler(corpus)
    urls = sorted(d["doc_id"] for d in corpus.documents)[:400]
    urls += [f"https://{h}/sitemap-index.xml" for h in corpus.hosts]  # bypass quirk
    urls += [f"https://unknown{i}.test/private/1" for i in range(3)]  # no rules
    cand = spark.createDataFrame([(u,) for u in urls], "url string").withColumn(
        "host", url_host_col(F.col("url"))
    )
    robots = spark.createDataFrame(
        [(r["host"], r["rule_order"], r["allow"], r["path_prefix"], r["crawl_delay"])
         for r in corpus.robots],
        schema=S.ROBOTS,
    )
    got = {r["url"]: r["allowed"] for r in robots_gate(cand, robots).collect()}
    want = {u: oracle.robots_allows(u) for u in urls}
    assert got == want
    assert not all(want.values())   # some are actually denied
    assert any("sitemap" in u and want[u] for u in urls)


def test_host_budgets_match_formula(spark, corpus):
    robots = spark.createDataFrame(
        [(r["host"], r["rule_order"], r["allow"], r["path_prefix"], r["crawl_delay"])
         for r in corpus.robots],
        schema=S.ROBOTS,
    )
    got = {r["host"]: r["k_host"] for r in host_budgets(robots).collect()}
    for host in {r["host"] for r in corpus.robots}:
        assert got[host] == host_budget(corpus.crawl_delay(host))
    # default for rule-less hosts
    assert DEFAULT_K_HOST == host_budget(10.0)


def test_hot_host_skew_exists(corpus):
    """Datagen contract: one host holds >=30% of pages (salting is tested
    against real skew, not uniform data)."""
    from collections import Counter

    hosts = Counter(d["doc_id"].split("/")[2] for d in corpus.documents)
    top = hosts.most_common(1)[0][1]
    assert top / sum(hosts.values()) >= 0.30


def test_generate_corpus_deterministic():
    a = generate_corpus(n_hosts=3, base_pages=6)
    b = generate_corpus(n_hosts=3, base_pages=6)
    assert a.documents == b.documents
    assert a.robots == b.robots
    assert a.sitemaps_raw == b.sitemaps_raw
    assert a.seeds == b.seeds
