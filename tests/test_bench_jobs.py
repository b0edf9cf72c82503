"""The bench job's JVM-side canonical twin must agree with the real
canonicalizer — otherwise the benchmarked anti-join hit rate is fiction."""

from __future__ import annotations

from pyspark.sql import functions as F

from mr_crawly_spark.bench_jobs import frontier_throughput_job


def test_frontier_job_canonical_twin_consistency(spark):
    r = frontier_throughput_job(
        spark, n_candidates=60_000, n_hosts=50, per_host_budget=64
    )
    # half the targets are pre-seen; dedup + anti-join leave a stable count
    assert 0 < r["n_ready"] < 60_000
    assert r["urls_per_sec"] > 0


def test_bench_href_forms_canonicalize_correctly(spark):
    from mr_crawly_spark.functions.urls import canonicalize_url

    host = "site7.test"
    base = f"https://{host}/p/123"
    n_targets = 1000
    for i in range(12):
        t = (i * 7 + 1) % n_targets
        form = i % 6
        href = [
            f"../p/{t}",
            f"/p/{t}",
            f"https://{host}:443/p/{t}#frag",
            f"https://{host}/p/{t}",
            f"../p/{t}?x=%7e",
            f"/p/{t}#s",
        ][form]
        want = f"https://{host}/p/{t}" + ("?x=~" if form == 4 else "")
        assert canonicalize_url(base, href) == want, (form, href)
