"""Bloom prefilter contract (D2, SURVEY.md §7.4): zero false negatives,
prefilter-only — the Bloom path returns EXACTLY the anti-join's rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from mr_crawly_spark.functions.urls import url_hash_col
from mr_crawly_spark.operators import seen as seen_ops


def _with_hash(df):
    return df.withColumn("url_hash", url_hash_col(F.col("url")))


def test_bloom_path_equals_exact_antijoin(spark):
    seen = _with_hash(
        spark.createDataFrame(
            [(f"https://h{i % 7}.test/p/{i}",) for i in range(500)], "url string"
        )
    )
    # candidates: half overlap seen, half fresh
    cands = _with_hash(
        spark.createDataFrame(
            [(f"https://h{i % 7}.test/p/{i}",) for i in range(250, 750)],
            "url string",
        )
    )
    exact = {
        r["url"] for r in seen_ops.filter_unseen(cands, seen).collect()
    }
    n_buckets = 8
    m, k = seen_ops.bloom_params(500, fpp=0.05)
    blooms = seen_ops.build_bucket_blooms(seen, n_buckets, m, k)
    got = {
        r["url"]
        for r in seen_ops.filter_unseen(
            cands, seen, blooms, n_buckets, m, k
        ).collect()
    }
    assert got == exact
    assert got == {f"https://h{i % 7}.test/p/{i}" for i in range(500, 750)}


def test_bloom_no_false_negatives(spark):
    """Every seen url must probe positive (the safety property)."""
    seen = _with_hash(
        spark.createDataFrame(
            [(f"https://x.test/{i}",) for i in range(1000)], "url string"
        )
    )
    n_buckets = 4
    m, k = seen_ops.bloom_params(1000, fpp=0.01)
    blooms = seen_ops.build_bucket_blooms(seen, n_buckets, m, k)
    probed = seen_ops.bloom_prefilter(seen, blooms, n_buckets, m, k)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_sidecar_roundtrip(spark, tmp_path):
    seen = _with_hash(
        spark.createDataFrame([(f"https://x.test/{i}",) for i in range(100)], "url string")
    )
    m, k = seen_ops.bloom_params(100)
    blooms = seen_ops.build_bucket_blooms(seen, 4, m, k)
    path = str(tmp_path / "bloom")
    seen_ops.write_bloom_sidecar(spark, blooms, path)
    assert seen_ops.read_bloom_sidecar(spark, path) == blooms
