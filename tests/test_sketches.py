"""HyperLogLog (operators/sketches.py): accuracy envelope, register
mergeability (the incremental/resumable contract), both estimator paths,
and parameter validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mr_crawly_spark.operators.sketches import (
    hll_distinct,
    hll_estimate,
    hll_registers,
)


def _ids(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("item-"), F.col("id").cast("string")).alias("v")
    )


def test_hll_accuracy_within_standard_error_envelope(spark):
    """50k deterministic distincts at b=12 (sigma = 1.04/sqrt(4096) =
    1.6%): the estimate must land within 3 sigma. Deterministic hash ->
    this is a fixed number, not a flaky draw."""
    est = hll_distinct(_ids(spark, 0, 50_000), "v", b=12).collect()[0]
    assert est["m"] == 4096
    assert abs(est["est"] - 50_000) / 50_000 < 0.05


def test_hll_duplicates_do_not_inflate(spark):
    """The multiset {0..999} x 7 must estimate ~1000, not ~7000."""
    dup = _ids(spark, 0, 1000)
    for _ in range(3):
        dup = dup.unionByName(_ids(spark, 0, 1000))
    est = hll_distinct(dup, "v", b=12).collect()[0]["est"]
    assert abs(est - 1000) / 1000 < 0.06


def test_hll_register_merge_equals_single_pass(spark):
    """Sketch two disjoint shards separately, merge registers by
    unionByName + max — the estimate must be BIT-identical to sketching
    the union in one pass (the property that makes the sketch
    incremental across days/shards/streams)."""
    a = hll_registers(_ids(spark, 0, 20_000), "v", b=11)
    b = hll_registers(_ids(spark, 15_000, 40_000), "v", b=11)  # overlap too
    merged = (
        a.unionByName(b)
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("rho"))
    )
    one_pass = hll_registers(_ids(spark, 0, 40_000), "v", b=11)
    est_merged = hll_estimate(merged, b=11).collect()[0]
    est_one = hll_estimate(one_pass, b=11).collect()[0]
    assert tuple(est_merged) == tuple(est_one)


def test_hll_linear_counting_small_range(spark):
    """A 40-distinct input at b=12 leaves most registers empty: the
    linear-counting branch must fire and be near-exact there."""
    est = hll_distinct(_ids(spark, 0, 40), "v", b=12).collect()[0]
    assert est["v_empty"] >= 4096 - 40
    assert abs(est["est"] - 40) <= 2


def test_hll_register_table_is_bounded(spark):
    regs = hll_registers(_ids(spark, 0, 30_000), "v", b=8)
    assert regs.count() <= 256


def test_hll_b_out_of_range_raises(spark):
    with pytest.raises(ValueError, match="b must be"):
        hll_registers(_ids(spark, 0, 10), "v", b=2)


# ---- count-min sketch ---------------------------------------------------- #


def _skewed(spark):
    """Zipf-ish multiset: value j appears ~(60 // (j+1)) times."""
    rows = [(f"v{j}",) for j in range(40) for _ in range(60 // (j + 1))]
    return spark.createDataFrame(rows, "k string")


def test_cms_never_underestimates_and_is_exact_without_collisions(spark):
    from collections import Counter

    from mr_crawly_spark.operators.sketches import cms_query, cms_tables

    df = _skewed(spark)
    truth = Counter(r["k"] for r in df.collect())
    # w >> distinct values: collisions are possible but rare; estimates
    # must NEVER be below truth, and the heavy hitter must be exact-ish
    t = cms_tables(df, "k", d=4, w=4096)
    est = {
        r["k"]: r["est"]
        for r in cms_query(t, df.distinct(), "k", d=4, w=4096).collect()
    }
    assert set(est) == set(truth)
    for k, c in truth.items():
        assert est[k] >= c, (k, est[k], c)
    assert est["v0"] == truth["v0"]


def test_cms_overestimate_bound_under_collisions(spark):
    """w=16 forces heavy collisions on 40 keys: estimates still never
    drop below truth, and min-over-d keeps the error within the e*N/w
    envelope (N=233, w=16 -> eN/w ~ 40)."""
    from collections import Counter

    from mr_crawly_spark.operators.sketches import cms_query, cms_tables

    df = _skewed(spark)
    truth = Counter(r["k"] for r in df.collect())
    n = sum(truth.values())
    t = cms_tables(df, "k", d=4, w=16)
    est = {
        r["k"]: r["est"]
        for r in cms_query(t, df.distinct(), "k", d=4, w=16).collect()
    }
    for k, c in truth.items():
        assert est[k] >= c
        assert est[k] - c <= 2.72 * n / 16 + 1


def test_cms_table_merge_equals_single_pass(spark):
    """Sum-merge of shard tables must be bit-identical to one pass —
    counts are exact longs, so this is equality, not approximation."""
    from pyspark.sql import functions as F

    from mr_crawly_spark.operators.sketches import cms_query, cms_tables

    df = _skewed(spark)
    t_full = cms_tables(df, "k", d=3, w=64)
    # two disjoint deterministic halves by key parity
    left = df.filter(F.substring("k", 2, 10).cast("int") % 2 == 0)
    right = df.filter(F.substring("k", 2, 10).cast("int") % 2 == 1)
    merged = (
        cms_tables(left, "k", d=3, w=64)
        .unionByName(cms_tables(right, "k", d=3, w=64))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    q1 = sorted(
        map(tuple, cms_query(merged, df.distinct(), "k", d=3, w=64).collect())
    )
    q2 = sorted(
        map(tuple, cms_query(t_full, df.distinct(), "k", d=3, w=64).collect())
    )
    assert q1 == q2
    assert t_full.count() <= 3 * 64


def test_cms_params_validated(spark):
    import pytest as _pt

    from mr_crawly_spark.operators.sketches import cms_tables

    with _pt.raises(ValueError, match="d >= 1"):
        cms_tables(_skewed(spark), "k", d=0, w=8)


def test_hll_empty_input_estimates_zero(spark):
    from mr_crawly_spark.operators.sketches import hll_distinct

    est = hll_distinct(
        spark.createDataFrame([], "v string"), "v", b=8
    ).collect()[0]
    assert (est["m"], est["v_empty"], est["est"]) == (256, 256, 0.0)
