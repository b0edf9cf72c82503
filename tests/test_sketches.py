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


# --------------------------------------------------------------------------
# KMV
# --------------------------------------------------------------------------

import math  # noqa: E402

from mr_crawly_spark.operators.sketches import (  # noqa: E402
    dd_merge,
    dd_quantiles,
    dd_sketch,
    kmv_estimate,
    kmv_merge,
    kmv_set_stats,
    kmv_sketch,
)


def test_kmv_exact_below_k(spark):
    """Fewer distincts than k: the sketch IS the distinct set and the
    estimate is exact."""
    sk = kmv_sketch(_ids(spark, 0, 100), "v", k=256)
    assert sk.count() == 100
    row = kmv_estimate(sk, k=256).collect()[0]
    assert row["n_kept"] == 100 and row["est"] == 100.0


def test_kmv_accuracy_above_k(spark):
    """30k distincts at k=512 (sigma ~ 1/sqrt(k) = 4.4%): the
    deterministic hash makes this a fixed number; assert within 3
    sigma. Duplicates must not inflate (sketch is over DISTINCT
    hashes)."""
    base = _ids(spark, 0, 30_000)
    dup = base.unionByName(_ids(spark, 0, 10_000))
    row = kmv_estimate(kmv_sketch(dup, "v", k=512), k=512).collect()[0]
    assert row["n_kept"] == 512
    assert abs(row["est"] - 30_000) / 30_000 < 0.14


def test_kmv_merge_equals_single_pass(spark):
    """Shard sketches merged with kmv_merge must be BIT-identical to
    one pass over the unioned input — the incremental contract."""
    a = kmv_sketch(_ids(spark, 0, 5_000), "v", k=128)
    b = kmv_sketch(_ids(spark, 3_000, 9_000), "v", k=128)  # overlapping
    merged = sorted(r["h"] for r in kmv_merge([a, b], k=128).collect())
    one = sorted(
        r["h"] for r in kmv_sketch(_ids(spark, 0, 9_000), "v", k=128).collect()
    )
    assert merged == one


def test_kmv_set_stats_exact_when_small(spark):
    """Both sets under k: jaccard/intersection/union are EXACT.
    A = {0..599}, B = {400..999}: |A∩B| = 200, |A∪B| = 1000."""
    a = kmv_sketch(_ids(spark, 0, 600), "v", k=2048)
    b = kmv_sketch(_ids(spark, 400, 1000), "v", k=2048)
    row = kmv_set_stats(a, b, k=2048).collect()[0]
    assert row["k_eff"] == 1000
    assert row["union_est"] == 1000.0
    assert row["jaccard_est"] == 0.2
    assert row["inter_est"] == 200.0


def test_kmv_set_stats_estimates_at_scale(spark):
    """20k ∪ 20k with 10k overlap (true J = 1/3) at k=1024: the
    theta-sketch estimates must land within ~3/sqrt(k) of truth."""
    a = kmv_sketch(_ids(spark, 0, 20_000), "v", k=1024)
    b = kmv_sketch(_ids(spark, 10_000, 30_000), "v", k=1024)
    row = kmv_set_stats(a, b, k=1024).collect()[0]
    assert abs(row["jaccard_est"] - 1 / 3) < 0.1
    assert abs(row["union_est"] - 30_000) / 30_000 < 0.14
    assert abs(row["inter_est"] - 10_000) / 10_000 < 0.25


def test_kmv_validation(spark):
    with pytest.raises(ValueError):
        kmv_sketch(_ids(spark, 0, 10), "v", k=1)
    with pytest.raises(ValueError):
        kmv_merge([], k=16)


# --------------------------------------------------------------------------
# DDSketch
# --------------------------------------------------------------------------


def _vals(spark, values):
    return spark.createDataFrame([(float(v),) for v in values], "x double")


def test_dd_relative_error_guarantee(spark):
    """The VLDB'19 Thm-1 contract: every estimated quantile is within a
    (1 ± alpha) factor of the true quantile. 1..10000 at alpha=0.01,
    checked at seven probabilities against numpy-free exact ranks."""
    n = 10_000
    df = spark.range(1, n + 1).select(F.col("id").cast("double").alias("x"))
    alpha = 0.01
    probs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    rows = dd_quantiles(dd_sketch(df, "x", alpha), probs, alpha).collect()
    assert len(rows) == len(probs)
    for r in rows:
        # over 1..n the true q-quantile at rank ceil(p*n) is the rank itself
        true = float(max(1, math.ceil(r["p"] * n)))
        assert abs(r["est"] - true) <= alpha * true + 1e-9, (r["p"], r["est"], true)


def test_dd_merge_equals_single_pass(spark):
    """Shard sketches sum-merged must be bit-identical (bucket, cnt)
    sets to one pass — exact long counts, no float in the build."""
    a = dd_sketch(_vals(spark, range(1, 501)), "x", 0.02)
    b = dd_sketch(_vals(spark, range(300, 1200)), "x", 0.02)
    merged = sorted(
        (r["bucket"], r["cnt"]) for r in dd_merge([a, b]).collect()
    )
    one = sorted(
        (r["bucket"], r["cnt"])
        for r in dd_sketch(
            _vals(spark, list(range(1, 501)) + list(range(300, 1200))), "x", 0.02
        ).collect()
    )
    assert merged == one


def test_dd_sketch_size_is_bounded(spark):
    """100k values spanning 1..10^5 at alpha=0.01: bucket count must be
    O(log_gamma(max/min)) ~ ln(10^5)/ln(1.0202) ~ 575, not O(n)."""
    df = spark.range(1, 100_001).select(F.col("id").cast("double").alias("x"))
    assert dd_sketch(df, "x", 0.01).count() < 700


def test_dd_nonpositive_excluded_and_empty(spark):
    """x <= 0 is outside the sketch domain (documented contract); an
    all-excluded input yields n=0 and null estimates, not a crash."""
    rows = dd_quantiles(
        dd_sketch(_vals(spark, [-3.0, 0.0]), "x", 0.05), [0.5], 0.05
    ).collect()
    assert rows[0]["n"] == 0 and rows[0]["est"] is None


def test_dd_validation(spark):
    df = _vals(spark, [1.0])
    with pytest.raises(ValueError):
        dd_sketch(df, "x", alpha=0.0)
    with pytest.raises(ValueError):
        dd_quantiles(dd_sketch(df, "x", 0.01), [], 0.01)
    with pytest.raises(ValueError):
        dd_quantiles(dd_sketch(df, "x", 0.01), [1.5], 0.01)
    with pytest.raises(ValueError):
        dd_merge([])


# --------------------------------------------------------------------------
# Per-group HLL
# --------------------------------------------------------------------------

from mr_crawly_spark.operators.sketches import (  # noqa: E402
    hll_distinct_by,
    hll_estimate_by,
    hll_registers_by,
)


def _grouped(spark):
    # group g0: 8000 distincts, g1: 400, g2: 1 — spans both estimator paths
    return (
        spark.range(0, 8000)
        .select(F.lit("g0").alias("g"), F.concat(F.lit("a-"), F.col("id")).alias("v"))
        .unionByName(
            spark.range(0, 400).select(
                F.lit("g1").alias("g"), F.concat(F.lit("b-"), F.col("id")).alias("v")
            )
        )
        .unionByName(
            spark.range(0, 50).select(
                F.lit("g2").alias("g"), F.lit("same").alias("v")
            )
        )
    )


def test_hll_by_accuracy_per_group(spark):
    rows = {
        r["g"]: r["est"]
        for r in hll_distinct_by(_grouped(spark), ["g"], "v", b=11).collect()
    }
    assert abs(rows["g0"] - 8000) / 8000 < 0.07
    assert abs(rows["g1"] - 400) / 400 < 0.08
    assert abs(rows["g2"] - 1) < 0.5  # 50 copies of one value


def test_hll_by_merge_equals_single_pass(spark):
    a = hll_registers_by(_grouped(spark), ["g"], "v", b=10)
    b = hll_registers_by(
        spark.range(0, 3000).select(
            F.lit("g0").alias("g"),
            F.concat(F.lit("a-"), (F.col("id") + 6000)).alias("v"),
        ),
        ["g"],
        "v",
        b=10,
    )
    merged = (
        a.unionByName(b)
        .groupBy("g", "bucket")
        .agg(F.max("rho").cast("int").alias("rho"))
    )
    one = hll_registers_by(
        _grouped(spark).unionByName(
            spark.range(0, 3000).select(
                F.lit("g0").alias("g"),
                F.concat(F.lit("a-"), (F.col("id") + 6000)).alias("v"),
            )
        ),
        ["g"],
        "v",
        b=10,
    )
    got = sorted(map(tuple, hll_estimate_by(merged, ["g"], b=10).collect()))
    want = sorted(map(tuple, hll_estimate_by(one, ["g"], b=10).collect()))
    assert got == want


def test_hll_by_validation(spark):
    with pytest.raises(ValueError):
        hll_registers_by(_grouped(spark), [], "v")


# --------------------------------------------------------------------------
# Grouped DDSketch
# --------------------------------------------------------------------------

from mr_crawly_spark.operators.sketches import (  # noqa: E402
    dd_quantiles_by,
    dd_sketch_by,
)


def test_dd_by_relative_error_per_group(spark):
    """Group a: 1..1000, group b: 5000..6000 — per-group medians must
    each land within the alpha envelope of their own group's true
    median, proving no cross-group bleed."""
    df = (
        spark.range(1, 1001)
        .select(F.lit("a").alias("g"), F.col("id").cast("double").alias("x"))
        .unionByName(
            spark.range(5000, 6001).select(
                F.lit("b").alias("g"), F.col("id").cast("double").alias("x")
            )
        )
    )
    rows = {
        (r["g"], r["p"]): r["est"]
        for r in dd_quantiles_by(
            dd_sketch_by(df, ["g"], "x", 0.01), ["g"], [0.5, 0.99], 0.01
        ).collect()
    }
    assert abs(rows[("a", 0.5)] - 500) <= 0.01 * 500 + 1
    assert abs(rows[("b", 0.5)] - 5500) <= 0.01 * 5500 + 1
    assert abs(rows[("a", 0.99)] - 990) <= 0.01 * 990 + 1


def test_dd_by_merge_equals_single_pass(spark):
    a = dd_sketch_by(
        spark.range(1, 500).select(
            F.lit("g").alias("g"), F.col("id").cast("double").alias("x")
        ),
        ["g"], "x", 0.05,
    )
    b = dd_sketch_by(
        spark.range(400, 900).select(
            F.lit("g").alias("g"), F.col("id").cast("double").alias("x")
        ),
        ["g"], "x", 0.05,
    )
    merged = (
        a.unionByName(b).groupBy("g", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    one = dd_sketch_by(
        spark.range(1, 500)
        .union(spark.range(400, 900))
        .select(F.lit("g").alias("g"), F.col("id").cast("double").alias("x")),
        ["g"], "x", 0.05,
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, one.collect())
    )


def test_dd_by_validation(spark):
    df = spark.createDataFrame([("g", 1.0)], "g string, x double")
    with pytest.raises(ValueError):
        dd_sketch_by(df, [], "x", 0.01)
    with pytest.raises(ValueError):
        dd_quantiles_by(dd_sketch_by(df, ["g"], "x", 0.01), ["g"], [], 0.01)
