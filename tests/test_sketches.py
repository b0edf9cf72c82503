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
