"""Range join (operators/rangejoin.py): containment semantics vs a
brute-force python reference, bucket-width invariance, the no-duplicate
property of the bucketized rewrite, equi-key composition, the fan-out
guard, and the plan shape (hash/merge equi-join, never a
BroadcastNestedLoopJoin / cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mr_crawly_spark.operators.rangejoin import range_join


def _points(spark):
    # 200 points, ids 0..199, value = 3*i mod 997
    return spark.range(0, 200).select(
        F.col("id").alias("pid"), ((F.col("id") * 3) % 997).alias("p")
    )


def _intervals(spark):
    # 60 intervals of varied width, some overlapping, some empty (lo>hi)
    return spark.range(0, 60).select(
        F.col("id").alias("iid"),
        ((F.col("id") * 17) % 500).alias("lo"),
        (((F.col("id") * 17) % 500) + (F.col("id") % 7) * 25 - 5).alias("hi"),
    )


def _brute(points, intervals):
    return {
        (p["pid"], i["iid"])
        for p in points
        for i in intervals
        if i["lo"] <= p["p"] <= i["hi"]
    }


def test_range_join_matches_brute_force(spark):
    pts, ivs = _points(spark), _intervals(spark)
    expect = _brute(pts.collect(), ivs.collect())
    assert expect, "fixture must produce matches"
    got = {
        (r["pid"], r["iid"])
        for r in range_join(pts, ivs, "p", "lo", "hi", bucket_width=50).collect()
    }
    assert got == expect


def test_range_join_bucket_width_invariance_and_no_dups(spark):
    """The result set must not depend on bucket_width, and the rewrite
    must emit each (point, interval) pair exactly once (a pair meets
    only in the point's bucket)."""
    pts, ivs = _points(spark), _intervals(spark)
    results = []
    for w in (7, 50, 1000):
        rows = range_join(pts, ivs, "p", "lo", "hi", bucket_width=w).collect()
        pairs = [(r["pid"], r["iid"]) for r in rows]
        assert len(pairs) == len(set(pairs)), f"duplicates at w={w}"
        results.append(set(pairs))
    assert results[0] == results[1] == results[2]


def test_range_join_equi_keys_compose(spark):
    """With an equi-key, only same-key containment matches."""
    pts = spark.createDataFrame(
        [("u1", 1, 10), ("u1", 2, 50), ("u2", 3, 10)],
        "user string, pid int, p int",
    )
    ivs = spark.createDataFrame(
        [("u1", 100, 0, 20), ("u2", 200, 0, 20)],
        "user string, iid int, lo int, hi int",
    )
    got = {
        (r["user"], r["pid"], r["iid"])
        for r in range_join(
            pts, ivs, "p", "lo", "hi", bucket_width=16, on="user"
        ).collect()
    }
    assert got == {("u1", 1, 100), ("u2", 3, 200)}


def test_range_join_inclusive_ends_and_nulls(spark):
    pts = spark.createDataFrame(
        [(1, 0), (2, 10), (3, 11), (4, None)], "pid int, p int"
    )
    ivs = spark.createDataFrame([(9, 0, 10)], "iid int, lo int, hi int")
    got = {
        (r["pid"], r["iid"])
        for r in range_join(pts, ivs, "p", "lo", "hi", bucket_width=4).collect()
    }
    assert got == {(1, 9), (2, 9)}


def test_range_join_fanout_guard_fires_executor_side(spark):
    """A mis-sized bucket_width (interval spans > max_fanout buckets)
    must abort with the raise_error message, not silently explode."""
    pts = spark.createDataFrame([(1, 5)], "pid int, p int")
    ivs = spark.createDataFrame([(9, 0, 10_000)], "iid int, lo int, hi int")
    with pytest.raises(Exception, match="range_join: interval spans"):
        range_join(
            pts, ivs, "p", "lo", "hi", bucket_width=1, max_fanout=100
        ).collect()


def test_range_join_validation(spark):
    pts = spark.createDataFrame([(1, 5)], "pid int, p int")
    ivs = spark.createDataFrame([(9, 0, 10)], "iid int, lo int, hi int")
    with pytest.raises(ValueError):
        range_join(pts, ivs, "p", "lo", "hi", bucket_width=0)
    with pytest.raises(ValueError):
        range_join(pts, ivs, "p", "lo", "hi", bucket_width=1, max_fanout=0)
    bad = spark.createDataFrame([(1, 5, 7)], "pid int, p int, iid int")
    with pytest.raises(ValueError, match="collision"):
        range_join(bad, ivs, "p", "lo", "hi", bucket_width=1)


def test_range_join_plan_is_an_equi_join(spark):
    """The whole point of the rewrite: the physical plan must be a hash
    or sort-merge join on the bucket key — never BroadcastNestedLoopJoin
    or CartesianProduct, which is what Spark plans for a raw BETWEEN
    join."""
    pts, ivs = _points(spark), _intervals(spark)
    plan = (
        range_join(pts, ivs, "p", "lo", "hi", bucket_width=50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert any(
        j in plan
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    ), plan
    # and the raw BETWEEN join really is the bad plan we claim to avoid
    raw = (
        pts.join(ivs, (ivs["lo"] <= pts["p"]) & (pts["p"] <= ivs["hi"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in raw or "CartesianProduct" in raw
