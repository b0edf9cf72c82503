"""Backward as-of join (operators/asof.py): hand-checked semantics vs the
pandas merge_asof contract — greatest right ts <= left ts, inclusive ties,
null when no prior row, tolerance cutoff."""

from __future__ import annotations

import datetime as dt

import pytest

from mr_crawly_spark.operators.asof import asof_join


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _t(5)),   # matches r@5 (inclusive tie)
            (2, "k1", _t(4)),   # matches r@1
            (3, "k1", _t(0)),   # before everything -> null
            (4, "k2", _t(30)),  # matches r@10
            (5, "k3", _t(9)),   # key with no right rows -> null
        ],
        "event_id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", _t(1), "a"),
            ("k1", _t(5), "b"),
            ("k2", _t(10), "c"),
        ],
        "k string, rts timestamp, label string",
    )
    return left, right


def test_asof_backward_inclusive_semantics(spark, sides):
    left, right = sides
    got = {
        r["event_id"]: (r["label"], r["rts"])
        for r in asof_join(left, right, on="k", right_ts="rts").collect()
    }
    assert got[1] == ("b", _t(5))     # equal ts matches (>= contract)
    assert got[2] == ("a", _t(1))
    assert got[3] == (None, None)
    assert got[4] == ("c", _t(10))
    assert got[5] == (None, None)


def test_asof_tolerance_nulls_stale_matches(spark, sides):
    left, right = sides
    got = {
        r["event_id"]: r["label"]
        for r in asof_join(
            left, right, on="k", right_ts="rts", tolerance_sec=5
        ).collect()
    }
    assert got[1] == "b"   # gap 0 <= 5
    assert got[2] == "a"   # gap 3 <= 5
    assert got[4] is None  # gap 20 > 5: match exists but is stale
    assert got[3] is None and got[5] is None


def test_asof_column_collision_raises(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="collision"):
        asof_join(left, right.withColumnRenamed("label", "ts"), on="k",
                  right_ts="rts")


def test_asof_partition_invariance(spark):
    left = spark.createDataFrame(
        [(i, f"k{i % 5}", _t(i % 50)) for i in range(200)],
        "event_id long, k string, ts timestamp",
    )
    import pyspark.sql.functions as F

    right = (
        spark.createDataFrame(
            [(f"k{j % 5}", _t(j * 3 % 47), j) for j in range(40)],
            "k string, rts timestamp, rid long",
        )
        # deterministic unique-(k, ts) contract: max rid per group, NOT
        # dropDuplicates (which keeps an arbitrary row and would flake)
        .groupBy("k", "rts")
        .agg(F.max("rid").alias("rid"))
    )
    a = sorted(map(tuple, asof_join(left, right, on="k", right_ts="rts").collect()))
    b = sorted(
        map(
            tuple,
            asof_join(
                left.repartition(13), right.repartition(7), on="k",
                right_ts="rts"
            ).collect(),
        )
    )
    assert a == b


def test_asof_right_without_value_columns_raises(spark, sides):
    left, _right = sides
    bare = left.sparkSession.createDataFrame([("k1",)], "k string")
    with pytest.raises(ValueError, match="no non-key columns"):
        asof_join(left, bare, on="k", right_ts="rts")
