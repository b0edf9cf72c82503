"""Freshness / recrawl scheduling (operators/freshness.py): the Cho &
Garcia-Molina TODS'03 bias-reduced Poisson change-rate estimator checked
against a direct python replay, plus the estimator's edge classes and
partition invariance."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mr_crawly_spark.operators import freshness as FR

NOW = 100000.0


def _visits(spark, rows):
    return spark.createDataFrame(rows, "url string, visit_ts double, fingerprint string")


def _py_rate(ts_fp: list[tuple[float, str]]):
    """Direct replay of the paper's estimator on one url's history."""
    ts_fp = sorted(ts_fp)
    n = len(ts_fp) - 1
    if n < 1:
        return None
    x = sum(1 for a, b in zip(ts_fp, ts_fp[1:]) if a[1] != b[1])
    span = ts_fp[-1][0] - ts_fp[0][0]
    if span <= 0:
        return None
    ibar = span / n
    return round(-math.log((n - x + 0.5) / (n + 0.5)) / ibar, 8)


def _full(spark, rows):
    out = FR.recrawl_priorities(
        FR.change_rates(FR.change_stats(_visits(spark, rows))), NOW
    )
    return {r["url"]: r.asDict() for r in out.collect()}


def test_matches_python_reference(spark):
    rows = []
    # u_hot changes every visit, u_cold never, u_mid on visits 0/1 vs 2/3
    hist = {
        "u_hot": [(0.0, "a"), (3600.0, "b"), (7200.0, "c"), (10800.0, "d")],
        "u_cold": [(0.0, "a"), (3600.0, "a"), (7200.0, "a")],
        "u_mid": [(0.0, "a"), (3600.0, "a"), (7200.0, "b"), (10800.0, "b")],
    }
    for u, h in hist.items():
        rows += [(u, t, fp) for t, fp in h]
    got = _full(spark, rows)
    for u, h in hist.items():
        want = _py_rate(h)
        assert got[u]["change_rate"] == want, u
        age = NOW - max(t for t, _ in h)
        assert got[u]["recrawl_priority"] == round(
            1.0 - math.exp(-want * age), 8
        ), u
    # a never-changed page has rate exactly 0 -> priority exactly 0:
    # it sorts below every page with any change evidence
    assert got["u_cold"]["change_rate"] == 0.0
    assert got["u_cold"]["recrawl_priority"] == 0.0
    # the hot page outranks the mid page which outranks the cold one
    assert (
        got["u_hot"]["recrawl_priority"]
        > got["u_mid"]["recrawl_priority"]
        > got["u_cold"]["recrawl_priority"]
    )


def test_single_visit_and_zero_span_are_null(spark):
    rows = [
        ("u_one", 50.0, "a"),
        ("u_burst", 70.0, "a"),
        ("u_burst", 70.0, "b"),  # two visits at one instant: span == 0
    ]
    got = _full(spark, rows)
    assert got["u_one"]["change_rate"] is None
    assert got["u_one"]["recrawl_priority"] is None
    assert got["u_burst"]["change_rate"] is None


def test_saturated_estimator_is_finite(spark):
    # every comparison saw a change (X == n): the +0.5 continuity
    # correction keeps the estimate finite (the naive MLE diverges)
    rows = [("u", 3600.0 * k, f"f{k}") for k in range(5)]
    got = _full(spark, rows)
    assert got["u"]["change_rate"] == round(-math.log(0.5 / 4.5) / 3600.0, 8)
    # staleness saturates to 1.0 at 8dp after ~24 expected missed changes —
    # the probability itself is < 1, the rounding is the equality here
    assert got["u"]["recrawl_priority"] == 1.0


def test_partition_invariance(spark):
    rows = [
        (f"u{i}", 1000.0 * k, f"f{(i * 7 + k) % 3}")
        for i in range(40)
        for k in range(1 + i % 5)
    ]
    df = _visits(spark, rows)
    a = FR.recrawl_priorities(FR.change_rates(FR.change_stats(df.repartition(1))), NOW)
    b = FR.recrawl_priorities(
        FR.change_rates(FR.change_stats(df.repartition(13, "fingerprint"))), NOW
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_one_shuffle_plan(spark):
    # the lag window and the per-url agg must share the url hash
    # partitioning: exactly ONE Exchange in the whole plan
    df = _visits(spark, [("u", 0.0, "a"), ("u", 1.0, "b")])
    plan = (
        FR.change_rates(FR.change_stats(df))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
