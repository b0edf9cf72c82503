"""Triangle counting / clustering coefficient (operators/graph.py):
degree-ordered exact counts vs a brute-force python reference."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from mr_crawly_spark.operators.graph import triangle_count, triangle_stats


def _ref(edge_list):
    adj: dict[int, set[int]] = {}
    for s, d in edge_list:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    tri = {n: 0 for n in adj}
    total = 0
    for trio in combinations(sorted(adj), 3):
        a, b, c = trio
        if b in adj[a] and c in adj[a] and c in adj[b]:
            total += 1
            for n in trio:
                tri[n] += 1
    out = {}
    for n in adj:
        d = len(adj[n])
        cc = round(2.0 * tri[n] / (d * (d - 1)), 4) if d >= 2 else 0.0
        out[n] = (d, tri[n], cc)
    return out, total


CASES = [
    # triangle + pendant
    [(1, 2), (2, 3), (3, 1), (3, 4)],
    # 4-clique (4 triangles) + disjoint path (0)
    list(combinations([1, 2, 3, 4], 2)) + [(10, 11), (11, 12)],
    # duplicates, both directions, self-loops must collapse
    [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1), (2, 2)],
    # hub: star (no triangles) + one rim edge (1 triangle)
    [(0, i) for i in range(1, 9)] + [(1, 2)],
]


@pytest.mark.parametrize("edge_list", CASES)
def test_matches_bruteforce(spark, edge_list):
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r["node"]: (r["degree"], r["n_tri"], r["clustering"])
        for r in triangle_stats(df).collect()
    }
    want, total = _ref(edge_list)
    assert got == want
    assert triangle_count(df) == total


def test_larger_pseudorandom_graph(spark):
    # deterministic pseudo-random graph + planted 5-clique
    edge_list = [((i * i + 7) % 60, (i * 13 + 3) % 60) for i in range(300)]
    edge_list += list(combinations([100, 101, 102, 103, 104], 2))
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r["node"]: (r["degree"], r["n_tri"], r["clustering"])
        for r in triangle_stats(df).collect()
    }
    want, total = _ref(edge_list)
    assert got == want
    assert total > 10  # non-vacuous
    # the planted clique's corners each touch C(4,2)=6 triangles, cc=1.0
    for n in (100, 101, 102, 103, 104):
        assert got[n] == (4, 6, 1.0)


def test_partition_invariance(spark):
    edge_list = [((i * 3 + 1) % 25, (i * 11 + 4) % 25) for i in range(120)]
    df = spark.createDataFrame(edge_list, "src long, dst long")
    a = sorted(map(tuple, triangle_stats(df).collect()))
    b = sorted(map(tuple, triangle_stats(df.repartition(13)).collect()))
    assert a == b


def test_no_cartesian_in_plan(spark):
    edge_list = [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(edge_list, "src long, dst long")
    plan = (
        triangle_stats(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_empty_and_edgeless(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert triangle_stats(df).count() == 0
    assert triangle_count(df) == 0
    loops = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    assert triangle_stats(loops).count() == 0
