"""Prefix-filter exact set-similarity join (operators/setjoin.py):
completeness + exactness vs a brute-force python reference (the property
the LSH paths can't promise), threshold edges, partition invariance, and
validation."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from mr_crawly_spark.operators.setjoin import similarity_join


def _corpus(spark, n_parts=None):
    rows = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "alpha beta gamma delta zeta"),          # J(0,1) = 4/6
        (2, "alpha beta gamma delta epsilon"),       # J(0,2) = 1.0
        (3, "totally different words here now"),
        (4, "alpha beta gamma delta epsilon extra"), # J(0,4) = 5/6
        (5, "beta alpha  gamma   delta epsilon"),    # same set as 0 -> 1.0
        (6, "zeta eta theta iota kappa"),
        (7, "one two"),
        (8, "one two"),                              # tiny exact dup
        (9, ""),                                     # empty: no tokens
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return df.repartition(n_parts) if n_parts else df


def _brute(rows, t):
    def toks(s):
        return set(s.split())

    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(
        [(r["doc_id"], toks(r["text"])) for r in rows], 2
    ):
        if not ta or not tb:
            continue
        j = len(ta & tb) / len(ta | tb)
        if j >= t:
            out[(min(ia, ib), max(ia, ib))] = round(j, 4)
    return out


@pytest.mark.parametrize("t", [0.5, 0.8, 1.0])
def test_similarity_join_complete_and_exact(spark, t):
    df = _corpus(spark)
    want = _brute(df.collect(), t)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in similarity_join(df, threshold=t).collect()
    }
    assert got == want
    if t <= 0.8:
        assert (0, 4) in got  # a genuine near-dup survives


def test_similarity_join_partition_invariant(spark):
    df1 = similarity_join(_corpus(spark, 1), threshold=0.6)
    df8 = similarity_join(_corpus(spark, 8), threshold=0.6)
    assert sorted(map(tuple, df1.collect())) == sorted(map(tuple, df8.collect()))


def test_similarity_join_larger_planted(spark):
    """120 docs: 20 planted near-dup pairs (one token swapped out of 10)
    at J = 9/11 >= 0.8, 80 distinct fillers — all 20 pairs must be found
    with the exact score, nothing else at t=0.8."""
    rows = []
    for i in range(20):
        base = [f"w{i}_{j}" for j in range(10)]
        rows.append((i * 2, " ".join(base)))
        rows.append((i * 2 + 1, " ".join(base[:-1] + [f"swap{i}"])))
    for i in range(80):
        rows.append((1000 + i, " ".join(f"f{i}_{j}" for j in range(10))))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in similarity_join(df, threshold=0.8).collect()
    }
    want = {(i * 2, i * 2 + 1): round(9 / 11, 4) for i in range(20)}
    assert got == want


def test_similarity_join_shingle_complete_and_exact(spark):
    """shingle=3 compares distinct word-3-gram SETS — brute-force
    reference recomputed on shingles (small-vocab corpora make unigram
    prefixes degenerate; shingling is the production mode there)."""
    rows = [
        (0, "a b c d e f g h"),
        (1, "a b c d e f g h x"),     # one appended word: J = 6/7
        (2, "a b c d e f g h"),       # exact dup: J = 1.0
        (3, "p q r s t u v w"),
        (4, "x a b c d e f g h"),     # one prepended word: J = 6/7
        (5, "a b"),                   # shorter than the shingle: no grams
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    def grams(s, n=3):
        w = s.split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(
        [(i, grams(t)) for i, t in rows], 2
    ):
        if not ta or not tb:
            continue
        j = len(ta & tb) / len(ta | tb)
        if j >= 0.8:
            want[(min(ia, ib), max(ia, ib))] = round(j, 4)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in similarity_join(df, threshold=0.8, shingle=3).collect()
    }
    assert got == want
    assert (0, 1) in got and (0, 4) in got  # genuine near-dups survive


def test_similarity_join_validation(spark):
    with pytest.raises(ValueError):
        similarity_join(_corpus(spark), threshold=0.0)
    with pytest.raises(ValueError):
        similarity_join(_corpus(spark), threshold=1.2)
    with pytest.raises(ValueError):
        similarity_join(_corpus(spark), shingle=0)


def test_similarity_join_plan_has_no_product(spark):
    """The prefix rewrite must keep every join an equi-join — no
    CartesianProduct / BroadcastNestedLoopJoin anywhere in the plan."""
    plan = (
        similarity_join(_corpus(spark), threshold=0.8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
