"""Inverted-index retrieval (operators/search.py): blocked postings build
+ DAAT top-k whose results must equal direct whole-corpus scoring."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from mr_crawly_spark.operators.search import (
    build_inverted_index,
    search_topk,
)

DOCS = [
    (1, "spark shuffle join spark spark"),
    (2, "join filter scan"),
    (3, "spark scan scan window"),
    (4, "window window window shuffle"),
    (5, "unrelated words only here"),
    (6, "spark join"),
    (7, "   "),  # whitespace-only: contributes nothing
    (8, "SPARK Join MiXeD case"),  # tokenization lowercases
]


def _block(doc_id, n_blocks):
    h = int(hashlib.md5(f"blk|{doc_id}".encode()).hexdigest()[:15], 16)
    return h % 1_000_000 % n_blocks


def _ref_tf(rows):
    out: dict[tuple[str, int], int] = {}
    for doc_id, text in rows:
        for t in text.strip().lower().split():
            if not text.strip():
                continue
            out[(t, doc_id)] = out.get((t, doc_id), 0) + 1
    return out


def _quant(x: float) -> Decimal:
    return Decimal(x).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def _ref_topk(rows, terms, n_docs, k, require_all=False):
    tf = _ref_tf(rows)
    terms = sorted(set(terms))
    dfreq = {t: sum(1 for (tt, _) in tf if tt == t) for t in terms}
    idf = {t: math.log((n_docs + 1.0) / (dfreq[t] + 1.0)) + 1.0 for t in terms}
    scores: dict[int, Decimal] = {}
    hits: dict[int, int] = {}
    for (t, d), f in tf.items():
        if t in idf:
            scores[d] = scores.get(d, Decimal(0)) + _quant(f * idf[t])
            hits[d] = hits.get(d, 0) + 1
    res = [
        (d, hits[d], float(s))
        for d, s in scores.items()
        if not require_all or hits[d] == len(terms)
    ]
    res.sort(key=lambda r: (-r[2], r[0]))
    return res[:k]


def test_index_structure(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_inverted_index(df, n_doc_blocks=4).collect()
    tf = _ref_tf(DOCS)
    # every (term, block) row: postings sorted, df_block == |postings|,
    # tf values exact, block assignment is the md5 rule
    seen = {}
    for r in idx:
        assert r["df_block"] == len(r["postings"])
        ids = [p["doc_id"] for p in r["postings"]]
        assert ids == sorted(ids)
        for p in r["postings"]:
            assert _block(p["doc_id"], 4) == r["block"]
            assert tf[(r["term"], p["doc_id"])] == p["tf"]
            seen[(r["term"], p["doc_id"])] = p["tf"]
    assert seen == tf  # complete: every (term, doc) appears exactly once
    # blocks partition docs: corpus df == sum of df_block
    spark_df = {}
    for r in idx:
        spark_df[r["term"]] = spark_df.get(r["term"], 0) + r["df_block"]
    ref_df = {}
    for t, _ in tf:
        ref_df[t] = ref_df.get(t, 0) + 1
    assert spark_df == ref_df


def test_search_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    n = df.filter(F.length(F.trim("text")) > 0).count()
    idx = build_inverted_index(df, n_doc_blocks=4)
    got = [
        (r["doc_id"], r["n_terms"], r["score"])
        for r in search_topk(idx, ["spark", "join"], n_docs=n, k=5).collect()
    ]
    assert got == _ref_topk(DOCS, ["spark", "join"], n, 5)
    # conjunctive AND: only docs with BOTH terms
    got_and = [
        (r["doc_id"], r["n_terms"], r["score"])
        for r in search_topk(
            idx, ["spark", "join"], n_docs=n, k=5, require_all=True
        ).collect()
    ]
    assert got_and == _ref_topk(DOCS, ["spark", "join"], n, 5, require_all=True)
    assert {d for d, _, _ in got_and} == {1, 6, 8}
    # duplicate query terms dedupe
    got_dup = [
        (r["doc_id"], r["n_terms"], r["score"])
        for r in search_topk(
            idx, ["spark", "spark", "join"], n_docs=n, k=5
        ).collect()
    ]
    assert got_dup == got


def test_search_equals_direct_scoring(spark):
    """Index-path top-k == scoring every document directly (completeness:
    the index loses nothing), on the real documents table."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    n = sum(1 for _, t in rows if t.strip())
    idx = build_inverted_index(docs, n_doc_blocks=8)
    terms = ["spark", "shuffle", "join"]
    got = [
        (r["doc_id"], r["n_terms"], r["score"])
        for r in search_topk(idx, terms, n_docs=n, k=20).collect()
    ]
    assert got == _ref_topk(rows, terms, n, 20)
    assert len(got) == 20


def test_search_partition_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    n = 7
    a = search_topk(
        build_inverted_index(df, n_doc_blocks=4), ["spark", "scan"], n, k=4
    ).collect()
    b = search_topk(
        build_inverted_index(df.repartition(9), n_doc_blocks=4),
        ["spark", "scan"],
        n,
        k=4,
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_search_validation_and_misses(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_inverted_index(df, n_doc_blocks=4)
    with pytest.raises(ValueError):
        build_inverted_index(df, n_doc_blocks=0)
    with pytest.raises(ValueError):
        search_topk(idx, [], n_docs=7)
    with pytest.raises(ValueError):
        search_topk(idx, ["spark"], n_docs=7, k=0)
    # unknown term: no postings -> no hits
    assert search_topk(idx, ["zzz-not-here"], n_docs=7, k=3).count() == 0
