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


def _ref_phrase(rows, phrase):
    out = {}
    phrase = [t.lower() for t in phrase]
    for doc_id, text in rows:
        w = text.strip().lower().split()
        n = sum(
            1
            for i in range(len(w) - len(phrase) + 1)
            if w[i : i + len(phrase)] == phrase
        )
        if n:
            out[doc_id] = n
    return out


def test_persisted_index_prunes_partitions(spark, tmp_path):
    from mr_crawly_spark.operators.search import (
        load_index,
        term_bucket_of,
        write_index,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_inverted_index(df, n_doc_blocks=4)
    path = str(tmp_path / "idx")
    write_index(idx, path, n_term_buckets=16)
    loaded, n_buckets = load_index(spark, path)
    assert n_buckets == 16
    # pruned query == in-memory query
    got = search_topk(
        loaded, ["spark", "join"], n_docs=7, k=5, n_term_buckets=n_buckets
    ).collect()
    want = search_topk(idx, ["spark", "join"], n_docs=7, k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # the scan itself is partition-pruned: the bucket literals appear in
    # PartitionFilters (pushed to the directory listing, not a post-scan
    # Filter over all buckets)
    buckets = {term_bucket_of(t, 16) for t in ("spark", "join")}
    plan = (
        loaded.filter(F.col("term_bucket").isin(sorted(buckets)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "term_bucket" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]


def test_load_index_refuses_partial_write(spark, tmp_path):
    import os

    from mr_crawly_spark.operators.search import load_index, write_index

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_inverted_index(df, n_doc_blocks=4)
    path = str(tmp_path / "idx")
    write_index(idx, path, n_term_buckets=8)
    os.remove(os.path.join(path, "_index_geometry.json"))
    with pytest.raises(ValueError, match="geometry"):
        load_index(spark, path)
    with pytest.raises(ValueError):
        write_index(idx, path, n_term_buckets=0)


def test_merge_index_equals_rebuild(spark):
    from mr_crawly_spark.operators.search import merge_index

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    base = build_inverted_index(
        df.filter(F.col("doc_id") % 2 == 0), n_doc_blocks=4
    )
    delta = build_inverted_index(
        df.filter(F.col("doc_id") % 2 == 1), n_doc_blocks=4
    )
    merged = merge_index(base, delta)
    full = build_inverted_index(df, n_doc_blocks=4)

    def snap(d):
        return sorted(
            (
                r["term"],
                r["block"],
                r["df_block"],
                tuple((p["doc_id"], p["tf"]) for p in r["postings"]),
            )
            for r in d.collect()
        )

    assert snap(merged) == snap(full)


def test_positional_index_and_phrase_search(spark):
    from mr_crawly_spark.operators.search import (
        build_positional_index,
        phrase_search,
    )

    rows = DOCS + [
        (9, "join join join scan"),  # overlapping "join join" -> 2
        (10, "scan filter scan filter scan"),  # "scan filter scan" -> 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pidx = build_positional_index(df, n_doc_blocks=4)
    # positions are exact 0-based offsets
    got_pos = {
        (r["term"], p["doc_id"]): list(p["positions"])
        for r in pidx.collect()
        for p in r["postings"]
    }
    for doc_id, text in rows:
        w = text.strip().lower().split() if text.strip() else []
        for t in set(w):
            assert got_pos[(t, doc_id)] == [
                i for i, x in enumerate(w) if x == t
            ]
    for phrase in (
        ["join", "join"],
        ["scan", "filter", "scan"],
        ["spark"],
        ["SPARK", "Join"],  # case-folded
        ["zzz", "spark"],  # absent term -> empty
    ):
        got = {
            r["doc_id"]: r["n_matches"]
            for r in phrase_search(pidx, phrase).collect()
        }
        assert got == _ref_phrase(rows, phrase), phrase
    with pytest.raises(ValueError):
        phrase_search(pidx, [])


def test_phrase_search_partition_invariance(spark):
    from mr_crawly_spark.operators.search import (
        build_positional_index,
        phrase_search,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = phrase_search(
        build_positional_index(df, n_doc_blocks=4), ["spark", "join"]
    ).collect()
    b = phrase_search(
        build_positional_index(df.repartition(7), n_doc_blocks=4),
        ["spark", "join"],
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_index_mor_view_and_compaction(spark, tmp_path):
    from mr_crawly_spark.operators.search import (
        append_index_delta,
        compact_index,
        load_index_view,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    path = str(tmp_path / "mor")
    # three disjoint batches appended as deltas, no base yet
    for i, m in enumerate((0, 1, 2)):
        batch = df.filter(F.col("doc_id") % 3 == m)
        append_index_delta(
            build_inverted_index(batch, n_doc_blocks=4), path, batch_id=i
        )
    full = build_inverted_index(df, n_doc_blocks=4)
    # the UNMERGED view answers searches identically to the full rebuild
    view = load_index_view(spark, path)
    got = search_topk(view, ["spark", "join"], n_docs=7, k=5).collect()
    want = search_topk(full, ["spark", "join"], n_docs=7, k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # compaction folds deltas into the base, postings bit-identical
    n = compact_index(spark, path, n_term_buckets=8)
    assert n == 3
    import os

    assert not os.path.exists(os.path.join(path, "deltas", "delta-0000000000"))

    def snap(d):
        return sorted(
            (
                r["term"],
                r["block"],
                r["df_block"],
                tuple((p["doc_id"], p["tf"]) for p in r["postings"]),
            )
            for r in d.select(
                "term", "block", "df_block", "postings"
            ).collect()
        )

    assert snap(load_index_view(spark, path)) == snap(full)
    # appending another delta after compaction still composes
    extra = spark.createDataFrame(
        [(100, "spark spark spark")], "doc_id long, text string"
    )
    append_index_delta(
        build_inverted_index(extra, n_doc_blocks=4), path, batch_id=99
    )
    full2 = build_inverted_index(
        df.unionByName(extra), n_doc_blocks=4
    )
    got2 = search_topk(
        load_index_view(spark, path), ["spark"], n_docs=8, k=3
    ).collect()
    want2 = search_topk(full2, ["spark"], n_docs=8, k=3).collect()
    assert [tuple(r) for r in got2] == [tuple(r) for r in want2]


def test_stream_index_updates_equals_batch(spark, tmp_path):
    """The streaming fold (per-batch delta + cadence compaction) ends at
    the same searchable state as one batch rebuild."""
    import os

    from mr_crawly_spark.operators.search import (
        load_index_view,
        stream_index_updates,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    src = str(tmp_path / "src")
    # one parquet file per micro-batch (maxFilesPerTrigger=1)
    for i, m in enumerate((0, 1, 2)):
        df.filter(F.col("doc_id") % 3 == m).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    path = str(tmp_path / "sidx")
    q = stream_index_updates(
        stream,
        path,
        checkpoint=str(tmp_path / "ckpt"),
        n_doc_blocks=4,
        compact_every=2,  # forces a mid-stream compaction
    )
    q.awaitTermination(120)
    full = build_inverted_index(df, n_doc_blocks=4)
    got = search_topk(
        load_index_view(spark, path), ["spark", "join"], n_docs=7, k=5
    ).collect()
    want = search_topk(full, ["spark", "join"], n_docs=7, k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
