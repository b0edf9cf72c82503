"""Corpus-curation operators: token-bounded chunking + deterministic
sampling (RNG-free md5 thresholds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mr_crawly_spark.operators.curation import (
    chunk_documents,
    deterministic_sample,
    stratified_sample,
)


def test_chunk_documents_boundaries(spark):
    texts = {
        1: " ".join(f"w{i}" for i in range(25)),   # 25 toks: 1 full + 1 tail
        2: " ".join(f"w{i}" for i in range(10)),   # shorter than max: 1 chunk
        3: " ".join(f"w{i}" for i in range(20)),   # exactly max: 1 chunk
        4: "solo",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_index"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, max_tokens=20, overlap=5).collect()
    }
    # doc 1: stride 15 -> chunks [0..19], [15..24]
    assert got[(1, 0)][1] == 20
    assert got[(1, 1)] == (" ".join(f"w{i}" for i in range(15, 25)), 10)
    # overlap: last 5 tokens of chunk 0 == first 5 of chunk 1
    assert got[(1, 0)][0].split()[-5:] == got[(1, 1)][0].split()[:5]
    assert (1, 2) not in got
    assert got[(2, 0)][1] == 10 and (2, 1) not in got
    assert got[(3, 0)][1] == 20 and (3, 1) not in got
    assert got[(4, 0)] == ("solo", 1)
    # lossless coverage: every token appears in some chunk of its doc
    for doc_id, text in texts.items():
        covered = set()
        for (d, _), (chunk, _) in got.items():
            if d == doc_id:
                covered |= set(chunk.split())
        assert covered == set(text.split()), doc_id


def test_deterministic_sample_properties(spark):
    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    s10 = {r["doc_id"] for r in deterministic_sample(df, 0.1, "doc_id").collect()}
    s30 = {r["doc_id"] for r in deterministic_sample(df, 0.3, "doc_id").collect()}
    # roughly the right rate
    assert 0.07 < len(s10) / 5000 < 0.13
    assert 0.26 < len(s30) / 5000 < 0.34
    # monotone: smaller fraction is a SUBSET of the larger (staged runs)
    assert s10 <= s30
    # reproducible regardless of partitioning
    again = {
        r["doc_id"]
        for r in deterministic_sample(df.repartition(13), 0.1, "doc_id").collect()
    }
    assert again == s10
    # different salts draw independently
    other = {
        r["doc_id"]
        for r in deterministic_sample(df, 0.1, "doc_id", salt="other").collect()
    }
    assert other != s10


def test_stratified_sample(spark):
    df = spark.range(6000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "boilerplate").otherwise("quality").alias("kind"),
    )
    got = stratified_sample(
        df, {"boilerplate": 0.1, "quality": 1.0}, "kind", "doc_id"
    )
    rows = got.groupBy("kind").count().collect()
    by_kind = {r["kind"]: r["count"] for r in rows}
    assert by_kind["quality"] == 4000            # kept in full
    assert 120 < by_kind["boilerplate"] < 280    # ~10% of 2000
    # strata not named fall to default_fraction=0
    dropped = stratified_sample(df, {"quality": 1.0}, "kind", "doc_id")
    kinds = {r["kind"] for r in dropped.select("kind").distinct().collect()}
    assert kinds == {"quality"}


def test_bm25_scores_reference(spark):
    """BM25 against a tiny corpus vs a direct python computation."""
    import math

    rows = [
        (1, "spark scan the vector"),
        (2, "dup dup scan scan scan"),
        (3, "the quick fox jumps"),
        (4, "spark spark spark"),
    ]
    from mr_crawly_spark.operators.curation import bm25_scores

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["spark", "scan"]).collect()}

    toks = {i: t.split() for i, t in rows}
    n = len(rows)
    avgdl = sum(len(w) for w in toks.values()) / n
    k1, b = 1.2, 0.75

    def score(doc):
        s = 0.0
        for term in ("spark", "scan"):
            df = sum(1 for w in toks.values() if term in w)
            tf = toks[doc].count(term)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * len(toks[doc]) / avgdl))
        return round(s, 4)

    assert got == {i: score(i) for i, _ in rows}
    assert got[3] == 0.0          # no query term -> zero relevance
    assert min(got[1], got[2], got[4]) > 0.0  # matches all score positive


def test_bm25_empty_corpus_returns_empty(spark):
    """ADVICE r4: an empty docs frame must return an empty result, not
    TypeError on float(None) from the NULL avgdl."""
    from mr_crawly_spark.operators.curation import bm25_scores

    docs = spark.createDataFrame([], "doc_id string, text string")
    out = bm25_scores(docs, ["spark"])
    assert out.count() == 0
    assert out.columns == ["doc_id", "bm25"]


def test_bm25_all_empty_docs_score_zero_not_nan(spark):
    """avgdl == 0 (every doc empty) must not divide by zero: the floored
    denominator scores those docs 0.0."""
    from mr_crawly_spark.operators.curation import bm25_scores

    docs = spark.createDataFrame(
        [("a", ""), ("b", "")], "doc_id string, text string"
    )
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["spark"]).collect()}
    assert got == {"a": 0.0, "b": 0.0}


def test_bm25_term_bound_raises_cleanly(spark):
    """r4 verdict #4: the per-term column shape is bounded — 64 terms must
    raise a clear ValueError instead of building a degenerate wide plan."""
    import pytest

    from mr_crawly_spark.operators.curation import BM25_MAX_TERMS, bm25_scores

    docs = spark.createDataFrame([("a", "x y z")], "doc_id string, text string")
    terms = [f"t{i}" for i in range(64)]
    assert len(terms) > BM25_MAX_TERMS
    with pytest.raises(ValueError, match="query terms"):
        bm25_scores(docs, terms)
    # at the bound itself it still works
    out = bm25_scores(docs, [f"t{i}" for i in range(BM25_MAX_TERMS)])
    assert out.count() == 1


def test_bm25_exploded_matches_column_shape(spark):
    """The two BM25 shapes are the same function: the explode/aggregate
    variant (constant plan size, for large term sets) must score every doc
    identically to the per-term-column variant, including docs matching no
    term (0.0) and terms matching no doc (no contribution)."""
    from mr_crawly_spark.operators.curation import (
        bm25_scores,
        bm25_scores_exploded,
    )

    rows = [
        (1, "spark scan the vector"),
        (2, "dup dup scan scan scan"),
        (3, "the quick fox jumps"),
        (4, "spark spark spark"),
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["spark", "scan", "vector", "absent_term"]
    col_shape = {
        r["doc_id"]: r["bm25"] for r in bm25_scores(docs, terms).collect()
    }
    exploded = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores_exploded(docs, terms).collect()
    }
    assert exploded == col_shape
    assert exploded[3] == 0.0  # no query term -> scored, not dropped


def test_bm25_exploded_handles_64_terms(spark):
    """The restructure target (r4 verdict #4): 64 terms — where the column
    shape refuses — run fine through the exploded shape."""
    from mr_crawly_spark.operators.curation import bm25_scores_exploded

    docs = spark.createDataFrame(
        [(1, "t0 t1 t2"), (2, "t63 t63")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores_exploded(
            docs, [f"t{i}" for i in range(64)]
        ).collect()
    }
    assert set(got) == {1, 2} and got[1] > 0 and got[2] > 0


def test_repetition_stats_hand_values(spark):
    """Known fractions on hand docs, including the self-overlap cap."""
    from mr_crawly_spark.operators.curation import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # 4 tokens, 1 distinct; bigram 'a a' x3
            (2, "w x y z"),          # all distinct, no repeats
            (3, "ab cd ab cd ab"),   # loop: bigrams 'ab cd' x2, 'cd ab' x2
            (4, "solo"),             # 1 token: gram fracs defined as 0
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[1]["dup_token_frac"] == 0.75
    assert got[1]["top_bigram_frac"] == 1.0  # capped (raw 2*3/4 = 1.5)
    assert got[1]["dup_trigram_frac"] == 0.5  # 'a a a' twice
    assert not got[1]["keep"]
    assert got[2]["dup_token_frac"] == 0.0
    assert got[2]["dup_trigram_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == 0.5  # every bigram unique: 2*1/4
    assert not got[2]["keep"]  # top-bigram 0.5 > 0.18 on a 4-token doc
    assert got[3]["top_bigram_frac"] == 0.8  # 2*2/5
    assert got[4] == {
        "doc_id": 4, "n_tokens": 1, "dup_token_frac": 0.0,
        "dup_trigram_frac": 0.0, "top_bigram_frac": 0.0, "keep": True,
    }


def test_unigram_logprob_hand_values(spark):
    """Uniform two-token vocabulary: every token has p=1/2, so every doc's
    mean log-prob is ln(1/2) regardless of length."""
    import math

    from mr_crawly_spark.operators.curation import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["avg_logprob"] for r in unigram_logprob(docs).collect()}
    expect = round(math.log(0.5), 4)
    assert got == {1: expect, 2: expect}


def test_unigram_logprob_empty(spark):
    from mr_crawly_spark.operators.curation import unigram_logprob

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert unigram_logprob(docs).count() == 0


def test_temperature_mix_weights_flatten():
    """alpha=0.5 boosts the rare stratum's keep rate by the theoretical
    sqrt ratio, and an aggressive target caps probabilities at 1."""
    from mr_crawly_spark.operators.curation import temperature_mix_weights

    # target_frac low enough that neither stratum hits the p=1 cap
    q = temperature_mix_weights({"en": 90, "zh": 10}, alpha=0.5, target_frac=0.3)
    # q_zh / q_en = (p_zh/p_en)^alpha * (n_en/n_zh) = 3 for alpha=0.5
    assert abs(q["zh"] / q["en"] - 3.0) < 1e-12
    assert q["zh"] < 1.0
    capped = temperature_mix_weights({"en": 9, "zh": 1}, alpha=0.0, target_frac=1.0)
    assert capped["zh"] == 1.0  # alpha=0 wants 50/50 but can't upsample
    assert temperature_mix_weights({}, 0.5, 0.5) == {}


def test_temperature_mix_sample_partition_invariant(spark):
    """The md5 draw makes the sample a pure function of the rows: any
    repartitioning yields the identical kept set."""
    from mr_crawly_spark.operators.curation import temperature_mix_sample

    docs = spark.createDataFrame(
        [(i, "en" if i % 10 else "zh") for i in range(300)],
        "doc_id long, lang string",
    )
    a = sorted(
        r["doc_id"]
        for r in temperature_mix_sample(docs, "lang", "doc_id").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in temperature_mix_sample(
            docs.repartition(13), "lang", "doc_id"
        ).collect()
    )
    assert a == b and 0 < len(a) < 300


def _cap_docs(spark):
    """3 domains: 'big' has 40 ten-token docs (400 tokens), 'small' has 3,
    'one' has a single doc larger than any budget we test."""
    rows = []
    for i in range(40):
        rows.append((i, "big", " ".join(f"w{j}" for j in range(10))))
    for i in range(40, 43):
        rows.append((i, "small", "a b c d e"))
    rows.append((99, "one", " ".join(f"x{j}" for j in range(500))))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_domain_cap_exact_budget_and_floor(spark):
    from mr_crawly_spark.operators.curation import domain_token_cap_exact

    docs = _cap_docs(spark)
    out = domain_token_cap_exact(docs, budget_tokens=100, domain_col="source")
    rows = out.collect()
    assert len(rows) == docs.count()  # every doc annotated
    by_dom: dict[str, list] = {}
    for r in rows:
        by_dom.setdefault(r["source"], []).append(r)
    # budget respected up to the first-crossing doc: kept tokens < budget
    # + one doc; and every non-empty domain keeps at least one doc
    for dom, rs in by_dom.items():
        kept = [r for r in rs if r["kept"]]
        assert kept, dom
        kept_tokens = sum(r["n_tokens"] for r in kept)
        max_doc = max(r["n_tokens"] for r in rs)
        assert kept_tokens < 100 + max_doc
    # 'small' fits entirely (15 tokens < 100): nothing dropped
    assert all(r["kept"] for r in by_dom["small"])
    # 'one' keeps its single giant doc (first crossing included)
    assert by_dom["one"][0]["kept"]
    # 'big' (400 tokens) is genuinely capped
    assert sum(r["n_tokens"] for r in by_dom["big"] if r["kept"]) <= 100


def test_domain_cap_exact_monotone_and_invariant(spark):
    from mr_crawly_spark.operators.curation import domain_token_cap_exact

    docs = _cap_docs(spark)
    k100 = {
        r["doc_id"]
        for r in domain_token_cap_exact(docs, 100).collect()
        if r["kept"]
    }
    k200 = {
        r["doc_id"]
        for r in domain_token_cap_exact(docs, 200).collect()
        if r["kept"]
    }
    assert k100 <= k200  # greedy prefix of a fixed md5 order
    again = {
        r["doc_id"]
        for r in domain_token_cap_exact(docs.repartition(7), 100).collect()
        if r["kept"]
    }
    assert again == k100


def test_domain_cap_sampled_expectation_and_monotone(spark):
    from mr_crawly_spark.operators.curation import domain_token_cap_sampled

    docs = _cap_docs(spark)
    out = domain_token_cap_sampled(docs, budget_tokens=100).collect()
    big = [r for r in out if r["source"] == "big"]
    kept_tokens = sum(r["n_tokens"] for r in big if r["kept"])
    # keep-prob = 100/400 = 0.25 -> expect ~100 tokens kept; md5 draw on
    # 40 docs concentrates well within a generous band
    assert 20 <= kept_tokens <= 250
    # under-budget domains keep everything (frac clamps to 1)
    assert all(r["kept"] for r in out if r["source"] == "small")
    k100 = {r["doc_id"] for r in out if r["kept"]}
    k200 = {
        r["doc_id"]
        for r in domain_token_cap_sampled(docs, 200).collect()
        if r["kept"]
    }
    assert k100 <= k200


def test_top_ngrams_hand_values(spark):
    from mr_crawly_spark.operators.curation import top_ngrams

    d = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x y"), (3, "z z")],
        "doc_id long, text string",
    )
    rows = top_ngrams(d, n=2, k=3).collect()
    assert [tuple(r) for r in rows] == [
        ("a b", 3, 2),   # twice in doc1 + once in doc2
        ("b a", 1, 1),   # freq-1 ties broken by ngram asc
        ("b c", 1, 1),
    ]


def test_tfidf_keywords_rank_and_idf(spark):
    from mr_crawly_spark.operators.curation import tfidf_keywords

    d = spark.createDataFrame(
        [(1, "common rare1 common"), (2, "common rare2"), (3, "common")],
        "doc_id long, text string",
    )
    out = tfidf_keywords(d, top_j=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 'common' appears in all 3 docs -> idf = ln(1) = 0 -> rare terms win
    top1 = {d_: sorted(rs, key=lambda r: r["rank"])[0] for d_, rs in by_doc.items()}
    assert top1[1]["term"] == "rare1" and top1[1]["tfidf"] > 0
    assert top1[2]["term"] == "rare2"
    assert top1[3]["term"] == "common" and top1[3]["tfidf"] == 0.0
    assert all(len(rs) <= 2 for rs in by_doc.values())


def test_tfidf_keywords_empty(spark):
    from mr_crawly_spark.operators.curation import tfidf_keywords

    d = spark.createDataFrame([], "doc_id long, text string")
    assert tfidf_keywords(d).count() == 0


def test_size_bytes_two_letter_units():
    from mr_crawly_spark.operators.dedup import _size_bytes

    assert _size_bytes("128m") == _size_bytes("128mb") == 128 << 20
    assert _size_bytes("1gb") == 1 << 30
    assert _size_bytes("64KB") == 64 << 10
    assert _size_bytes("134217728b") == 134217728
    assert _size_bytes("4096") == 4096
    assert _size_bytes("2tb") == 2 << 40


def test_temperature_mix_null_strata_dropped(spark):
    from mr_crawly_spark.operators.curation import temperature_mix_sample

    d = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, None), (4, "fr")],
        "doc_id long, lang string",
    )
    out = temperature_mix_sample(
        d, "lang", "doc_id", alpha=0.5, target_frac=1.0, salt="t"
    ).collect()
    assert all(r["lang"] is not None for r in out)  # no crash, nulls dropped


def test_bm25_exploded_duplicate_terms_match_column_shape(spark):
    from mr_crawly_spark.operators.curation import (
        bm25_scores,
        bm25_scores_exploded,
    )

    d = spark.createDataFrame(
        [(1, "spark scan spark shuffle"), (2, "scan only"), (3, "noise")],
        "doc_id long, text string",
    )
    terms = ["spark", "spark", "scan"]  # query MULTISET: spark counts twice
    a = {r["doc_id"]: r["bm25"] for r in bm25_scores(d, terms).collect()}
    b = {r["doc_id"]: r["bm25"]
         for r in bm25_scores_exploded(d, terms).collect()}
    assert a == b


# ---- BPE merge learning (operators/bpe.py) ------------------------------ #


def _bpe_corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat ate the rat"),
            (3, "a cat a cat a cat"),
            (4, "the cat the cat"),
        ],
        "doc_id long, text string",
    )


def test_bpe_learns_expected_merges(spark):
    """Hand-checked trajectory: ('the','cat') dominates round 1 (4 hits),
    ('a','cat') round 2, and round 3 pairs the round-2 atom with ITSELF —
    proving merged units participate as atoms in later rounds."""
    from mr_crawly_spark.operators.bpe import bpe_merges

    got = [tuple(r) for r in bpe_merges(_bpe_corpus(spark), n_merges=3).collect()]
    assert got == [
        (1, "the", "cat", 4),
        (2, "a", "cat", 3),
        (3, "a\x02cat", "a\x02cat", 2),
    ]


def test_bpe_apply_is_greedy_leftmost(spark):
    """'a cat a cat a cat' under merges [(the,cat),(a,cat),(a·cat,a·cat)]:
    greedy leftmost pairs atoms (1,2) and leaves the third — the textbook
    BPE application order the replace() encoding must reproduce."""
    from mr_crawly_spark.operators.bpe import apply_bpe_merges, bpe_merges

    docs = _bpe_corpus(spark)
    rules = [
        (r["token_a"], r["token_b"])
        for r in bpe_merges(docs, n_merges=3).collect()
    ]
    toks = {
        r["doc_id"]: r["bpe_tokens"]
        for r in apply_bpe_merges(docs, rules).collect()
    }
    assert toks[3] == ["a\x02cat\x02a\x02cat", "a\x02cat"]
    assert toks[4] == ["the\x02cat", "the\x02cat"]
    assert toks[1] == ["the\x02cat", "sat", "on", "the", "mat"]


def test_bpe_partition_invariance(spark):
    from mr_crawly_spark.operators.bpe import bpe_merges

    docs = _bpe_corpus(spark)
    a = [tuple(r) for r in bpe_merges(docs, n_merges=3).collect()]
    b = [
        tuple(r)
        for r in bpe_merges(docs.repartition(7), n_merges=3).collect()
    ]
    assert a == b


def test_bpe_strips_forged_control_bytes(spark):
    """Hostile text carrying the internal \\x01/\\x02 bytes must not forge
    merge atoms: the bytes are replaced with spaces before tokenizing."""
    from mr_crawly_spark.operators.bpe import bpe_merges

    docs = spark.createDataFrame(
        [(1, "x\x01y x\x01y x\x02y"), (2, "x\x01y q q")],
        "doc_id long, text string",
    )
    rows = [tuple(r) for r in bpe_merges(docs, n_merges=1).collect()]
    # every control byte became a space, so the dominant pair is (x, y)
    assert rows == [(1, "x", "y", 4)]


def test_bpe_early_stop_on_pairless_corpus(spark):
    from mr_crawly_spark.operators.bpe import bpe_merges

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "alone")], "doc_id long, text string"
    )
    assert bpe_merges(docs, n_merges=3).count() == 0


# ---- exact histogram quantiles (curation.length_quantiles) -------------- #


def test_length_quantiles_match_numpy_type7(spark):
    """The histogram+rank-straddle plan must equal numpy's default
    'linear' (type-7) percentile on a known multiset, including
    interpolated positions and duplicate-heavy histograms."""
    import numpy as np

    from mr_crawly_spark.operators.curation import length_quantiles

    lengths = {"a": [1, 2, 2, 2, 3, 10, 50], "b": [7], "c": [4, 8]}
    rows = [
        (g, " ".join("w" for _ in range(n)))
        for g, ls in lengths.items()
        for n in ls
    ]
    docs = spark.createDataFrame(rows, "source string, text string")
    probs = (0.25, 0.5, 0.9, 0.99)
    got = {
        (r["source"], r["p"]): r["q"]
        for r in length_quantiles(docs, probs=probs).collect()
    }
    for g, ls in lengths.items():
        for p in probs:
            want = round(float(np.percentile(ls, p * 100)), 4)
            assert got[(g, p)] == want, (g, p, got[(g, p)], want)


def test_length_quantiles_partition_invariance(spark):
    from mr_crawly_spark.operators.curation import length_quantiles

    docs = spark.createDataFrame(
        [(f"s{i % 3}", " ".join("w" for _ in range(1 + i * 7 % 23)))
         for i in range(60)],
        "source string, text string",
    )
    a = sorted(map(tuple, length_quantiles(docs).collect()))
    b = sorted(map(tuple, length_quantiles(docs.repartition(13)).collect()))
    assert a == b


# ---- A-ES weighted sampling (curation.weighted_sample) ------------------ #


def test_weighted_sample_bias_toward_heavy_weights(spark):
    """Across 30 independent salts, an item with weight 50 must be drawn
    far more often than weight-1 items (A-ES inclusion ~ weight).
    Deterministic per salt -> this is a fixed arithmetic fact."""
    from mr_crawly_spark.operators.curation import weighted_sample

    rows = [(0, 50.0)] + [(i, 1.0) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    heavy_hits = 0
    light_hits = 0
    for s in range(30):
        got = {
            r["doc_id"]
            for r in weighted_sample(
                df, k=5, weight_col="w", salt=f"s{s}"
            ).collect()
        }
        assert len(got) == 5
        heavy_hits += 0 in got
        light_hits += 1 in got
    assert heavy_hits >= 25        # ~P(include) -> near 1 for w=50, k=5
    assert light_hits <= 10        # a single light item is rarely drawn


def test_weighted_sample_k_exceeds_n_returns_all_positive(spark):
    from mr_crawly_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [(1, 2.0), (2, 0.0), (3, -1.0), (4, None), (5, 9.0)],
        "doc_id long, w double",
    )
    got = sorted(
        r["doc_id"] for r in weighted_sample(df, 10, "w").collect()
    )
    assert got == [1, 5]  # zero/negative/null weights excluded


def test_weighted_sample_partition_invariance(spark):
    from mr_crawly_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(300)],
        "doc_id long, w double",
    )
    a = sorted(map(tuple, weighted_sample(df, 20, "w").collect()))
    b = sorted(
        map(tuple, weighted_sample(df.repartition(17), 20, "w").collect())
    )
    assert a == b


# --------------------------------------------------------------------------
# pack_sequences — GPT-style concat-and-slice sequence packing
# --------------------------------------------------------------------------


def _pack_reference(rows, seq_len, n_shards):
    """Plain-python replay of pack_sequences' contract: md5 shard, id-order
    stream per shard, slice into seq_len blocks, md5 per packed block."""
    import hashlib

    def h60(salt, key):
        return int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:15], 16)

    shards: dict[int, list[tuple[int, list[str]]]] = {}
    for doc_id, text in rows:
        toks = text.strip().split()
        if not toks or not text.strip():
            continue
        shards.setdefault(h60("pack", doc_id) % 1_000_000 % n_shards, []).append(
            (doc_id, toks)
        )
    out = {}
    for shard, docs in shards.items():
        stream, ndocs_at = [], []
        for doc_id, toks in sorted(docs):
            start = len(stream)
            stream.extend(toks)
            ndocs_at.append((start, len(stream)))
        for seq_id in range((len(stream) + seq_len - 1) // seq_len):
            lo, hi = seq_id * seq_len, min((seq_id + 1) * seq_len, len(stream))
            block = stream[lo:hi]
            n_docs = sum(1 for s, e in ndocs_at if s < hi and e > lo)
            out[(shard, seq_id)] = (
                n_docs,
                len(block),
                hashlib.md5(" ".join(block).encode()).hexdigest(),
            )
    return out


def _pack_rows():
    # short docs, an exactly-seq_len doc, a straddler 3x seq_len, empties
    rows = [(i, " ".join(f"d{i}t{j}" for j in range(3 + (i * 7) % 11))) for i in range(40)]
    rows.append((100, " ".join(f"big{j}" for j in range(50))))  # straddles
    rows.append((101, " ".join(f"x{j}" for j in range(16))))    # == seq_len
    rows.append((102, "   "))                                   # whitespace-only
    rows.append((103, ""))                                      # empty
    return rows


def test_pack_sequences_matches_python_reference(spark):
    from mr_crawly_spark.operators.curation import pack_sequences

    rows = _pack_rows()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["shard"], r["seq_id"]): (r["n_docs"], r["n_tokens"], r["packed_fp"])
        for r in pack_sequences(df, seq_len=16, n_shards=4).collect()
    }
    assert got == _pack_reference(rows, 16, 4)


def test_pack_sequences_invariants(spark):
    from mr_crawly_spark.functions.text import token_count
    from mr_crawly_spark.operators.curation import pack_sequences

    rows = _pack_rows()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packed = pack_sequences(df, seq_len=16, n_shards=4).collect()
    # every block except each shard's last is exactly full
    last = {}
    for r in packed:
        last[r["shard"]] = max(last.get(r["shard"], -1), r["seq_id"])
    for r in packed:
        if r["seq_id"] < last[r["shard"]]:
            assert r["n_tokens"] == 16, (r["shard"], r["seq_id"])
    # token conservation: packing loses nothing and pads nothing
    total = (
        df.filter(F.length(F.trim("text")) > 0)
        .select(F.sum(token_count(F.col("text"))).alias("s"))
        .first()["s"]
    )
    assert sum(r["n_tokens"] for r in packed) == total
    # seq_ids are dense per shard from 0
    by_shard: dict[int, set] = {}
    for r in packed:
        by_shard.setdefault(r["shard"], set()).add(r["seq_id"])
    for shard, ids in by_shard.items():
        assert ids == set(range(len(ids))), shard


def test_pack_sequences_partition_invariance(spark):
    from mr_crawly_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(_pack_rows(), "doc_id long, text string")
    a = sorted(
        map(tuple, pack_sequences(df, seq_len=16, n_shards=4).collect())
    )
    b = sorted(
        map(
            tuple,
            pack_sequences(df.repartition(13), seq_len=16, n_shards=4).collect(),
        )
    )
    assert a == b


def test_pack_sequences_validation(spark):
    import pytest as _pytest

    from mr_crawly_spark.operators.curation import pack_sequences

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        pack_sequences(df, seq_len=0)
    with _pytest.raises(ValueError):
        pack_sequences(df, n_shards=0)


def _ref_pmi(rows, k, min_count):
    import math
    from collections import Counter

    uni: Counter = Counter()
    big: Counter = Counter()
    for _, text in rows:
        w = text.strip().split()
        if not text.strip():
            continue
        uni.update(w)
        big.update(f"{a} {b}" for a, b in zip(w, w[1:]))
    nt = sum(uni.values())
    nb = sum(big.values())
    out = []
    for bg, c in big.items():
        if c < min_count:
            continue
        a, b = bg.split(" ")
        pmi = math.log((c / nb) / ((uni[a] / nt) * (uni[b] / nt)))
        out.append((bg, c, round(pmi, 4)))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:k]


def test_pmi_collocations_matches_python_reference(spark):
    from mr_crawly_spark.operators.curation import pmi_collocations

    rows = [
        # "new york" always together (high PMI); "of the" frequent but
        # independent (low PMI)
        (1, "new york is big and the rest of the city sleeps"),
        (2, "i love new york and the sound of the streets"),
        (3, "new york new york the city of the world"),
        (4, "the cat sat of the mat the dog sat of the rug"),
        (5, "   "),
        (6, "the of the of the of"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["bigram"], r["freq"], r["pmi"])
        for r in pmi_collocations(df, k=10, min_count=2).collect()
    ]
    want = _ref_pmi(rows, 10, 2)
    assert got == want
    pmis = dict((b, p) for b, _, p in got)
    assert pmis["new york"] > pmis["of the"]  # PMI ranks the collocation


def test_pmi_collocations_edges(spark):
    import pytest as _pytest

    from mr_crawly_spark.operators.curation import pmi_collocations

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pmi_collocations(empty).count() == 0
    singles = spark.createDataFrame(
        [(1, "one"), (2, "two")], "doc_id long, text string"
    )
    assert pmi_collocations(singles, min_count=1).count() == 0
    with _pytest.raises(ValueError):
        pmi_collocations(singles, k=0)
    with _pytest.raises(ValueError):
        pmi_collocations(singles, min_count=0)


def test_pmi_collocations_partition_invariance(spark):
    from mr_crawly_spark.operators.curation import pmi_collocations

    rows = [(i, f"tok{i % 7} tok{(i + 1) % 7} tok{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = [tuple(r) for r in pmi_collocations(df, k=20, min_count=2).collect()]
    b = [
        tuple(r)
        for r in pmi_collocations(
            df.repartition(11), k=20, min_count=2
        ).collect()
    ]
    assert a == b


def test_percentile_ranks_matches_reference(spark):
    from mr_crawly_spark.operators.curation import percentile_ranks

    rows = [(i, [5, 2, 9, 2, 7, 5, 5, 1, 9, 3][i]) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    got = {
        r["doc_id"]: r["pct"] for r in percentile_ranks(df, "v").collect()
    }
    vals = [v for _, v in rows]
    want = {
        i: round(sum(1 for x in vals if x < v) / (len(vals) - 1), 4)
        for i, v in rows
    }
    assert got == want
    # ties share a rank; min value -> 0.0; max -> below/(n-1)
    assert got[1] == got[3]
    assert got[7] == 0.0


def test_percentile_ranks_edges_and_invariance(spark):
    from mr_crawly_spark.operators.curation import percentile_ranks

    one = spark.createDataFrame([(1, 42)], "doc_id long, v long")
    assert percentile_ranks(one, "v").collect()[0]["pct"] == 0.0
    withnull = spark.createDataFrame(
        [(1, 5), (2, None), (3, 7)], "doc_id long, v long"
    )
    got = {r["doc_id"]: r["pct"] for r in percentile_ranks(withnull, "v").collect()}
    assert set(got) == {1, 3}  # null rows have no rank
    rows = [(i, (i * 17) % 23) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    a = sorted(map(tuple, percentile_ranks(df, "v").collect()))
    b = sorted(map(tuple, percentile_ranks(df.repartition(9), "v").collect()))
    assert a == b


def _ref_bigram_ppl(rows, k=1.0):
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    uni = set()
    model: Counter = Counter()
    per_doc: dict[int, Counter] = {}
    for doc_id, text in rows:
        w = text.strip().split()
        uni.update(w)
        bgs = Counter(f"{a} {b}" for a, b in zip(w, w[1:]))
        if bgs:
            per_doc[doc_id] = bgs
        model.update(bgs)
    ctx: Counter = Counter()
    for b, c in model.items():
        ctx[b.split(" ")[0]] += c
    v = len(uni)
    out = {}
    for doc_id, bgs in per_doc.items():
        s = Decimal(0)
        n = sum(bgs.values())
        for b, tf in bgs.items():
            p = (model[b] + k) / (ctx[b.split(" ")[0]] + k * v)
            s += Decimal(tf * math.log(p)).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        out[doc_id] = (n, round(math.exp(-float(s) / n), 4))
    return out


def test_bigram_perplexity_matches_reference(spark):
    from mr_crawly_spark.operators.curation import bigram_perplexity

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat"),   # templated twin -> low ppl
        (3, "zq xv qp mn zz kk"),        # gibberish -> high ppl
        (4, "the cat"),                  # one bigram
        (5, "single"),                   # no bigram -> excluded
        (6, "  "),                       # empty -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["ppl"])
        for r in bigram_perplexity(df).collect()
    }
    want = _ref_bigram_ppl(rows)
    assert got == want
    assert set(got) == {1, 2, 3, 4}
    assert got[3][1] > got[1][1]  # gibberish scores higher ppl


def test_bigram_perplexity_edges_and_invariance(spark):
    import pytest as _pytest

    from mr_crawly_spark.operators.curation import bigram_perplexity

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bigram_perplexity(empty).count() == 0
    df = spark.createDataFrame(
        [(i, f"a{i % 4} b{i % 3} a{i % 4} c{i % 5}") for i in range(80)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, bigram_perplexity(df).collect()))
    b = sorted(map(tuple, bigram_perplexity(df.repartition(7)).collect()))
    assert a == b
    with _pytest.raises(ValueError):
        bigram_perplexity(df, k=0)
