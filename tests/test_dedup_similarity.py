"""Property tests for dedup + similarity operators against plain-Python
references (the SQL-checked slices are covered by test_entry.py)."""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from mr_crawly_spark.operators import dedup as D
from mr_crawly_spark.operators import multimodal as MM
from mr_crawly_spark.operators import similarity as SIM

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
    (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    (4, "completely different words about spark engines here"),
    (5, "spark engines here completely different words about"),
    (6, "one two three four five six seven eight nine ten"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_shingles(text: str, n: int = 3) -> set[str]:
    w = text.split()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def test_exact_dedup_groups(docs_df):
    got = {r["keeper_id"]: r["n_docs"] for r in D.exact_dedup(docs_df).collect()}
    assert got[1] == 2          # docs 1 and 3 collapse
    assert sum(got.values()) == 6
    assert len(got) == 5


def test_jaccard_pairs_match_python(docs_df):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.jaccard_pairs(docs_df, threshold=0.01).collect()
    }
    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        sa, sb = _py_shingles(ta), _py_shingles(tb)
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if round(j, 4) >= 0.01:
            want[(ia, ib)] = round(j, 4)
    assert got == want
    assert got[(1, 3)] == 1.0   # exact dup
    assert got[(1, 2)] > 0.5    # near dup


def test_minhash_exact_dups_share_signature(docs_df):
    sig = {r["doc_id"]: tuple(r[f"mh{i}"] for i in range(8))
           for r in D.minhash_signatures(docs_df).collect()}
    assert sig[1] == sig[3]
    assert sig[1] != sig[4]


def test_minhash_matches_python_reference(docs_df):
    sig = {r["doc_id"]: [r[f"mh{i}"] for i in range(8)]
           for r in D.minhash_signatures(docs_df).collect()}
    for doc_id, text in DOCS:
        want = [None] * 8
        for s in _py_shingles(text):
            hx = hashlib.md5(s.encode()).hexdigest()
            a = int(hx[0:15], 16)
            b = int(hx[16:31], 16) | 1
            for i in range(8):
                v = (a + i * b) % D.MINHASH_P
                if want[i] is None or v < want[i]:
                    want[i] = v
        assert sig[doc_id] == want, doc_id


def test_lsh_pairs_contain_all_high_jaccard_pairs(docs_df):
    """LSH candidates ⊇ pairs with jaccard >= ~0.9 (banding guarantee is
    probabilistic; exact dups are certain — identical signatures)."""
    lsh = {(r["id_a"], r["id_b"]) for r in D.minhash_lsh_pairs(docs_df).collect()}
    assert (1, 3) in lsh
    exact = {
        (r["id_a"], r["id_b"])
        for r in D.jaccard_pairs(docs_df, threshold=0.9).collect()
    }
    assert exact <= lsh


def test_lsh_hot_band_cap(spark):
    """cap_bucket_size drops a pathological bucket (here: 60 copies of one
    boilerplate text, whose identical signatures share every band key) while
    pairs from healthy buckets survive. Without the cap that one bucket
    alone contributes 60*59/2 pairs — the quadratic blowup the cap bounds."""
    boiler = [(i, "identical boilerplate text repeated across the corpus")
              for i in range(60)]
    near = [
        (100, "a genuinely unique document about distributed query engines"),
        (101, "a genuinely unique document about distributed query engines"),
    ]
    df = spark.createDataFrame(boiler + near, "doc_id int, text string")
    uncapped = D.minhash_lsh_pairs(df)
    capped = D.minhash_lsh_pairs(df, max_band_size=50)
    assert uncapped.count() >= 60 * 59 // 2
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in got          # healthy bucket survives
    assert all(a >= 100 for a, _ in got)  # hot bucket fully dropped

    sh_capped = {(r["id_a"], r["id_b"])
                 for r in D.simhash_neardup_pairs(df, max_band_size=50).collect()}
    assert (100, 101) in sh_capped and all(a >= 100 for a, _ in sh_capped)


def test_embedding_neardup_bucket_cap(spark):
    import numpy as np
    rng = np.random.default_rng(7)
    base = rng.normal(size=8).tolist()
    rows = [(i, base) for i in range(40)]  # hot bucket: identical vectors
    u = rng.normal(size=8)
    rows += [(100, u.tolist()), (101, (u * 1.0001).tolist())]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id int, embedding array<float>",
    )
    capped = SIM.embedding_neardup_pairs(
        df, threshold=0.99, n_planes=4, max_bucket_size=20
    )
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in got
    assert all(a >= 100 for a, _ in got)


def test_jaccard_on_lsh_candidates_matches_exact(docs_df):
    """The scale composition (LSH candidates -> per-pair array intersect)
    agrees with the exhaustive shingle-join jaccard on every pair it rates,
    and recovers all high-jaccard pairs (which LSH is guaranteed to keep)."""
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.jaccard_pairs(docs_df, threshold=0.05).collect()
    }
    composed = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.jaccard_on_candidates(
            docs_df, D.minhash_lsh_pairs(docs_df), threshold=0.05
        ).collect()
    }
    for pair, j in composed.items():
        assert exact.get(pair) == j, pair
    high = {p for p, j in exact.items() if j >= 0.9}
    assert high <= set(composed)


def test_simhash_near_dup_detection(docs_df):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash64(docs_df).collect()}
    assert sh[1] == sh[3]  # identical text -> identical fingerprint
    ham_12 = bin(sh[1] ^ sh[2]).count("1")
    ham_14 = bin(sh[1] ^ sh[4]).count("1")
    assert ham_12 < ham_14  # near-dup closer than unrelated
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_neardup_pairs(
            docs_df, max_hamming=10, allow_missed_pairs=True
        ).collect()
    }
    assert pairs.get((1, 3)) == 0


def test_simhash_banding_recall_guarantee(spark):
    """Pigeonhole property (verdict r2 #5): at the 6x10-bit default every
    pair within hamming <= 5 is recovered — exercised at the WORST case
    (differing bits spread across distinct bands) for every distance
    1..5 — and asking beyond the guarantee raises instead of silently
    missing pairs."""
    base = 0b101010101010101010101010101010101010101010101010101010101010
    rows = [(0, base)]
    for d in range(1, 6):
        # flip d bits in d DIFFERENT bands (positions 5, 15, 25, ... —
        # one per 10-bit band): no band survives by luck of locality
        v = base
        for k in range(d):
            v ^= 1 << (10 * k + 5)
        rows.append((d, v))
    sh = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_banded_pairs(sh, max_hamming=5).collect()
    }
    for d in range(1, 6):
        assert got[(0, d)] == d  # every planted distance fully recovered
    with pytest.raises(ValueError, match="guarantee"):
        D.simhash_banded_pairs(sh, max_hamming=6)
    with pytest.raises(ValueError, match="guarantee"):
        D.simhash_neardup_pairs(spark.createDataFrame(
            [(1, "a b c")], "doc_id long, text string"), max_hamming=9)


def test_cosine_topk_matches_numpy(spark):
    rng = [
        (i, [((i * 31 + j * 7) % 17 - 8) / 8.0 for j in range(16)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rng, "vec_id long, embedding array<float>")
    q = rng[5][1]
    got = [(r["vec_id"], r["cosine"]) for r in SIM.cosine_topk(df, q, k=10).collect()]

    mat = np.array([v for _, v in rng], dtype=np.float64)
    qv = np.array(q)
    cos = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
    order = sorted(range(200), key=lambda i: (-round(cos[i], 4), i))[:10]
    want = [(i, round(float(cos[i]), 4)) for i in order]
    assert got == want
    assert got[0][0] == 5  # self is the top hit


def test_ann_lsh_recall(spark):
    rng = [
        (i, [((i * 13 + j * 5) % 23 - 11) / 11.0 for j in range(16)])
        for i in range(500)
    ]
    df = spark.createDataFrame(rng, "vec_id long, embedding array<float>")
    q = rng[7][1]
    exact = {r["vec_id"] for r in SIM.cosine_topk(df, q, k=10).collect()}
    approx = {r["vec_id"] for r in SIM.ann_lsh_topk(df, q, k=10, n_planes=4).collect()}
    assert 7 in approx                       # self lands in its own bucket
    assert len(exact & approx) >= 3          # reasonable recall at 4 planes


def test_ann_ivf_recall(spark):
    rng = [
        (i, [((i * 13 + j * 5) % 23 - 11) / 11.0 for j in range(16)])
        for i in range(500)
    ]
    df = spark.createDataFrame(rng, "vec_id long, embedding array<float>")
    q = rng[7][1]
    exact = {r["vec_id"] for r in SIM.cosine_topk(df, q, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in SIM.ann_ivf_topk(df, q, k=10, n_centroids=8, n_probe=3).collect()
    }
    assert 7 in approx
    assert len(exact & approx) >= 3
    # full probe == exact search (IVF degenerates correctly)
    full = {
        r["vec_id"]
        for r in SIM.ann_ivf_topk(df, q, k=10, n_centroids=8, n_probe=8).collect()
    }
    assert full == exact


def test_ivf_indexed_equals_oneshot(spark):
    """The build-once index path (the scale workflow: assign once, persist
    partitioned by _list_id, query many) returns exactly what the one-shot
    helper returns for every query."""
    rng = [
        (i, [((i * 13 + j * 5) % 23 - 11) / 11.0 for j in range(16)])
        for i in range(500)
    ]
    df = spark.createDataFrame(rng, "vec_id long, embedding array<float>")
    assigned, centroids = SIM.ivf_index(df, n_centroids=8)
    assigned = assigned.repartition(4, "_list_id").persist()
    try:
        for qid in (7, 123):
            q = rng[qid][1]
            got = SIM.ann_ivf_topk_indexed(
                assigned, centroids, q, k=10, n_probe=3
            ).collect()
            want = SIM.ann_ivf_topk(df, q, k=10, n_centroids=8, n_probe=3).collect()
            assert [tuple(r) for r in got] == [tuple(r) for r in want]
    finally:
        assigned.unpersist()


def test_ivf_assignment_is_deterministic(spark):
    rng = [(i, [((i * 3 + j) % 7 - 3) / 3.0 for j in range(8)]) for i in range(100)]
    df = spark.createDataFrame(rng, "vec_id long, embedding array<float>")
    cents = SIM.ivf_centroids(df, 4)
    a = {r["vec_id"]: r["_list_id"] for r in SIM.ivf_assign(df, cents).collect()}
    b = {r["vec_id"]: r["_list_id"] for r in SIM.ivf_assign(df, cents).collect()}
    assert a == b
    assert set(a.values()) <= set(range(4))


def test_embedding_neardup_finds_duplicates(spark):
    base = [((i * 31 + j * 7) % 17 - 8) / 8.0 for j in range(16) for i in [3]]
    vecs = [(1, base), (2, base), (3, [v + 0.001 for v in base]),
            (4, [-v for v in base])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    pairs = {
        (r["id_a"], r["id_b"]) for r in SIM.embedding_neardup_pairs(df, 0.99).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs
    assert (1, 4) not in pairs


def test_multimodal_feature_extraction(spark):
    media = spark.createDataFrame(
        [(f"img://{i}", f"payload-{i}".encode()) for i in range(50)],
        "media_id string, payload binary",
    )
    out = MM.extract_features(media).collect()
    assert len(out) == 50
    by_id = {r["media_id"]: r for r in out}
    r0 = by_id["img://0"]
    assert r0["n_bytes"] == len(b"payload-0")
    assert 64 <= r0["width"] < 256 and 64 <= r0["height"] < 256
    assert len(r0["features"]) == MM.FEATURE_DIM
    # deterministic across runs
    again = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert again["img://0"]["features"] == r0["features"]


def test_resize_media_shapes_and_determinism(spark):
    media = spark.createDataFrame(
        [(f"img://{i}", f"payload-{i}".encode()) for i in range(20)],
        "media_id string, payload binary",
    )
    out = {r["media_id"]: r for r in MM.resize_media(media, 32, 32).collect()}
    assert len(out) == 20
    r = out["img://3"]
    assert (r["width"], r["height"]) == (32, 32)
    assert 64 <= r["orig_width"] < 256
    assert len(bytes(r["payload"])) == 16  # md5 thumbnail stand-in
    again = {x["media_id"]: x for x in MM.resize_media(media, 32, 32).collect()}
    assert bytes(again["img://3"]["payload"]) == bytes(r["payload"])
    with pytest.raises(Exception, match="NotImplementedError|real media"):
        MM.resize_media(media, decoder="real").collect()


def test_sample_frames_fan_out(spark):
    """One media row fans out to ceil(n_frames / every_n) rows with the
    deterministic 1..16 frame count; features differ per frame."""
    import hashlib as _hl
    media = spark.createDataFrame(
        [(f"v://{i}", f"video-{i}".encode()) for i in range(20)],
        "media_id string, payload binary",
    )
    rows = MM.sample_frames(media, every_n=2).collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {f"v://{i}" for i in range(20)}
    for mid, rs in by_id.items():
        payload = f"video-{mid.split('/')[-1].split('v:')[-1]}"
        n = 1 + _hl.md5(mid.replace("v://", "video-").encode()).digest()[2] % 16
        assert rs[0]["n_frames"] == n
        assert len(rs) == (n + 1) // 2  # every 2nd frame from 0
        assert sorted(r["frame_index"] for r in rs) == list(range(0, n, 2))
    multi = [rs for rs in by_id.values() if len(rs) > 1][0]
    feats = {tuple(r["features"]) for r in multi}
    assert len(feats) == len(multi)  # per-frame features differ


def test_multimodal_real_decoder_is_stubbed(spark):
    media = spark.createDataFrame(
        [("m1", b"x")], "media_id string, payload binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|real media"):
        MM.extract_features(media, decoder="real").collect()


def test_media_spans_payloads(spark, small_corpus):
    from mr_crawly_spark.datagen import corpus_to_spark

    docs, *_ = corpus_to_spark(spark, small_corpus)
    payloads = MM.media_spans_to_payloads(docs)
    n = payloads.count()
    assert n > 0
    assert payloads.filter(F.col("payload").isNull()).count() == 0


def test_lsh_indexed_equals_oneshot(spark):
    """verdict r2 #3: the build-once LSH index (bucket once, persist
    partitioned by _bucket, query many) returns exactly what the one-shot
    helper returns for every query — queries prune to probed buckets
    instead of re-scoring the full table."""
    rng = [
        (i, [((i * 13 + j * 5) % 23 - 11) / 11.0 for j in range(16)])
        for i in range(500)
    ]
    df = spark.createDataFrame(rng, "vec_id long, embedding array<float>")
    indexed, planes = SIM.lsh_index(df, n_planes=4, dim=16)
    indexed = indexed.repartition(4, "_bucket").persist()
    try:
        for qid in (7, 123):
            q = rng[qid][1]
            got = SIM.ann_lsh_topk_indexed(indexed, planes, q, k=10).collect()
            want = SIM.ann_lsh_topk(df, q, k=10, n_planes=4).collect()
            assert [tuple(r) for r in got] == [tuple(r) for r in want]
            # the indexed query's scan is bucket-pruned, not a full pass
            plan = SIM.ann_lsh_topk_indexed(
                indexed, planes, q, k=10
            )._jdf.queryExecution().optimizedPlan().toString()
            assert "_bucket" in plan and " IN " in plan
    finally:
        indexed.unpersist()


def test_embedding_neardup_multitable_amplification(spark):
    """OR-amplification: n_tables=2 recovers every single-table pair from
    BOTH tables (union semantics), and planted exact duplicates survive."""
    rng = [
        (i, [((i * 13 + j * 5) % 23 - 11) / 11.0 for j in range(16)])
        for i in range(300)
    ]
    rows = rng + [(i + 10**9, v) for i, v in rng[:30]]  # planted duplicates
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def pairs(n_tables):
        return {
            (r["id_a"], r["id_b"])
            for r in SIM.embedding_neardup_pairs(
                df, threshold=0.98, n_planes=6, dim=16, n_tables=n_tables
            ).collect()
        }

    two = pairs(2)
    one = pairs(1)
    assert one <= two          # amplification only ADDS candidates
    for i, _ in rng[:30]:
        assert (i, i + 10**9) in two  # planted dups all recovered


def test_connected_components_transitivity(spark):
    """Pairs A~B, B~C must collapse to ONE cluster (pairwise dedup alone
    under-dedups); chains prove multi-iteration propagation; singletons
    keep their own id; keeper = smallest cluster member."""
    ids = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 5), (8, 9)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in D.connected_components(ids, pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5,
                   7: 7, 8: 8, 9: 8, 10: 10}
    keep = {
        r["doc_id"]: r["is_keeper"]
        for r in D.cluster_keepers(ids, pairs).collect()
    }
    assert [k for k, v in sorted(keep.items()) if v] == [1, 5, 7, 8, 10]


def test_connected_components_on_lsh_pairs(docs_df):
    """End-to-end with real LSH pairs: exact dups 1/3 and near-dup 2 merge
    into doc 1's cluster; unrelated docs stay apart."""
    pairs = D.minhash_lsh_pairs(docs_df)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in D.connected_components(
            docs_df.select("doc_id"), pairs
        ).collect()
    }
    assert got[1] == got[3] == 1      # exact dups share the cluster
    assert got[6] == 6                # independent doc untouched
    assert len(got) == 6              # every doc labeled


def test_star_contraction_chain_converges_in_log_rounds(spark):
    """r3 verdict #6: on an adversarial-diameter graph (a 10^3-node chain)
    plain min-label propagation needs ~10^3 rounds; large-star/small-star
    contraction must converge in ~log n rounds and still label every node
    with the component minimum."""
    n = 1000
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    out, rounds = D.connected_components_star(
        ids, pairs, with_rounds=True
    )
    labels = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert labels == {i: 0 for i in range(n)}  # one component, min label 0
    assert rounds <= 15  # ~log2(1000) + slack, NOT O(n)


def test_star_contraction_matches_label_propagation(spark):
    """Property: star contraction and plain min-label propagation agree on
    an arbitrary graph mixing chains, stars, triangles and singletons."""
    import random

    rng = random.Random(42)
    n = 300
    edges = set()
    # random sparse edges + a few deliberate chains
    for _ in range(250):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    for start in (200, 240, 270):
        for i in range(start, min(start + 25, n - 1)):
            edges.add((i, i + 1))
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        sorted(edges), "id_a long, id_b long"
    )
    plain = {
        (r["doc_id"], r["cluster_id"])
        for r in D.connected_components(ids, pairs).collect()
    }
    star = {
        (r["doc_id"], r["cluster_id"])
        for r in D.connected_components_star(ids, pairs).collect()
    }
    assert star == plain


def test_edit_distance_on_candidates_planted(spark):
    """Levenshtein verification on LSH candidates: planted suffix-edited
    copies must surface with exactly their edit distance; identical copies
    with 0; max_edit filters."""
    rows = [(i, f"alpha beta gamma delta epsilon {i} zeta eta theta") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    edited = docs.withColumn("doc_id", F.col("doc_id") + 1000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" xy"))
    )
    both = docs.unionByName(edited)
    pairs = D.minhash_lsh_pairs(both, n_hashes=8, bands=4, shingle_n=3)
    rated = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in D.edit_distance_on_candidates(both, pairs).collect()
    }
    planted = {(i, i + 1000) for i in range(40)}
    found = planted & set(rated)
    assert found  # banding recovered planted near-identical pairs
    assert all(rated[p] == 3 for p in found)  # " xy" = 3 edits
    capped = {
        (r["id_a"], r["id_b"])
        for r in D.edit_distance_on_candidates(both, pairs, max_edit=2).collect()
    }
    assert not (capped & planted)  # the filter is live
