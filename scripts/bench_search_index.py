"""Build-once inverted-index evidence (BENCH/search_index.json).

Quantifies the retrieval story on a larger synthetic corpus: per-query
latency of (a) the per-query corpus rescan (curation.bm25_scores — the
only pre-round-5h way to find topic documents), (b) DAAT top-k over an
in-memory index, and (c) DAAT top-k over the PERSISTED term-bucket-
partitioned index (search.write_index — the parquet layout where a query
prunes to its terms' directories). Also records the one-time build +
write cost so the break-even point is explicit, and the fraction of
index files the pruned query actually reads.

Usage: python scripts/bench_search_index.py [n_docs] [n_queries]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mr_crawly_spark.operators.curation import bm25_scores  # noqa: E402
from mr_crawly_spark.operators.search import (  # noqa: E402
    build_inverted_index,
    load_index,
    search_topk,
    term_bucket_of,
    write_index,
)
from mr_crawly_spark.session import get_spark  # noqa: E402

VOCAB_SIZE = 4096  # each word hits ~DOC_LEN/VOCAB_SIZE ≈ 1% of docs —
# query terms are SELECTIVE, the regime an index exists for (a 32-word
# vocab makes every term a stopword and the matched postings ARE the
# corpus, hiding the index's point)
DOC_LEN = 40
QUERIES = [
    ["w0001", "w0733", "w2048"],
    ["w3131", "w0512"],
    ["w1024", "w2222", "w3333", "w0077"],
    ["w4000"],
    ["w0100", "w0200", "w0300"],
    ["w1111", "w3999"],
    ["w2500", "w0042"],
    ["w0640", "w1280", "w2560"],
]


def synthetic_docs(spark, n: int):
    """Deterministic corpus built JVM-side: token j of doc i is
    w%04d of (i*31 + j*j*7 + j) % VOCAB_SIZE — uniform selectivity,
    every doc nonempty."""
    cols = [
        F.format_string(
            "w%04d",
            ((F.col("id") * 31 + j * j * 7 + j) % VOCAB_SIZE).cast("int"),
        )
        for j in range(DOC_LEN)
    ]
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *cols).alias("text"),
    )


def timed(fn, reps=1):
    t0 = time.monotonic()
    for _ in range(reps):
        fn()
    return (time.monotonic() - t0) / reps


def measure(spark, n: int, queries) -> dict:
    docs = synthetic_docs(spark, n).localCheckpoint()
    n_docs = docs.count()
    path = f"/tmp/bench_search_index_{n}"
    shutil.rmtree(path, ignore_errors=True)

    # warmup (JVM/codegen on both plan shapes)
    search_topk(
        build_inverted_index(docs, n_doc_blocks=16), ["w0001"], n_docs, k=10
    ).collect()
    bm25_scores(docs, ["w0001"]).orderBy(F.desc("bm25"), "doc_id").limit(
        10
    ).collect()

    # (a) per-query corpus rescan — cost ∝ corpus size
    def rescan(q):
        bm25_scores(docs, q).orderBy(F.desc("bm25"), "doc_id").limit(
            50
        ).collect()

    rescan_sec = timed(lambda: [rescan(q) for q in queries]) / len(queries)

    # one-time build + persist
    t0 = time.monotonic()
    idx = build_inverted_index(docs, n_doc_blocks=16).localCheckpoint()
    idx.count()
    build_sec = time.monotonic() - t0
    t0 = time.monotonic()
    write_index(idx, path, n_term_buckets=64)
    write_sec = time.monotonic() - t0

    # (b) persisted, partition-pruned — cost ∝ matched postings
    loaded, n_buckets = load_index(spark, path)
    disk_sec = timed(
        lambda: [
            search_topk(
                loaded, q, n_docs, k=50, n_term_buckets=n_buckets
            ).collect()
            for q in queries
        ]
    ) / len(queries)

    touched = len({term_bucket_of(t, n_buckets) for t in queries[0]})
    shutil.rmtree(path, ignore_errors=True)
    return {
        "n_docs": n_docs,
        "rescan_sec_per_query": round(rescan_sec, 3),
        "index_build_sec": round(build_sec, 3),
        "index_write_sec": round(write_sec, 3),
        "disk_index_sec_per_query": round(disk_sec, 3),
        "speedup_vs_rescan": round(rescan_sec / disk_sec, 2),
        "buckets_touched_q0": touched,
        "n_term_buckets": n_buckets,
        "break_even_queries": round(
            (build_sec + write_sec) / max(rescan_sec - disk_sec, 1e-9), 1
        ),
    }


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else len(QUERIES)
    queries = QUERIES[:n_queries]
    spark = get_spark(
        app_name="search-index-bench",
        master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # two corpus sizes: the rescan should grow ~linearly with the corpus,
    # the pruned index query should track matched postings (~selectivity
    # * corpus, but dominated by fixed job overhead at local scale — the
    # growth RATIO is the honest signal)
    small = measure(spark, n, queries)
    large = measure(spark, 4 * n, queries)
    out = {
        "vocab": VOCAB_SIZE,
        "doc_len": DOC_LEN,
        "n_queries": len(queries),
        "small": small,
        "large_4x": large,
        "rescan_growth_4x_corpus": round(
            large["rescan_sec_per_query"] / small["rescan_sec_per_query"], 2
        ),
        "indexed_growth_4x_corpus": round(
            large["disk_index_sec_per_query"]
            / small["disk_index_sec_per_query"],
            2,
        ),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "search_index.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
