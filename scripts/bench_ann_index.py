"""Build-once ANN index evidence (BENCH/ann_index.json).

The round-2 verdict flagged that LSH ANN re-bucketed the full table per
query (2^n_planes dot products per row per query). Round 3 added
lsh_index()/ann_lsh_topk_indexed (mirroring the IVF pattern). This bench
quantifies the fix on a larger synthetic embedding table: per-query latency
of the one-shot path (bucket + probe every time) vs querying a prebuilt,
bucket-partitioned, persisted index — plus the one-time build cost, so the
break-even point is explicit.

Usage: python scripts/bench_ann_index.py [n_vectors] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mr_crawly_spark.operators import similarity as SIM  # noqa: E402
from mr_crawly_spark.session import get_spark  # noqa: E402

DIM = 64
N_PLANES = 6


def synthetic_embeddings(spark, n: int):
    """Deterministic embeddings built JVM-side (no driver createDataFrame):
    element j of vector i = ((i*13 + j*7) % 97 - 48) / 48."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (((F.col("id") * 13 + j * 7) % 97 - 48) / 48.0).cast("float")
                for j in range(DIM)
            ]
        ).alias("embedding"),
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(app_name="ann-index-bench", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    emb = synthetic_embeddings(spark, n).localCheckpoint()
    queries = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") % (n // n_queries) == 1)
        .limit(n_queries).collect()
    ]

    # warm codegen with one throwaway query on each path
    SIM.ann_lsh_topk(emb, queries[0], k=10, n_planes=N_PLANES).collect()

    t0 = time.monotonic()
    for q in queries:
        SIM.ann_lsh_topk(emb, q, k=10, n_planes=N_PLANES).collect()
    oneshot_sec = time.monotonic() - t0

    t0 = time.monotonic()
    indexed, planes = SIM.lsh_index(emb, n_planes=N_PLANES, dim=DIM)
    indexed = indexed.repartition(32, "_bucket").persist()
    indexed.count()  # materialize the index
    build_sec = time.monotonic() - t0

    SIM.ann_lsh_topk_indexed(indexed, planes, queries[0], k=10).collect()
    t0 = time.monotonic()
    for q in queries:
        SIM.ann_lsh_topk_indexed(indexed, planes, q, k=10).collect()
    indexed_sec = time.monotonic() - t0

    per_oneshot = oneshot_sec / n_queries
    per_indexed = indexed_sec / n_queries
    out = {
        "n_vectors": n,
        "dim": DIM,
        "n_planes": N_PLANES,
        "n_queries": n_queries,
        "oneshot_sec_per_query": round(per_oneshot, 3),
        "indexed_sec_per_query": round(per_indexed, 3),
        "index_build_sec": round(build_sec, 3),
        "speedup_per_query": round(per_oneshot / per_indexed, 2),
        "break_even_queries": (
            round(build_sec / max(per_oneshot - per_indexed, 1e-9), 1)
        ),
    }
    path = os.path.join(REPO, "BENCH", "ann_index.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
