"""Evidence for remove_duplicated_spans' cost model: the token-level
explode -> anti-join -> rebuild is semi-join-bounded to TOUCHED documents,
so a clean corpus pays only the gram agg while cost grows with the
contamination rate, not the corpus size. Same discipline as the other
BENCH artifacts: distributively synthesized input (unique tokens keyed on
(doc, j) — see bench_dedup_scaling.py for why a modular vocabulary is
degenerate), pinned partitioning, noop-writer forcing (a count() would let
Catalyst prune the rebuild's concat_ws entirely), host-capacity probes
bracketing the measurement. Writes BENCH/despan_cost.json. Usage:

    python scripts/bench_despan.py [n_docs] [out_name]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def corpus(spark, n: int, contam: float):
    """n unique ~40-token docs; the first ``contam`` fraction get the SAME
    16-token passage appended (every contaminated doc but the min-id
    keeper must then lose exactly those 16 tokens)."""
    from pyspark.sql import functions as F

    base = spark.range(n, numPartitions=32)
    tok = lambda j: F.substring(
        F.md5(F.concat(F.col("id").cast("string"), F.lit(f"_{j}"))), 1, 6
    )
    passage = " ".join(f"shared{k}" for k in range(16))
    text = F.concat_ws(" ", *[tok(j) for j in range(40)])
    text = F.when(
        F.col("id") < int(n * contam),
        F.concat(text, F.lit(" " + passage)),
    ).otherwise(text)
    return base.select(F.col("id").alias("doc_id"), text.alias("text"))


def run_once(spark, n: int, contam: float) -> dict:
    from pyspark.sql import functions as F

    from mr_crawly_spark.operators.dedup import remove_duplicated_spans

    out = remove_duplicated_spans(corpus(spark, n, contam), span_tokens=8)
    t0 = time.monotonic()
    out.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    n_touched = out.filter(F.col("n_removed") > 0).count()
    expect = max(int(n * contam) - 1, 0)  # all contaminated but the keeper
    assert n_touched == expect, f"touched {n_touched} != expected {expect}"
    return {
        "contam_rate": contam,
        "docs_touched": int(n_touched),
        "elapsed_sec": round(dt, 3),
    }


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    out_name = sys.argv[2] if len(sys.argv) > 2 else "despan_cost.json"
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from bench import host_capacity_probe
    from mr_crawly_spark.session import get_spark

    spark = get_spark(
        app_name="despan-cost", master="local[8]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    probe_before = host_capacity_probe(8)
    run_once(spark, max(n // 8, 1000), 0.1)  # JIT/codegen warmup, untimed
    levels = [run_once(spark, n, c) for c in (0.0, 0.1, 0.5)]
    probe_after = host_capacity_probe(8)
    clean = levels[0]["elapsed_sec"]
    result = {
        "job": "remove_duplicated_spans over n unique ~40-token docs; a "
               "shared 16-token passage appended to the first "
               "contam_rate fraction (min-id doc keeps it)",
        "n_docs": n,
        "levels": levels,
        "clean_corpus_sec": clean,
        "overhead_vs_clean": {
            str(lv["contam_rate"]): round(lv["elapsed_sec"] - clean, 3)
            for lv in levels[1:]
        },
        "claim": "the rebuild explode runs only for touched docs "
                 "(semi-join gate): a CLEAN corpus pays the gram agg "
                 "alone; any contamination adds the rebuild stages' "
                 "fixed shuffle cost once, after which the marginal "
                 "per-touched-doc cost is small (compare the 0.1 -> 0.5 "
                 "delta against the 0 -> 0.1 step)",
        "host_capacity": {"before": probe_before, "after": probe_after},
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
