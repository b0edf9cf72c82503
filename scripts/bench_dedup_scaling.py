"""N-vs-4N scaling for the TRAINING-PIPELINE dedup path (the frontier job
has its own gate in bench_scaling.py; this measures the other headline
workload): MinHash -> LSH band join -> star-contraction closure -> keeper
selection (dedup.neardup_dedup) over a distributively-synthesized corpus
with planted duplicates.

Same measurement discipline as bench_scaling.py: the input is synthesized
with spark.range (no files, no driver data), partitioning pinned
IDENTICALLY at both levels (32 splits / 32 shuffle partitions — on a real
cluster the split count comes from the data, not the executor count),
fresh JVM per level, best-of-repeats, host-capacity probes bracketing the
measurement. Writes BENCH/dedup_scaling.json. Usage:

    python scripts/bench_dedup_scaling.py [n_docs] [repeats] [out_name]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
from pyspark.sql import functions as F
from mr_crawly_spark.session import get_spark
from mr_crawly_spark.operators.dedup import neardup_dedup

cpus, n_docs, repeats = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
PARTS = 32
spark = get_spark(app_name=f"dedup-scaling-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=PARTS)
spark.sparkContext.setLogLevel("ERROR")


def corpus(n):
    # ~25-token synthetic docs, UNIQUE per doc (tokens keyed on (src, j),
    # not a small modular vocabulary — a 9973-value cycle collapsed 200k
    # docs into ~20 identical copies each, blowing the band join up
    # quadratically and chaining CC into a handful of giant clusters:
    # a worst-case stress, not a throughput measurement); every 10th doc
    # is a verbatim copy of its predecessor (planted 10% dup pairs)
    base = spark.range(n, numPartitions=PARTS)
    src = F.when(F.col("id") % 10 == 9, F.col("id") - 1).otherwise(F.col("id"))
    tok = lambda j: F.substring(
        F.md5(F.concat(src.cast("string"), F.lit(f"_{j}"))), 1, 6
    )
    text = F.concat_ws(" ", *[tok(j) for j in range(25)])
    return base.select(F.col("id").alias("doc_id"), text.alias("text"))


def run_once(n):
    t0 = time.monotonic()
    out = neardup_dedup(corpus(n), n_hashes=8, bands=4, shingle_n=3)
    n_kept = out.filter(F.col("kept")).count()
    dt = time.monotonic() - t0
    # md5-derived 6-char tokens are distinct per (src, j), so the only
    # near-dup pairs are the planted copies: keepers == n - n/10 exactly
    assert n_kept == n - n // 10, f"expected {n - n // 10} keepers, got {n_kept}"
    return {"elapsed_sec": round(dt, 3), "n_kept": int(n_kept),
            "docs_per_sec": round(n / dt, 1)}


run_once(max(n_docs // 8, 1000))  # JIT/codegen warmup, untimed
runs = [run_once(n_docs) for _ in range(repeats)]
best = min(r["elapsed_sec"] for r in runs)
print("SCALING_RESULT " + json.dumps({
    "cpus": cpus, "n_docs": n_docs, "runs": runs,
    "best_elapsed_sec": best,
    "best_docs_per_sec": round(n_docs / best, 1),
}))
"""


def run_level(cpus: int, n: int, repeats: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), str(n), str(repeats)],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO},
        timeout=7200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT "):])
    raise RuntimeError(
        f"no result from local[{cpus}]:\n{out.stdout[-2000:]}\n"
        f"{out.stderr[-2000:]}"
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out_name = sys.argv[3] if len(sys.argv) > 3 else "dedup_scaling.json"
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from bench import host_capacity_probe

    # capacity at BOTH levels: on a throttled shared host the 8-proc level
    # may be delivered far fewer effective cores than requested while the
    # 2-proc level gets its full two — raw N->4N efficiency then measures
    # the HOST, not the plan. capacity_adjusted_efficiency divides the
    # observed speedup by the speedup the delivered cores made possible.
    probe2_before = host_capacity_probe(2)
    probe8_before = host_capacity_probe(8)
    rN = run_level(2, n, repeats)
    r4N = run_level(8, n, repeats)
    probe2_after = host_capacity_probe(2)
    probe8_after = host_capacity_probe(8)
    assert rN["runs"][0]["n_kept"] == r4N["runs"][0]["n_kept"], (
        "parallelism changed the dedup answer — determinism violation"
    )
    tN, t4N = rN["best_elapsed_sec"], r4N["best_elapsed_sec"]
    speedup = round(tN / t4N, 3)
    efficiency = round(tN / (4 * t4N), 3)
    eff2 = (probe2_before["effective_cores"] + probe2_after["effective_cores"]) / 2
    eff8 = (probe8_before["effective_cores"] + probe8_after["effective_cores"]) / 2
    delivered_speedup = max(eff8 / max(eff2, 0.1), 1.0)
    result = {
        "job": "neardup_dedup (minhash -> LSH bands -> star-contraction CC "
               "-> keeper selection), planted 10% verbatim duplicates",
        "n_docs": n,
        "repeats": repeats,
        "levels": "local[2] vs local[8], 32 splits + 32 shuffle partitions "
                  "pinned at both levels, fresh JVM each",
        "localN": rN,
        "local4N": r4N,
        "speedup_N_to_4N": speedup,
        "scaling_efficiency": efficiency,
        "delivered_cores": {"at_2": round(eff2, 1), "at_8": round(eff8, 1)},
        "delivered_speedup_bound": round(delivered_speedup, 3),
        "capacity_adjusted_efficiency": round(
            min(speedup / delivered_speedup, 1.0), 3
        ),
        "gate": ">= 0.8 (informational for this job; the BASELINE.json "
                "gate is the frontier job); capacity_adjusted_efficiency "
                "is speedup / delivered-core speedup bound",
        "pass": efficiency >= 0.8,
        "host_capacity": {
            "probe2": {"before": probe2_before, "after": probe2_after},
            "probe8": {"before": probe8_before, "after": probe8_after},
        },
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
