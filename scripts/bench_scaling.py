"""N-vs-4N scaling benchmark (BASELINE.json gate: efficiency >= 0.8).

Runs the SAME frontier-throughput job on the SAME input at N and 4N cores,
each in a fresh JVM, and reports both throughputs plus
efficiency = T_N / (4 * T_4N) = (throughput_4N / throughput_N) / 4.

Core accounting on this box (32 physical cores, no SMT): every task in an
Arrow-UDF stage occupies one JVM task thread AND one Python worker process
(~98% CPU each, measured), plus JVM-side Arrow serialization threads, so
``local[k]`` drives well over 2k cores during UDF stages. The N-vs-4N proxy
must keep BOTH levels inside the machine: local[2] vs local[8] (≈6 vs ≈24
cores of real demand). local[16]/local[32] saturate all 32 cores and
understate scaling rather than measuring it (verified: per-worker CPU stays
pinned but wall time stops improving).

Writes BENCH/scaling.json (or BENCH/<out_name> when given — the 8M/64M
trend points live in scaling_8m.json / scaling_64m.json). Usage:
    python scripts/bench_scaling.py [n_candidates] [repeats] [out_name]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys
from mr_crawly_spark.session import get_spark
from mr_crawly_spark.bench_jobs import frontier_throughput_job

cpus, n, repeats, warm_n = (int(sys.argv[1]), int(sys.argv[2]),
                            int(sys.argv[3]), int(sys.argv[4]))
# Partitioning is pinned IDENTICALLY at both levels (32 input splits, 32
# shuffle partitions): on a real cluster the split count comes from the data
# layout, not the executor count, so the only variable N -> 4N may change is
# task concurrency. Core-proportional partitioning would let local[2] amortize
# per-task overhead over 4x-bigger partitions and understate scaling.
PARTS = 32
spark = get_spark(app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=PARTS)
spark.sparkContext.setLogLevel("ERROR")
kw = dict(n_hosts=10000, per_host_budget=64, salt_partitions=PARTS,
          n_input_partitions=PARTS)
# warmup: whole-stage codegen JIT, Arrow buffers, shuffle dirs — first runs
# are measurably slower (C2 compilation) and would skew the gate. Capped at
# 8M: JIT/codegen warmth is size-independent, and a full-size warmup would
# double the wall-clock of the 64M point for no measurement benefit.
frontier_throughput_job(spark, n_candidates=warm_n, **kw)
runs = [frontier_throughput_job(spark, n_candidates=n, **kw)
        for _ in range(repeats)]
best = min(r["elapsed_sec"] for r in runs)
print("SCALING_RESULT " + json.dumps({
    "cpus": cpus, "n_candidates": n, "runs": runs,
    "best_elapsed_sec": best,
    "best_urls_per_sec": round(n / best, 1),
}))
"""


def run_level(cpus: int, n: int, repeats: int) -> dict:
    warm_n = min(n, 8_000_000)
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), str(n), str(repeats),
         str(warm_n)],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO},
        timeout=7200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT "):])
    raise RuntimeError(f"no result from local[{cpus}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    out_name = sys.argv[3] if len(sys.argv) > 3 else "scaling.json"
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from bench import host_capacity_probe

    # bracket the measurement with effective-CPU probes: the sandbox host
    # is shared, and delivered capacity has been observed to swing 2x+
    # within an hour — a gate number without its capacity context is
    # uninterpretable across rounds
    probe_before = host_capacity_probe(8)
    rN = run_level(2, n, repeats)
    r4N = run_level(8, n, repeats)
    probe_after = host_capacity_probe(8)
    tN, t4N = rN["best_elapsed_sec"], r4N["best_elapsed_sec"]
    efficiency = round(tN / (4 * t4N), 3)
    result = {
        "job": "frontier_throughput (canonicalize -> hash -> seen anti-join -> politeness window)",
        "n_candidates": n,
        "repeats": repeats,
        "levels": "local[2] vs local[8] (N vs 4N task threads; each UDF task "
                  "= 1 JVM thread + 1 Python worker, both levels fit the box)",
        "localN": rN,
        "local4N": r4N,
        "speedup_N_to_4N": round(tN / t4N, 3),
        "scaling_efficiency": efficiency,
        "gate": ">= 0.8",
        "pass": efficiency >= 0.8,
        "host_capacity": {"before": probe_before, "after": probe_after},
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
