"""Round-cost-vs-frontier-size benchmark (round-1 verdict #7 "Done" bar:
round wall-time ~flat as the frontier grows 2M -> 20M pending rows).

A round's cost has two sides:

- WRITE side: merge-on-read deltas — the engine commits only the touched
  rows (slice + new discoveries), never a full-table join/rewrite, so the
  write cost is structurally independent of frontier size (engine.run_round
  round_updates; catalog mode="delta").
- READ side: the politeness slice. The pending set must be scanned (a
  vectorized parquet scan with status/next_attempt_at pushdown), but the
  per-host top-k WINDOW no longer shuffles every eligible row: the literal
  k_cap rank bound triggers Catalyst's InferWindowGroupLimit, a map-side
  partial top-k BEFORE the exchange, so shuffle input is <= k_cap rows per
  host per map partition regardless of pending-set size.

This script measures the read side directly: same 10k hosts (constant
round work — the slice is <= hosts x k_cap rows at both sizes), pending
set grown 10x, slice timed at both; plus the same 20M slice WITHOUT the
k_cap to show what the window-group-limit saves. Writes
BENCH/frontier_growth.json. Usage:

    python scripts/bench_frontier_growth.py [small_n] [grow_factor]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mr_crawly_spark.datagen import MAX_PER_HOST_PER_ROUND  # noqa: E402
from mr_crawly_spark.operators.frontier import select_slice  # noqa: E402
from mr_crawly_spark.session import get_spark  # noqa: E402

N_HOSTS = 10_000
SALT = 16


def write_frontier(spark, path: str, n_rows: int) -> None:
    """A flushed-snapshot-shaped pending frontier: n_rows over N_HOSTS
    hosts, 30% of rows on one hot host (axis-B skew)."""
    host = F.concat(
        F.lit("site"),
        F.when(F.col("id") % 10 < 3, F.lit(0)).otherwise(
            F.pmod(F.xxhash64(F.col("id")), F.lit(N_HOSTS))
        ).cast("string"),
        F.lit(".test"),
    )
    (
        spark.range(n_rows, numPartitions=64)
        .select(
            F.concat(F.lit("https://"), host, F.lit("/p/"), F.col("id").cast("string")).alias("url"),
            F.xxhash64(F.col("id")).alias("url_hash"),
            host.alias("host"),
            F.lit("pending").alias("status"),
            (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1000)) / 1000.0).alias("priority"),
            F.lit(0).alias("retry_count"),
            F.lit(0.0).alias("next_attempt_at"),
            F.lit(0).alias("discovered_round"),
        )
        .write.mode("overwrite").parquet(path)
    )


def time_slice(spark, path: str, k_cap: int | None, repeats: int = 3) -> dict:
    budgets = spark.createDataFrame(
        [(f"site{h}.test", MAX_PER_HOST_PER_ROUND) for h in range(N_HOSTS)],
        "host string, k_host int",
    )
    best = None
    n_slice = None
    for _ in range(repeats):
        frontier = spark.read.parquet(path)
        t0 = time.monotonic()
        sliced = select_slice(
            frontier, budgets, t_round=1.0,
            salt_partitions=32, salt=SALT, k_cap=k_cap, budget_rows=N_HOSTS,
        )
        n_slice = sliced.count()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return {"slice_rows": n_slice, "best_sec": round(best, 3)}


def main() -> int:
    small_n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    grow = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    big_n = small_n * grow
    spark = get_spark(app_name="frontier-growth")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="growth_")
    p_small, p_big = os.path.join(tmp, "small"), os.path.join(tmp, "big")
    write_frontier(spark, p_small, small_n)
    write_frontier(spark, p_big, big_n)

    small = time_slice(spark, p_small, k_cap=MAX_PER_HOST_PER_ROUND)
    big = time_slice(spark, p_big, k_cap=MAX_PER_HOST_PER_ROUND)
    big_nocap = time_slice(spark, p_big, k_cap=None)

    ratio = round(big["best_sec"] / small["best_sec"], 3)
    out = {
        "n_hosts": N_HOSTS,
        "pending_small": small_n,
        "pending_big": big_n,
        "grow_factor": grow,
        "slice_small": small,
        "slice_big": big,
        "slice_big_without_k_cap": big_nocap,
        "time_ratio_big_vs_small": ratio,
        "window_group_limit_speedup_at_big": round(
            big_nocap["best_sec"] / big["best_sec"], 3
        ),
        "note": (
            "constant 10k-host slice over a pending set grown "
            f"{grow}x; flat = ratio << {grow} (scan grows, shuffle doesn't). "
            "Write side is delta-only by construction (touched rows)."
        ),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "frontier_growth.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
