"""Diagnose WHICH frontier-pipeline segment stops scaling N -> 4N.

Runs cumulative segments of frontier_throughput_job's pipeline at local[2]
and local[8] (fresh JVM each level, warm within level) and prints per-segment
elapsed + scaling efficiency. Diagnostic only — not part of the bench gate.

Usage: python scripts/profile_scaling.py [n_candidates]
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
from mr_crawly_spark.bench_jobs import frontier_throughput_job, _host_col
from mr_crawly_spark.functions.urls import canonicalize_udf, url_hash_col
from mr_crawly_spark.operators.frontier import select_slice
from mr_crawly_spark.operators.seen import filter_unseen

cpus, n = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(app_name=f"profile-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=max(8, cpus))
spark.sparkContext.setLogLevel("ERROR")
n_hosts, per_host_budget, salt_partitions = 10000, 64, max(8, cpus)

# warmup (full job, same size)
frontier_throughput_job(spark, n_candidates=n, n_hosts=n_hosts,
                        per_host_budget=per_host_budget,
                        salt_partitions=salt_partitions)

n_targets = max(n // 4, 1)

def href_col(id_col, host):
    t = ((id_col * 7 + 1) % n_targets).cast("string")
    form = id_col % 6
    return (
        F.when(form == 0, F.concat(F.lit("../p/"), t))
        .when(form == 1, F.concat(F.lit("/p/"), t))
        .when(form == 2, F.concat(F.lit("https://"), host, F.lit(":443/p/"), t, F.lit("#frag")))
        .when(form == 3, F.concat(F.lit("https://"), host, F.lit("/p/"), t))
        .when(form == 4, F.concat(F.lit("../p/"), t, F.lit("?x=%7e")))
        .otherwise(F.concat(F.lit("/p/"), t, F.lit("#s")))
    )

def canonical_col(id_col, host):
    t = ((id_col * 7 + 1) % n_targets).cast("string")
    suffix = F.when(id_col % 6 == 4, F.lit("?x=~")).otherwise(F.lit(""))
    return F.concat(F.lit("https://"), host, F.lit("/p/"), t, suffix)

ids = spark.range(n)
cand = ids.select(
    F.concat(F.lit("https://"), _host_col(F.col("id"), n_hosts),
             F.lit("/p/"), F.col("id").cast("string")).alias("base"),
    href_col(F.col("id"), _host_col(F.col("id"), n_hosts)).alias("href"),
    F.col("id"),
)
seen = spark.range(n // 2).select(
    canonical_col(F.col("id"), _host_col(F.col("id"), n_hosts)).alias("url")
).withColumn("url_hash", url_hash_col(F.col("url"))).persist()
seen.count()

def seg_canon():
    return cand.select(
        canonicalize_udf(F.col("base"), F.col("href")).alias("url")
    ).filter(F.col("url").isNotNull())

def seg_hash():
    return seg_canon().withColumn("url_hash", url_hash_col(F.col("url")))

def seg_dedup():
    return seg_hash().dropDuplicates(["url_hash", "url"])

def seg_anti():
    return filter_unseen(seg_dedup(), seen)

def seg_full():
    fresh = seg_anti()
    frontier = fresh.select(
        "url", "url_hash",
        F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"),
        F.lit("pending").alias("status"), F.lit(0.5).alias("priority"),
        F.lit(0).alias("retry_count"), F.lit(0.0).alias("next_attempt_at"),
        F.lit(0).alias("discovered_round"),
    )
    budgets = spark.createDataFrame(
        [(f"site{h}.test", per_host_budget) for h in range(n_hosts)],
        "host string, k_host int",
    )
    return select_slice(frontier, budgets, t_round=1.0,
                        salt_partitions=salt_partitions,
                        budget_rows=n_hosts)

results = {}
for name, fn in [("canon", seg_canon), ("hash", seg_hash),
                 ("dedup", seg_dedup), ("anti", seg_anti), ("full", seg_full)]:
    t0 = time.monotonic()
    cnt = fn().count()
    results[name] = {"elapsed": round(time.monotonic() - t0, 2), "rows": cnt}
print("PROFILE_RESULT " + json.dumps({"cpus": cpus, "n": n, "segments": results}))
"""


def run_level(cpus: int, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), str(n)],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO}, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("PROFILE_RESULT "):
            return json.loads(line[len("PROFILE_RESULT "):])
    raise RuntimeError(f"no result local[{cpus}]:\n{out.stdout[-3000:]}\n{out.stderr[-3000:]}")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    rN = run_level(2, n)
    r4N = run_level(8, n)
    report = {"n": n, "levels": {}}
    for name in rN["segments"]:
        tN = rN["segments"][name]["elapsed"]
        t4 = r4N["segments"][name]["elapsed"]
        report["levels"][name] = {
            "local2_sec": tN, "local8_sec": t4,
            "efficiency": round(tN / (4 * t4), 3),
            "rows": rN["segments"][name]["rows"],
        }
    print(json.dumps(report, indent=2))
    with open(os.path.join(REPO, "BENCH", "profile_scaling.json"), "w") as f:
        json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
