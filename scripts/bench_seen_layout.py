"""Seen-set layout benchmark: per-round anti-join cost with the engine's
partitioned+sorted BASE vs a naive unlayouted seen table.

The engine rebuilds the seen base once per flush cycle (repartition +
sortWithinPartitions on (url_hash, url), localCheckpoint with AQE off so
the layout survives — see engine._seen_base). Every round's membership
anti-join then shuffles and sorts ONLY the candidates; the base
contributes no exchange and no sort. This script times R rounds of a
slice-sized candidate anti-join against an N-row seen set both ways and
reports the per-round speedup. Writes BENCH/seen_layout.json. Usage:

    python scripts/bench_seen_layout.py [n_seen] [n_cand] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mr_crawly_spark.session import get_spark  # noqa: E402


def seen_df(spark, n):
    return spark.range(n, numPartitions=64).select(
        F.concat(F.lit("https://h"), F.pmod(F.col("id"), F.lit(1000)).cast("string"),
                 F.lit(".test/p/"), F.col("id").cast("string")).alias("url")
    ).withColumn("url_hash", F.xxhash64("url"))


def cand_df(spark, n, offset):
    # half the candidates are already seen, half are new
    return spark.range(n, numPartitions=8).select(
        F.concat(F.lit("https://h"),
                 F.pmod(F.col("id") * 2 + offset, F.lit(1000)).cast("string"),
                 F.lit(".test/p/"), (F.col("id") * 2 + offset).cast("string")).alias("url")
    ).withColumn("url_hash", F.xxhash64("url"))


def run_rounds(spark, base, n_cand, rounds):
    times = []
    for r in range(rounds):
        cand = cand_df(spark, n_cand, offset=r)
        t0 = time.monotonic()
        cand.join(base, ["url_hash", "url"], "left_anti").write.format(
            "noop"
        ).mode("overwrite").save()
        times.append(time.monotonic() - t0)
    return times


def main() -> int:
    n_seen = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_cand = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark(app_name="seen-layout")
    spark.sparkContext.setLogLevel("ERROR")
    # the base side must actually join (no broadcast) to model 10^10 rows
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    # naive: the seen table as a plain checkpointed frame (layoutless)
    naive = seen_df(spark, n_seen).localCheckpoint()
    t_naive = run_rounds(spark, naive, n_cand, rounds)
    naive.unpersist()

    # engine layout: partitioned + sorted base, checkpointed with AQE off
    part = seen_df(spark, n_seen).repartition(
        64, F.col("url_hash"), F.col("url")
    ).sortWithinPartitions("url_hash", "url")
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t0 = time.monotonic()
    try:
        base = part.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    build_sec = time.monotonic() - t0
    t_base = run_rounds(spark, base, n_cand, rounds)

    per_naive = round(min(t_naive), 3)
    per_base = round(min(t_base), 3)
    out = {
        "n_seen": n_seen,
        "n_candidates_per_round": n_cand,
        "rounds_timed": rounds,
        "per_round_sec_naive": per_naive,
        "per_round_sec_with_base_layout": per_base,
        "base_build_sec_once_per_flush_cycle": round(build_sec, 3),
        "per_round_speedup": round(per_naive / per_base, 2),
        "break_even_rounds": round(build_sec / max(per_naive - per_base, 1e-9), 1),
        "note": (
            "naive re-shuffles+sorts the full seen set every round; the "
            "base layout pays one partition+sort pass per flush cycle and "
            "then each round touches only its candidates"
        ),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "seen_layout.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
