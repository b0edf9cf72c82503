"""Measure the content-addressed archive's write tradeoff (engine
archive_dedup): a recrawl cycle re-fetching N pages of which a fraction f
actually changed either (a) re-archives all N full span payloads
(append-always, the reference-parity default) or (b) pays one
fingerprint agg + one join to write only f*N payloads plus N tiny visit
rows. The question a 100-TB operator asks: does the filter's join cost
eat the write savings? Usage:

    PYTHONPATH=/root/repo python scripts/bench_archive_dedup.py [N] [f]

Writes BENCH/archive_dedup.json: rows/bytes/seconds for both modes at
the same input, plus the byte and time ratios.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mr_crawly_spark.engine import _span_fp  # noqa: E402
from mr_crawly_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH", "archive_dedup.json")


def synth_pages(spark, n: int, changed_frac: float, version: int):
    """n re-fetched pages with realistic span payloads (~1.5 KB each);
    a deterministic changed_frac of them carry NEW content this cycle."""
    base = spark.range(n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 1000).cast("string"),
                 F.lit(".test/p"), F.col("id").cast("string")).alias("url"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.col("id"),
    )
    changed = (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1000))
               < F.lit(int(changed_frac * 1000)))
    ver = F.when(changed, F.lit(version)).otherwise(F.lit(0))
    # ~0.5 KB of HIGH-ENTROPY text per span (chained md5 hex): templated
    # filler compresses ~50x in parquet, which would price the saved
    # writes at ~nothing and make append-always look artificially cheap —
    # real fetched HTML does not compress like a repeated literal
    def span(k):
        seed = F.concat(F.col("id").cast("string"), F.lit(f":{k}:"),
                        ver.cast("string"))
        chunk = F.md5(seed)
        for _ in range(4):
            chunk = F.concat(chunk, F.md5(chunk))
        return F.struct(
            F.lit("text").alias("kind"),
            chunk.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(k * 10).alias("offset"),
        )
    return base.select(
        "url", "url_hash",
        F.array(*[span(k) for k in range(10)]).alias("spans"),
        changed.alias("_changed"),
    )


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    f_changed = float(sys.argv[2]) if len(sys.argv) > 2 else 0.10
    spark = get_spark(app_name="bench-archive-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    wh = "/tmp/bench_archive_dedup"
    shutil.rmtree(wh, ignore_errors=True)

    # the prior cycle's archive (version 0 everywhere) — both modes read it
    archive = synth_pages(spark, n, 0.0, 0).drop("_changed")
    archive.write.mode("overwrite").parquet(f"{wh}/archive")
    refetch = synth_pages(spark, n, f_changed, 1).localCheckpoint()
    n_changed = refetch.filter("_changed").count()
    refetch = refetch.drop("_changed")

    # mode A: append-always (reference parity) — re-archive all N payloads
    t0 = time.time()
    refetch.write.mode("overwrite").parquet(f"{wh}/appended")
    t_append = time.time() - t0
    b_append = dir_bytes(f"{wh}/appended")

    # mode B: content-addressed — fingerprint agg + join, write only the
    # changed payloads + N tiny visit rows (the engine's exact plan shape)
    t0 = time.time()
    arch_fp = (
        spark.read.parquet(f"{wh}/archive")
        .groupBy("url_hash", "url")
        .agg(F.max_by(_span_fp(), F.lit(0)).alias("_arch_fp"))
    )
    deduped = (
        refetch.withColumn("_fp", _span_fp())
        .join(arch_fp, ["url_hash", "url"], "left")
        .filter(F.col("_arch_fp").isNull() | (F.col("_arch_fp") != F.col("_fp")))
        .drop("_arch_fp")
    )
    deduped.drop("_fp").write.mode("overwrite").parquet(f"{wh}/deduped")
    refetch.select(
        "url", "url_hash", F.lit(1).alias("round"),
        _span_fp().alias("fingerprint"), F.lit("bench").alias("run_id"),
    ).write.mode("overwrite").parquet(f"{wh}/visits")
    t_dedup = time.time() - t0
    b_dedup = dir_bytes(f"{wh}/deduped") + dir_bytes(f"{wh}/visits")
    rows_dedup = spark.read.parquet(f"{wh}/deduped").count()

    result = {
        "n_refetched": n,
        "changed_frac": f_changed,
        "n_changed": n_changed,
        "append_always": {"rows": n, "bytes": b_append,
                          "sec": round(t_append, 2)},
        "content_addressed": {"pages_rows": rows_dedup, "bytes": b_dedup,
                              "sec": round(t_dedup, 2)},
        "bytes_ratio": round(b_dedup / b_append, 4),
        "sec_ratio": round(t_dedup / t_append, 4),
        "note": "content_addressed.sec includes the archive fingerprint agg "
                "+ join + the visits write; bytes include the visits table. "
                "sec_ratio is measured against page-cached LOCAL writes "
                f"(~{b_append / t_append / 1e6:.0f} MB/s effective): at that "
                "bandwidth the md5 fingerprint CPU dominates. On a cluster "
                "writing to a distributed store at ~50-100 MB/s per "
                "executor, the 1/bytes_ratio write reduction is the "
                "dominant term — and the archive's cumulative size (every "
                "downstream scan, snapshot, and replication cost) shrinks "
                "by the same factor every cycle.",
    }
    with open(OUT, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    shutil.rmtree(wh, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
