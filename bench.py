"""Bench harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Components:
- per-query seconds for the perf-relevant __spark_entry__ queries (forced
  with the noop writer so the full plan executes);
- crawl_e2e: the engine end-to-end on a generated corpus (urls/sec);
- frontier_throughput: the headline inner-loop metric (canonicalize ->
  hash -> seen anti-join -> politeness window) at synthetic scale.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import __spark_entry__ as entry_mod
from mr_crawly_spark.bench_jobs import crawl_e2e_job, frontier_throughput_job
from mr_crawly_spark.session import get_spark

BENCH_QUERIES = [
    "seen_antijoin",
    "host_window_topk",
    "frontier_merge",
    "events_hourly",
    "sessionize",
    "dedup_exact",
    "corpus_filter",
    "token_count",
    "minhash",
    "simhash16",
    "neardup_jaccard",
    "cosine_topk",
    # round 5: curation additions (keys are additive — earlier rounds'
    # per-query numbers stay comparable)
    "bm25",
    "repetition",
    "unigram_logprob",
    # round 5b: selection / decontamination / e2e dedup
    "dsir",
    "dup_ngrams",
    "dedup_e2e",
    # round 5c: exact-substring span removal
    "dedup_spans",
    # round 5d: sketches, relational additions, clustering
    "hll",
    "cms",
    "asof",
    "length_quantiles",
    "weighted_sample",
    "kmeans",
    "hits",
    "bpe",
    # round 5e: intersectable/quantile sketches, range join, canonicalization
    "kmv",
    "kmv_sets",
    "dd_quantiles",
    "range_join",
    "hll_by",
    "text_norm",
    "sim_join",
    "dd_by",
    # round 5g: LM sequence packing
    "pack_seqs",
    # round 5h: inverted-index build + DAAT retrieval, incremental merge,
    # positional phrase search
    "inv_index",
    "inv_search",
    "inv_merge",
    "inv_phrase",
    # round 5h: degree-ordered triangle counting, PMI collocations
    "triangles",
    "pmi",
    "pct_ranks",
    "bigram_ppl",
    # round 5i: crawl-trap detection + frontier collapse
    "trap_params",
    "trap_collapse",
    "url_templates",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def host_capacity_probe(n_procs: int | None = None) -> dict:
    """Effective-CPU probe, recorded with every bench artifact: a fixed
    pure-python loop timed once solo and once with ``n_procs`` parallel
    copies. On an exclusive box parallel wall ≈ solo wall; on an
    oversubscribed shared host it degrades in proportion to the capacity
    actually delivered (observed on this sandbox: nominal 32 cores
    delivering ~14 — a 2.3x headline-throughput swing BETWEEN runs of
    identical code). effective_cores = n_procs * solo / parallel lets
    cross-round comparisons separate code regressions from host drift."""
    import subprocess
    import sys

    n = n_procs or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    code = "s=0\nfor i in range(20_000_000): s+=i\n"
    t0 = time.monotonic()
    subprocess.run([sys.executable, "-c", code], check=True)
    solo = time.monotonic() - t0
    t0 = time.monotonic()
    procs = [
        subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.DEVNULL)
        for _ in range(n)
    ]
    for p in procs:
        p.wait()
    par = time.monotonic() - t0
    return {
        "n_procs": n,
        "solo_sec": round(solo, 3),
        "parallel_sec": round(par, 3),
        "effective_cores": round(n * solo / max(par, 1e-9), 1),
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="mr-crawly-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # UNTIMED warmup (r3 verdict #2): the first timed query used to absorb
    # all first-query JVM/codegen/Arrow-worker startup (seen_antijoin drifted
    # 4.9 s -> 7.4 s round-over-round on an unchanged plan). Warm the JVM +
    # shuffle + codegen path with the first bench query and the Python/Arrow
    # worker pool with a tiny canonicalize job, so per-query numbers are
    # comparable across rounds.
    from pyspark.sql import functions as F

    from mr_crawly_spark.functions.urls import canonicalize_udf

    force(queries[BENCH_QUERIES[0]](spark, sf_dir))
    force(
        spark.range(10_000).select(
            canonicalize_udf(
                F.lit("https://w.test/a/"), F.concat(F.lit("../p/"), F.col("id").cast("string"))
            ).alias("url")
        )
    )
    # engine-path warmup (also untimed): the first engine run in a JVM pays
    # JIT, codegen-cache and committer class-loading that no analytics query
    # touches (~10 s measured) — run a tiny crawl here, OUTSIDE the t_all
    # window, so both crawl_e2e and total_sec are steady-state numbers.
    crawl_e2e_job(
        spark, tempfile.mkdtemp(prefix="bench_warm_"),
        n_hosts=4, base_pages=4, hot_factor=2,
    )

    timings: dict[str, float] = {}
    t_all = time.monotonic()
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        force(queries[name](spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    crawl = crawl_e2e_job(spark, tempfile.mkdtemp(prefix="bench_crawl_"))
    timings["crawl_e2e"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    frontier = frontier_throughput_job(spark)
    timings["frontier_throughput"] = round(time.monotonic() - t0, 3)

    total = round(time.monotonic() - t_all, 3)
    print(
        json.dumps(
            {
                "metric": "frontier_urls_per_sec",
                "value": frontier["urls_per_sec"],
                "unit": "urls/sec",
                "queries": timings,
                "sf": sf,
                "total_sec": total,
                "crawl_e2e": crawl,
                "frontier": frontier,
                # untimed (outside t_all): host-drift normalization
                "host": host_capacity_probe(),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
