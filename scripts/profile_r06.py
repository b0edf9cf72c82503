"""Round-6 profiling harness (guide §1): capture .explain("formatted") for
every bench query into plans/r06/, time each with the noop sink, and break
frontier_throughput_job into its pipeline stages so the optimization targets
the right operator. Not part of the driver contract (bench.py is frozen).

Usage:
  python scripts/profile_r06.py explains            # capture *_before.txt
  python scripts/profile_r06.py time q1 q2 ...      # noop-time specific queries
  python scripts/profile_r06.py frontier            # stage breakdown
  python scripts/profile_r06.py crawl               # per-round crawl timing
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from mr_crawly_spark.session import get_spark  # noqa: E402

PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06"
)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def capture_explains(spark, sf_dir, names, suffix="before"):
    os.makedirs(PLANS_DIR, exist_ok=True)
    queries = entry_mod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(PLANS_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


def time_queries(spark, sf_dir, names, repeats=3):
    queries = entry_mod.queries()
    # warm
    force(queries[names[0]](spark, sf_dir))
    out = {}
    for name in names:
        ts = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"r06-profile:{name}")
            t0 = time.monotonic()
            force(queries[name](spark, sf_dir))
            ts.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = ts
        print(name, ts, flush=True)
    print(json.dumps(out))


def frontier_breakdown(spark):
    """Time each pipeline stage of frontier_throughput_job in isolation."""
    from pyspark.sql import functions as F

    from mr_crawly_spark.bench_jobs import _host_col
    from mr_crawly_spark.functions.urls import canonicalize_udf, url_hash_col
    from mr_crawly_spark.operators.frontier import select_slice
    from mr_crawly_spark.operators.seen import filter_unseen

    n_candidates, n_hosts, per_host_budget = 2_000_000, 10_000, 64
    n_targets = n_candidates // 4

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

    cand = spark.range(n_candidates).select(
        F.concat(
            F.lit("https://"), _host_col(F.col("id"), n_hosts),
            F.lit("/p/"), F.col("id").cast("string"),
        ).alias("base"),
        href_col(F.col("id"), _host_col(F.col("id"), n_hosts)).alias("href"),
        F.col("id"),
    )
    seen_ids = spark.range(n_candidates // 2)
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    seen_plan = (
        seen_ids.select(
            canonical_col(F.col("id"), _host_col(F.col("id"), n_hosts)).alias("url")
        )
        .withColumn("url_hash", url_hash_col(F.col("url")))
        .repartition(n_parts, F.col("url_hash"), F.col("url"))
        .sortWithinPartitions("url_hash", "url")
    )
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        seen = seen_plan.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    budgets = (
        spark.range(n_hosts)
        .select(
            F.concat(F.lit("site"), F.col("id").cast("string"), F.lit(".test")).alias("host"),
            F.lit(per_host_budget).alias("k_host"),
        )
        .localCheckpoint()
    )

    stages = {}

    def t(label, df, action="noop"):
        spark.sparkContext.setJobDescription(f"r06-frontier:{label}")
        t0 = time.monotonic()
        if action == "noop":
            force(df)
        else:
            df.count()
        stages[label] = round(time.monotonic() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        print(label, stages[label], flush=True)

    # stage 0: raw candidate generation (JVM only)
    t("gen_only", cand)
    # stage 1: + canonicalize UDF
    canon = cand.select(
        canonicalize_udf(F.col("base"), F.col("href")).alias("url")
    ).filter(F.col("url").isNotNull())
    t("canon", canon)
    # stage 2: + hash + dropDuplicates
    hashed = canon.withColumn("url_hash", url_hash_col(F.col("url"))).dropDuplicates(
        ["url_hash", "url"]
    )
    t("canon+dedup", hashed)
    # stage 3: + seen anti-join
    fresh = filter_unseen(hashed, seen)
    t("canon+dedup+antijoin", fresh)
    # stage 4: full pipeline (count like the bench)
    frontier = fresh.select(
        "url",
        "url_hash",
        F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"),
        F.lit("pending").alias("status"),
        F.lit(0.5).alias("priority"),
        F.lit(0).alias("retry_count"),
        F.lit(0.0).alias("next_attempt_at"),
        F.lit(0).alias("discovered_round"),
    )
    sliced = select_slice(frontier, budgets, t_round=1.0, budget_rows=n_hosts)
    t("full_pipeline", sliced, action="count")
    t("full_pipeline_rerun", sliced, action="count")
    print(json.dumps(stages))


def crawl_rounds(spark):
    """Per-round wall time of the e2e crawl."""
    from mr_crawly_spark.bench_jobs import crawl_e2e_job

    # tiny warmup like bench.py
    crawl_e2e_job(
        spark, tempfile.mkdtemp(prefix="prof_warm_"),
        n_hosts=4, base_pages=4, hot_factor=2,
    )

    from mr_crawly_spark.datagen import corpus_to_spark, generate_corpus
    from mr_crawly_spark.engine import CrawlConfig, CrawlEngine
    from mr_crawly_spark.sources.corpus import CorpusFetcher

    corpus = generate_corpus(n_hosts=40, base_pages=16, hot_factor=4, n_seeds=40)
    docs, robots, sitemaps, seeds = corpus_to_spark(spark, corpus)
    eng = CrawlEngine(
        spark, CorpusFetcher(spark, documents=docs), robots, sitemaps, seeds,
        CrawlConfig(warehouse=tempfile.mkdtemp(prefix="prof_crawl_")),
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    rounds = []
    try:
        t0 = time.monotonic()
        eng.bootstrap()
        rounds.append(("bootstrap", round(time.monotonic() - t0, 3)))
        while eng.has_pending() and eng.round < 50:
            t0 = time.monotonic()
            m = eng.run_round()
            rounds.append(
                (f"round{eng.round}(slice={m.get('slice', 0)})",
                 round(time.monotonic() - t0, 3))
            )
        t0 = time.monotonic()
        eng.flush()
        rounds.append(("final_flush", round(time.monotonic() - t0, 3)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    for name, sec in rounds:
        print(name, sec)
    print("total", round(sum(s for _, s in rounds), 3))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r06-profile")
    spark.sparkContext.setLogLevel("ERROR")
    mode = sys.argv[1] if len(sys.argv) > 1 else "explains"
    if mode == "explains":
        names = sys.argv[2:] or list(entry_mod.queries().keys())
        capture_explains(spark, sf_dir, names)
    elif mode == "time":
        time_queries(spark, sf_dir, sys.argv[2:])
    elif mode == "frontier":
        frontier_breakdown(spark)
    elif mode == "crawl":
        crawl_rounds(spark)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
