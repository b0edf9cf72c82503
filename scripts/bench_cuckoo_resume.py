"""Mid-crawl kill + resume under the cuckoo prefilter at bench-corpus scale
(r4 verdict #6).

Three measurements on the bench e2e corpus (the same 40-host/16-page corpus
crawl_e2e times):

1. correctness — kill the crawl after half its rounds, resume in a NEW
   engine from the geometry-validated cuckoo sidecar, and assert the final
   state (crawl order, seen set, links set) is IDENTICAL to an
   uninterrupted run;
2. sidecar reload time — resume()'s _maybe_build_cuckoo when the persisted
   geometry matches (pyarrow read of the sidecar, no Spark job);
3. rebuild time — the same call when the geometry is missing/mismatched
   (one distributed pass over the seen table via build_bucket_cuckoos).

Writes BENCH/cuckoo_resume.json. Usage:
    PYTHONPATH=/root/repo python scripts/bench_cuckoo_resume.py
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mr_crawly_spark.datagen import corpus_to_spark, generate_corpus  # noqa: E402
from mr_crawly_spark.engine import CrawlConfig, CrawlEngine  # noqa: E402
from mr_crawly_spark.session import get_spark  # noqa: E402
from mr_crawly_spark.sources.corpus import CorpusFetcher  # noqa: E402

CFG = dict(
    use_cuckoo=True,
    bloom_buckets=8,
    bloom_expected_n=1 << 16,
    checkpoint_interval=1,  # a resume point at every round
)


def make_engine(spark, corpus, wh: str, **kw) -> CrawlEngine:
    docs, robots, sitemaps, seeds = corpus_to_spark(spark, corpus)
    return CrawlEngine(
        spark, CorpusFetcher(spark, documents=docs), robots, sitemaps, seeds,
        CrawlConfig(warehouse=wh, **{**CFG, **kw}),
    )


def state_fingerprint(eng: CrawlEngine) -> str:
    order = [r["url"] for r in eng.crawl_order().orderBy("rank").collect()]
    seen = sorted(r["url"] for r in eng.table("seen").collect())
    links = sorted(
        (r["seed_url"], r["source_url"], r["linked_url"])
        for r in eng.table("links").collect()
    )
    blob = json.dumps({"order": order, "seen": seen, "links": links})
    return hashlib.md5(blob.encode()).hexdigest()


def main() -> int:
    spark = get_spark(
        app_name="bench-cuckoo-resume", master="local[8]",
        shuffle_partitions=8,
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = generate_corpus(n_hosts=40, base_pages=16, hot_factor=4, n_seeds=40)

    # --- uninterrupted baseline -------------------------------------- #
    wh_base = tempfile.mkdtemp(prefix="ckres_base_")
    base = make_engine(spark, corpus, wh_base)
    t0 = time.monotonic()
    base.run()
    base_sec = round(time.monotonic() - t0, 3)
    want = state_fingerprint(base)
    total_rounds = base.round

    # --- kill after half the rounds ----------------------------------- #
    wh_kill = tempfile.mkdtemp(prefix="ckres_kill_")
    half = max(1, total_rounds // 2)
    first = make_engine(spark, corpus, wh_kill, max_rounds=half)
    first.run()
    assert first.round == half, "did not stop at the kill round"
    # snapshot the killed warehouse for the rebuild-vs-reload comparison
    wh_copy = wh_kill + "_rebuild"
    shutil.copytree(wh_kill, wh_copy)

    # --- resume: sidecar RELOAD path ---------------------------------- #
    resumed = make_engine(spark, corpus, wh_kill)
    assert resumed.resume()
    t0 = time.monotonic()
    resumed._maybe_build_cuckoo(resumed._seen_full_view())
    reload_sec = round(time.monotonic() - t0, 4)
    assert resumed._cuckoo is not None
    t0 = time.monotonic()
    resumed.run(fresh=False)
    resume_run_sec = round(time.monotonic() - t0, 3)
    got = state_fingerprint(resumed)
    identical = got == want

    # --- resume: forced REBUILD path (geometry gone -> full build) ---- #
    os.remove(os.path.join(wh_copy, "seen_cuckoo", "_cuckoo_geometry.json"))
    rebuilt = make_engine(spark, corpus, wh_copy)
    assert rebuilt.resume()
    t0 = time.monotonic()
    rebuilt._maybe_build_cuckoo(rebuilt._seen_full_view())
    rebuild_sec = round(time.monotonic() - t0, 4)
    assert rebuilt._cuckoo is not None

    result = {
        "corpus": "bench e2e corpus (n_hosts=40, base_pages=16, hot_factor=4)",
        "config": CFG,
        "total_rounds": total_rounds,
        "killed_after_round": half,
        "uninterrupted_sec": base_sec,
        "resume_run_sec": resume_run_sec,
        "final_state_identical": identical,
        "state_fingerprint": want,
        "sidecar_reload_sec": reload_sec,
        "sidecar_rebuild_sec": rebuild_sec,
        "reload_speedup": round(rebuild_sec / max(reload_sec, 1e-9), 1),
        "note": (
            "reload = pyarrow read of the geometry-validated sidecar (no "
            "Spark job); rebuild = one distributed pass over the seen table "
            "(what a missing/mismatched geometry falls back to). At a "
            "10^10-key seen set the reload stays sidecar-sized while the "
            "rebuild scans the full table."
        ),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "cuckoo_resume.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    if not identical:
        print("FINAL STATE MISMATCH", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
