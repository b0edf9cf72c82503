"""S9/S10: run bookkeeping rows + sitemap_indexes.json side file."""

from __future__ import annotations

import json
import os
import tempfile

from mr_crawly_spark.datagen import corpus_to_spark
from mr_crawly_spark.engine import CrawlConfig, CrawlEngine
from mr_crawly_spark.sources.corpus import CorpusFetcher


def test_runs_table_and_sitemap_index_json(spark, tiny_corpus):
    docs, robots, sitemaps, seeds = corpus_to_spark(spark, tiny_corpus)
    wh = tempfile.mkdtemp(prefix="crawl_runs_")
    eng = CrawlEngine(
        spark, CorpusFetcher(spark, documents=docs), robots, sitemaps, seeds,
        CrawlConfig(warehouse=wh, run_id="run_test", max_rounds=2),
    )
    eng.run()

    runs = eng.catalog.load("runs").collect()
    assert len(runs) == 2  # start row + completion row
    assert all(r["run_id"] == "run_test" for r in runs)
    assert all(r["max_pages"] == eng.cfg.max_pages for r in runs)
    start_rows = [r for r in runs if r["end_time"] is None]
    end_rows = [r for r in runs if r["end_time"] is not None]
    assert len(start_rows) == 1 and len(end_rows) == 1
    assert end_rows[0]["end_time"] >= end_rows[0]["start_time"]

    with open(os.path.join(wh, "sitemap_indexes.json")) as f:
        idx = json.load(f)
    want = {
        s["url"]: s["locs"] for s in tiny_corpus.sitemaps_raw if s["is_index"]
    }
    assert idx == want
    assert len(idx) > 0


def test_pyfiles_zip_is_self_contained(tmp_path):
    """spark-submit --py-files packaging (north_rule): the zip must import
    standalone — a module the package forgot to include would only fail on
    the cluster."""
    import subprocess
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    try:
        from package_pyfiles import build
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "pkg.zip")
    names = build(out)
    assert any(n.endswith("engine.py") for n in names)
    r = subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {out!r}); "
         "import mr_crawly_spark.engine, mr_crawly_spark.operators.seen, "
         "oracle.crawler; print('ok')"],
        capture_output=True, text=True, cwd=str(tmp_path),
    )
    assert r.stdout.strip() == "ok", r.stderr[-500:]
