"""Resume-from-checkpoint (north_rule) + partition-invariance tests."""

from __future__ import annotations

import tempfile

import pytest

from mr_crawly_spark.datagen import corpus_to_spark
from mr_crawly_spark.engine import CrawlConfig, CrawlEngine
from mr_crawly_spark.sources.corpus import CorpusFetcher


def _engine(spark, corpus, wh, **kw):
    docs, robots, sitemaps, seeds = corpus_to_spark(spark, corpus)
    return CrawlEngine(
        spark, CorpusFetcher(spark, documents=docs), robots, sitemaps, seeds,
        CrawlConfig(warehouse=wh, **kw),
    )


def _final_state(engine):
    order = [r["url"] for r in engine.crawl_order().orderBy("rank").collect()]
    seen = {r["url"] for r in engine.table("seen").collect()}
    links = {
        (r["seed_url"], r["source_url"], r["linked_url"])
        for r in engine.table("links").collect()
    }
    return order, seen, links


@pytest.fixture(scope="module")
def exact_state(spark, tiny_corpus):
    """Final state of ONE default-config exact crawl over tiny_corpus —
    shared by every must-not-change-outputs test in this module (running a
    fresh baseline crawl per test was ~1/3 of the module's wall-clock)."""
    eng = _engine(spark, tiny_corpus, tempfile.mkdtemp(prefix="crawl_exsh_"))
    eng.run()
    return _final_state(eng)


def test_resume_equals_uninterrupted(spark, tiny_corpus, exact_state):
    """Kill after round 2, resume in a NEW engine, final state identical.
    checkpoint_interval=1 pins a resume point at every round (the default
    interval of 4 only guarantees resume points at flushed rounds)."""
    wh = tempfile.mkdtemp(prefix="crawl_resume_")
    first = _engine(spark, tiny_corpus, wh, max_rounds=2, checkpoint_interval=1)
    first.run()
    assert first.round == 2  # stopped early

    resumed = _engine(spark, tiny_corpus, wh, max_rounds=100)
    assert resumed.resume()
    assert resumed.round == 2
    assert resumed.visited_count == first.visited_count
    resumed.run(fresh=False)

    assert _final_state(resumed) == exact_state


@pytest.fixture(scope="module")
def ci1_run(spark, tiny_corpus):
    """ONE checkpoint_interval=1 full crawl (a resume point at every
    round), shared by the rollback/orphan time-travel tests — each test
    mutates a COPY of the warehouse, never the shared one."""
    wh = tempfile.mkdtemp(prefix="crawl_ci1_")
    eng = _engine(spark, tiny_corpus, wh, checkpoint_interval=1)
    eng.run()
    return wh, _final_state(eng), eng.round


def test_rollback_then_rerun(spark, tiny_corpus, ci1_run):
    """Time travel: roll back to round 1 and re-run -> same final state."""
    import shutil

    src, want, _ = ci1_run
    wh = src + "_rb"
    shutil.copytree(src, wh)
    again = _engine(spark, tiny_corpus, wh, checkpoint_interval=1)
    again.catalog.rollback_to(1)
    assert again.resume()
    assert again.round == 1
    again.run(fresh=False)
    assert _final_state(again) == want


def test_bloom_engine_equals_exact_engine(spark, tiny_corpus, exact_state):
    """use_bloom=True must not change any output (prefilter-only contract
    end-to-end, not just at the operator level)."""
    bloomed = _engine(
        spark, tiny_corpus, tempfile.mkdtemp(prefix="crawl_bl_"),
        use_bloom=True, bloom_buckets=4,
    )
    bloomed.run()
    assert _final_state(bloomed) == exact_state


def test_partition_invariance(spark, tiny_corpus, exact_state):
    """Same outputs under explicit hot-host salting / different partitioning —
    the determinism-under-parallelism property (SURVEY.md §5.2-5)."""
    salted = _engine(
        spark, tiny_corpus, tempfile.mkdtemp(prefix="crawl_s_"),
        salt_partitions=5, salt=7,
    )
    salted.run()
    assert _final_state(salted) == exact_state


def test_resume_discards_orphaned_table_commits(spark, tiny_corpus, ci1_run):
    """A crash can land between a table commit and the round manifest (the
    manifest is written last). Those orphaned deltas must NOT merge with the
    re-run's fresh commits: resume() rolls the catalog back to the last
    COMPLETE round first (ADVICE r2)."""
    import shutil

    src, want, final_round = ci1_run
    wh = src + "_orph"
    shutil.copytree(src, wh)
    again = _engine(spark, tiny_corpus, wh, checkpoint_interval=1)
    # rewind to round 1, then simulate a crash mid-flush of round 2: the
    # seen/pages table commits landed, the round manifest did not
    again.catalog.rollback_to(1)
    poison = spark.createDataFrame(
        [(999999, "https://orphan.test/x", 2, "run_0001")],
        "url_hash long, url string, first_seen_round int, run_id string",
    )
    again.catalog.commit("seen", poison, 2, mode="delta")

    assert again.resume()
    assert again.round == 1  # resumed at the last complete round
    again.run(fresh=False)
    assert again.round == final_round
    got = _final_state(again)
    assert got == want  # identical to the uninterrupted run...
    assert "https://orphan.test/x" not in got[1]  # ...orphan delta is gone


def test_cuckoo_outputs_equal_exact(spark, tiny_corpus, exact_state):
    """use_cuckoo=True must not change any output (prefilter-only contract,
    twin of the Bloom test) — and the filter must actually engage."""
    cuckooed = _engine(
        spark, tiny_corpus, tempfile.mkdtemp(prefix="crawl_ck2_"),
        use_cuckoo=True, bloom_buckets=4, bloom_expected_n=4096,
    )
    cuckooed.run()
    assert cuckooed._cuckoo is not None  # built and maintained
    assert any(v != b"" for v in cuckooed._cuckoo.values())
    assert _final_state(cuckooed) == exact_state


def test_cuckoo_sidecar_resume(spark, tiny_corpus):
    """The cuckoo prefilter persists to a sidecar at flush (the Bloom twin)
    and resume reloads it byte-identical instead of rebuilding — but ONLY
    when the persisted geometry matches; a mismatched config rebuilds from
    the seen table (mismatched n_rows would probe false negatives)."""
    import os

    wh = tempfile.mkdtemp(prefix="crawl_cksc_")
    cfg = dict(use_cuckoo=True, bloom_buckets=4, bloom_expected_n=4096)
    eng = _engine(spark, tiny_corpus, wh, **cfg)
    eng.run()
    assert os.path.isdir(os.path.join(wh, "seen_cuckoo"))
    saved = dict(eng._cuckoo)

    resumed = _engine(spark, tiny_corpus, wh, **cfg)
    assert resumed.resume()
    resumed._maybe_build_cuckoo(resumed._seen_full_view())
    assert resumed._cuckoo == saved  # reloaded, not rebuilt

    # different expected_n -> different n_rows -> geometry mismatch:
    # must NOT load the stale sidecar (silent false negatives); rebuilds
    other = _engine(
        spark, tiny_corpus, wh,
        use_cuckoo=True, bloom_buckets=4, bloom_expected_n=65536,
    )
    assert other.resume()
    other._maybe_build_cuckoo(other._seen_full_view())
    assert other._cuckoo is not None
    assert other._cuckoo_rows != eng._cuckoo_rows


def test_bloom_gate_degrades_to_sidecar_mode(spark, tiny_corpus, monkeypatch,
                                             exact_state):
    """r4 verdict #1: past MAX_DRIVER_BLOOM_BYTES the engine must NOT raise
    at the collect gate — it keeps the filter in the sidecar parquet and
    routes rounds through the bucket-partitioned probe, with identical
    outputs to the exact engine."""
    from mr_crawly_spark.operators import seen as seen_ops

    monkeypatch.setattr(seen_ops, "MAX_DRIVER_BLOOM_BYTES", 1024)
    gated = _engine(
        spark, tiny_corpus, tempfile.mkdtemp(prefix="crawl_blg_"),
        use_bloom=True, bloom_buckets=4, bloom_expected_n=4096,
    )
    gated.run()
    assert gated._bloom_sidecar_mode      # degraded to the sidecar probe...
    assert gated._blooms is None          # ...nothing driver-resident
    assert _final_state(gated) == exact_state


def test_cuckoo_gate_degrades_to_sidecar_mode(spark, tiny_corpus, monkeypatch,
                                              exact_state):
    """The cuckoo twin: past the driver gate the engine probes the
    bucket-partitioned sidecar (the path build_bucket_cuckoos' gate error
    points at) instead of crashing, outputs unchanged."""
    from mr_crawly_spark.operators import seen as seen_ops

    monkeypatch.setattr(seen_ops, "MAX_DRIVER_BLOOM_BYTES", 1024)
    gated = _engine(
        spark, tiny_corpus, tempfile.mkdtemp(prefix="crawl_ckg_"),
        use_cuckoo=True, bloom_buckets=4, bloom_expected_n=4096,
    )
    gated.run()
    assert gated._cuckoo_sidecar_mode
    assert gated._cuckoo is None
    assert _final_state(gated) == exact_state


def test_sidecar_mode_resume_mid_crawl(spark, tiny_corpus, monkeypatch,
                                       exact_state):
    """Kill a sidecar-mode cuckoo crawl after round 2, resume in a NEW
    engine (same gate): the persisted geometry revalidates, the sidecar
    keeps being probed/merged, final state identical to uninterrupted.
    The prefilter-only contract makes the shared exact crawl the baseline
    (a separate sidecar-mode baseline run would assert the same equality
    transitively at twice the cost)."""
    from mr_crawly_spark.operators import seen as seen_ops

    monkeypatch.setattr(seen_ops, "MAX_DRIVER_BLOOM_BYTES", 1024)
    cfg = dict(
        use_cuckoo=True, bloom_buckets=4, bloom_expected_n=4096,
        checkpoint_interval=1,
    )
    wh = tempfile.mkdtemp(prefix="crawl_scres_")
    first = _engine(spark, tiny_corpus, wh, max_rounds=2, **cfg)
    first.run()
    assert first._cuckoo_sidecar_mode

    resumed = _engine(spark, tiny_corpus, wh, max_rounds=100, **cfg)
    assert resumed.resume()
    resumed.run(fresh=False)
    assert resumed._cuckoo_sidecar_mode
    assert _final_state(resumed) == exact_state


def test_sidecar_merge_survives_flush_retry(spark, tiny_corpus, monkeypatch,
                                            exact_state):
    """A flush retried AFTER the seen commit cleared the delta list must
    still fold that delta into the sidecar filter (the captured union is
    held on the engine until the merge succeeds) — otherwise the
    committed-but-unmerged keys probe definitely-unseen forever: prefilter
    false negatives in exactly the retry scenario the flush contract
    promises to survive."""
    from pyspark.sql import functions as F

    from mr_crawly_spark.operators import seen as seen_ops

    monkeypatch.setattr(seen_ops, "MAX_DRIVER_BLOOM_BYTES", 1024)
    calls = {"n": 0}
    real_merge = seen_ops.merge_bloom_sidecar

    def flaky_merge(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected sidecar-merge failure")
        return real_merge(*a, **kw)

    monkeypatch.setattr(seen_ops, "merge_bloom_sidecar", flaky_merge)
    eng = _engine(
        spark, tiny_corpus, tempfile.mkdtemp(prefix="crawl_retry_"),
        use_bloom=True, bloom_buckets=4, bloom_expected_n=4096,
        checkpoint_interval=1,
    )
    with pytest.raises(RuntimeError, match="injected"):
        eng.run()
    assert eng._bloom_sidecar_mode
    eng.flush()  # the documented retry path — must re-run the merge
    assert calls["n"] >= 2
    # no-false-negative audit: every committed seen key probes maybe_seen
    seen = eng._seen_full_view().select("url", "url_hash")
    m, k = eng._bloom_mk
    probed = seen_ops.bloom_prefilter_sidecar(
        seen, eng._bloom_sidecar_path(), eng.cfg.bloom_buckets, m, k
    )
    n_seen = seen.count()
    assert n_seen > 0
    assert probed.filter(F.col("maybe_seen")).count() == n_seen
