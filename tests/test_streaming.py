"""Streaming wrapper tests: windowed agg with watermark + foreachBatch crawl."""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import functions as F

from mr_crawly_spark.datagen import corpus_to_spark
from mr_crawly_spark.engine import CrawlConfig, CrawlEngine
from mr_crawly_spark.sources.corpus import CorpusFetcher
from mr_crawly_spark.streaming.micro_batch import (
    stream_crawl,
    windowed_fetch_metrics,
)
from oracle.crawler import OracleCrawler


def test_windowed_metrics_stream_equals_batch(spark, tmp_path):
    rows = [
        (f"2024-01-01 00:{m:02d}:00", f"h{m % 3}.test", 200 if m % 4 else 404)
        for m in range(60)
    ]
    pdir = str(tmp_path / "fetch_log")
    batch = spark.createDataFrame(
        rows, "fetched_at_s string, host string, fetch_status int"
    ).withColumn("fetched_at", F.to_timestamp("fetched_at_s")).drop("fetched_at_s")
    batch.write.mode("overwrite").parquet(pdir)

    want = sorted(map(tuple, windowed_fetch_metrics(batch).collect()))

    stream = spark.readStream.schema(batch.schema).parquet(pdir)
    out = windowed_fetch_metrics(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("fetch_metrics")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM fetch_metrics").collect()))
    assert got == want
    assert len(got) == 6 * 3  # 6 ten-minute windows x 3 hosts


def test_stream_crawl_matches_oracle(spark, tiny_corpus):
    docs, robots, sitemaps, seeds = corpus_to_spark(spark, tiny_corpus)
    eng = CrawlEngine(
        spark, CorpusFetcher(spark, documents=docs), robots, sitemaps, seeds,
        CrawlConfig(warehouse=tempfile.mkdtemp(prefix="crawl_stream_")),
    )
    eng.bootstrap()
    q = stream_crawl(spark, eng)
    deadline = time.time() + 300
    while time.time() < deadline:
        if not (eng.visited_count < eng.cfg.max_pages and eng.has_pending()):
            break
        time.sleep(1)
    q.stop()
    q.awaitTermination(60)

    oracle = OracleCrawler(tiny_corpus).run()
    got = [r["url"] for r in eng.crawl_order().orderBy("rank").collect()]
    assert got == oracle.crawl_order


def test_streaming_dedup_first_wins_across_batches(spark, tmp_path):
    """streaming_dedup suppresses duplicate fingerprints arriving in LATER
    micro-batches (file-per-trigger), matches the batch plan's key set,
    and keeps the first arrival."""
    from mr_crawly_spark.streaming.micro_batch import streaming_dedup

    pdir = tmp_path / "docs_stream"
    pdir.mkdir()
    schema = "doc_id long, fingerprint string, ts timestamp"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(pdir / name))

    from datetime import datetime

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    # batch a: fp1, fp2; batch b: fp2 dup + fp3; batch c: fp1, fp3 dups + fp4
    write_batch("a", [(1, "fp1", t0), (2, "fp2", t0)])
    write_batch("b", [(3, "fp2", t0), (4, "fp3", t0)])
    write_batch("c", [(5, "fp1", t0), (6, "fp3", t0), (7, "fp4", t0)])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(pdir / "*"))
    )
    out = streaming_dedup(stream, "fingerprint", event_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_stream").collect()
    # one row per fingerprint, regardless of how many batches repeated it
    assert sorted(r["fingerprint"] for r in got) == ["fp1", "fp2", "fp3", "fp4"]
    # matches the batch plan's key set
    batch = spark.read.parquet(str(pdir / "*"))
    want_keys = {r["fingerprint"] for r in streaming_dedup(batch, "fingerprint").collect()}
    assert {r["fingerprint"] for r in got} == want_keys


def test_streaming_dedup_requires_event_col_on_streams(spark, tmp_path):
    """Watermark-less streaming dedup = unbounded state; must refuse."""
    import pytest

    from mr_crawly_spark.streaming.micro_batch import streaming_dedup

    pdir = tmp_path / "docs_nd"
    spark.createDataFrame(
        [(1, "fp1")], "doc_id long, fingerprint string"
    ).write.parquet(str(pdir))
    stream = spark.readStream.schema("doc_id long, fingerprint string").parquet(
        str(pdir)
    )
    with pytest.raises(ValueError, match="unbounded"):
        streaming_dedup(stream, "fingerprint")
