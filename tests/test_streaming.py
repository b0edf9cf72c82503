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
