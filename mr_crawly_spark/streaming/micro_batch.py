"""Structured-Streaming face of the engine (SURVEY.md §2.9, §7.5).

The crawl loop itself is a deterministic driver loop — the semantic
equivalent of ``Trigger.AvailableNow`` micro-batches with the frontier as
the stream and the snapshot catalog as the state store (engine.py). This
module adds the two genuinely streaming-shaped pieces:

- ``stream_crawl``: a readStream/foreachBatch wrapper that drives
  CrawlEngine rounds off a trigger stream (rate source or file drops) —
  the shape you would deploy on a cluster where new seed batches arrive
  continuously;
- ``windowed_fetch_metrics``: event-time tumbling-window aggregation with
  watermarking over a fetch-log stream — the standard late-data pattern
  (replaces the reference's poll-loop job counting, main.py:17-21).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_crawly_spark.engine import CrawlEngine


def windowed_fetch_metrics(
    fetch_log: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming DataFrame of per-window fetch throughput.

    fetch_log: streaming df with (fetched_at timestamp, host string,
    fetch_status int). Works identically on a batch df (for tests the same
    plan runs in both modes — Catalyst handles the incrementalization).
    """
    src = fetch_log
    if src.isStreaming:
        src = src.withWatermark("fetched_at", watermark)
    return src.groupBy(
        F.window("fetched_at", window).alias("win"), F.col("host")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fetches"),
        F.sum((F.col("fetch_status") == 200).cast("int")).cast("bigint").alias("n_ok"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "host",
        "n_fetches",
        "n_ok",
    )


def stream_crawl(
    spark: SparkSession,
    engine: CrawlEngine,
    max_rounds: int | None = None,
    trigger_interval: str = "0 seconds",
):
    """Drive crawl rounds from a Structured Streaming trigger: each
    micro-batch of the rate source fires one engine round until the
    frontier drains. Returns the StreamingQuery (caller awaits/stops).

    This is sugar over engine.run() — state, determinism and resume live in
    the snapshot catalog either way (SURVEY.md §7.5: optional wrapper).
    """
    limit = max_rounds if max_rounds is not None else engine.cfg.max_rounds

    def run_one_round(batch_df: DataFrame, batch_id: int) -> None:
        if (
            engine.round < limit
            and engine.visited_count < engine.cfg.max_pages
            and engine.has_pending()
        ):
            engine.run_round()

    ticks = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    return (
        ticks.writeStream.foreachBatch(run_one_round)
        .trigger(processingTime=trigger_interval)
        .option("checkpointLocation", f"{engine.cfg.warehouse}/_stream_checkpoint")
        .start()
    )
