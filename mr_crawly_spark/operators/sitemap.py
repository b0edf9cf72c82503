"""Sitemap bootstrap: recursive index expansion as an iterative driver loop
(SURVEY.md S3/A3/G4; reference recursion at site_mapper.py:69-135).

Sitemap trees are shallow (the protocol allows one index level; we bound at
MAX_DEPTH), so the recursion becomes a bounded loop of explode + join —
each level is one DataFrame pass, never per-row Python:

    level 0: each seed host tries /sitemap-index.xml then /sitemap.xml
             (site_mapper.py:115-121); neither -> fallback row (the seed URL
             itself enters the frontier, manager.py:232-238)
    level n: index rows explode(locs) -> join sitemaps_raw -> level n+1
    leaves : contribute ONE <url> record each (quirk B9, site_mapper.py:91)

Dedup rule when several records announce the same loc: MAX priority wins
(order-free — pinned in oracle/crawler.py so both sides agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mr_crawly_spark.datagen import DEFAULT_PRIORITY
from mr_crawly_spark.functions.urls import canonicalize_udf, url_host_col

MAX_DEPTH = 6


def expand_sitemaps(
    seeds: DataFrame, sitemaps_raw: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Returns (details, fallback_seeds).

    details: (source_url, index_url, loc, priority, frequency, modified,
    status) — the sitemap sink rows (data.py:178-216). loc is canonical.
    fallback_seeds: (url,) seeds whose host has no sitemap file at all.
    """
    seed_urls = seeds.select(
        canonicalize_udf(F.lit(None).cast("string"), F.col("url")).alias("seed_url")
    ).withColumn("host", url_host_col(F.col("seed_url")))

    sm = sitemaps_raw.select(
        F.col("url").alias("sm_url"), "is_index", "locs",
        "first_loc", "first_priority", "first_changefreq", "first_lastmod",
    ).localCheckpoint(eager=False)  # joined once per level — cut the
    # caller's lineage (often a driver-side createDataFrame) so each level
    # re-reads cached partitions instead of re-serializing the source

    # level 0: index preferred, else flat sitemap, else fallback
    cands = seed_urls.select(
        "seed_url",
        F.concat(F.lit("https://"), F.col("host"), F.lit("/sitemap-index.xml")).alias("idx_url"),
        F.concat(F.lit("https://"), F.col("host"), F.lit("/sitemap.xml")).alias("flat_url"),
    )
    existing = sm.select(F.col("sm_url").alias("x_url"))
    with_idx = cands.join(
        F.broadcast(existing), cands.idx_url == F.col("x_url"), "left"
    ).withColumnRenamed("x_url", "idx_hit")
    with_both = with_idx.join(
        F.broadcast(existing), with_idx.flat_url == F.col("x_url"), "left"
    ).withColumnRenamed("x_url", "flat_hit")
    start = with_both.select(
        "seed_url",
        F.coalesce(F.col("idx_hit"), F.col("flat_hit")).alias("sm_url"),
    )
    fallback = start.filter(F.col("sm_url").isNull()).select(
        F.col("seed_url").alias("url")
    )
    current = (
        start.filter(F.col("sm_url").isNotNull()).join(sm, "sm_url", "inner")
    )

    leaves = None
    for _ in range(MAX_DEPTH):
        # lineage cut per level: the level's rows are tiny (sitemap records
        # for the seed hosts), but the UNCUT lineage would be re-run by
        # every downstream consumer (each bootstrap commit) — each pass
        # re-paying the canonicalize UDF + joins. LAZY checkpoints fold all
        # materialization into the FIRST downstream action. The unroll is
        # BLIND to MAX_DEPTH (no per-level isEmpty probe): sitemap trees
        # bottom out in 2-3 levels, and a level past the real depth is an
        # explode+join over an EMPTY cached frame — zero rows moved — while
        # each probe was a full Spark job (~0.5 s of pure scheduling at
        # bootstrap; the round-3 probe variant paid 3 of them).
        current = current.localCheckpoint(eager=False)
        level_leaves = current.filter(~F.col("is_index"))
        leaves = level_leaves if leaves is None else leaves.unionByName(level_leaves)
        current = (
            current.filter(F.col("is_index"))
            .select("seed_url", F.explode("locs").alias("sm_url"))
            .join(sm, "sm_url", "inner")
        )

    details = leaves.filter(F.col("first_loc").isNotNull()).select(
        F.col("seed_url").alias("source_url"),
        F.col("sm_url").alias("index_url"),
        canonicalize_udf(F.col("sm_url"), F.col("first_loc")).alias("loc"),
        F.coalesce(F.col("first_priority"), F.lit(DEFAULT_PRIORITY)).alias("priority"),
        F.col("first_changefreq").alias("frequency"),
        F.col("first_lastmod").alias("modified"),
        F.lit("mapped").alias("status"),
    )
    return details, fallback


def bootstrap_frontier_urls(details: DataFrame, fallback: DataFrame) -> DataFrame:
    """(url, priority) rows to seed the frontier: max-priority per loc plus
    the sitemap-less seed fallbacks at DEFAULT_PRIORITY.

    Collision rules (pinned, matching oracle/crawler.py bootstrap order:
    sitemap locs enqueue first): a fallback seed that also appears as a
    sitemap loc keeps the SITEMAP priority — anti-join, not arbitrary
    dropDuplicates, so the result is deterministic. When several sitemap
    records announce the same loc, the winner is max(priority, frequency,
    modified) as a struct (order-free; null fields sort smallest) and its
    recrawl metadata rides along (O2, site_mapper.py:94-98)."""
    best = F.max(
        F.struct(
            F.col("priority"),
            F.coalesce(F.col("frequency"), F.lit("")).alias("frequency"),
            F.coalesce(F.col("modified"), F.lit("")).alias("modified"),
        )
    ).alias("best")
    from_sitemaps = (
        details.groupBy(F.col("loc").alias("url"))
        .agg(best)
        .select(
            "url",
            F.col("best.priority").alias("priority"),
            F.nullif(F.col("best.frequency"), F.lit("")).alias("change_freq"),
            F.nullif(F.col("best.modified"), F.lit("")).alias("last_modified"),
        )
    )
    from_fallback = fallback.select(
        "url",
        F.lit(DEFAULT_PRIORITY).alias("priority"),
        F.lit(None).cast("string").alias("change_freq"),
        F.lit(None).cast("string").alias("last_modified"),
    ).join(from_sitemaps.select("url"), "url", "left_anti")
    return from_sitemaps.unionByName(from_fallback).dropDuplicates(["url"])
