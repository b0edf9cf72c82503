"""Seed-list ingestion (SURVEY.md S-seeds; round-1 'What's missing' #3).

The reference takes a real URL argument (main.py:29) and ships a sqlite
seed table ``seed_urls(seed_url_id, domain, url, description)`` in
``data/url.db``. Three ingestion shapes, all landing on schemas.SEEDS:

- a plain text file, one URL per line (# comments and blanks skipped);
- the reference's sqlite ``seed_urls`` table (stdlib sqlite3 — tiny,
  driver-side by nature: seed lists are human-curated, not data-scale);
- a parquet file/dir already in the SEEDS shape (the scale path — a
  10^8-row seed list stays distributed).
"""

from __future__ import annotations

import os
import sqlite3

from pyspark.sql import DataFrame, SparkSession

from mr_crawly_spark import schemas as S
from mr_crawly_spark.functions.urls import canonicalize_url


def _host_of(url: str) -> str | None:
    canon = canonicalize_url(None, url)
    if canon is None:
        return None
    return canon.split("://", 1)[1].split("/", 1)[0]


def seeds_from_urls(spark: SparkSession, urls: list[str]) -> DataFrame:
    rows = []
    i = 0
    for u in urls:
        host = _host_of(u)
        if host is None:
            continue
        i += 1
        rows.append((i, host, u.strip(), None))
    return spark.createDataFrame(rows, S.SEEDS)


def load_seeds(spark: SparkSession, path: str) -> DataFrame:
    """Dispatch on the path shape: .txt/.lst -> url-per-line, .db/.sqlite ->
    the reference's seed_urls table, anything else -> parquet."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".txt", ".lst", ".urls"):
        with open(path) as f:
            urls = [
                line.strip() for line in f
                if line.strip() and not line.lstrip().startswith("#")
            ]
        return seeds_from_urls(spark, urls)
    if ext in (".db", ".sqlite", ".sqlite3"):
        con = sqlite3.connect(path)
        try:
            rows = con.execute(
                "SELECT seed_url_id, domain, url, description FROM seed_urls"
            ).fetchall()
        finally:
            con.close()
        return spark.createDataFrame(
            [(int(r[0]), r[1], r[2], r[3]) for r in rows], S.SEEDS
        )
    return spark.read.schema(S.SEEDS).parquet(path)
