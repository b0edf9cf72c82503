"""Change-rate estimation and freshness-driven recrawl scheduling.

The reference recrawls on sitemap metadata alone (``<changefreq>`` /
``<priority>``, reference ``mr_crawly/site_mapper.py`` get_sitemap_urls ->
priority queue): whatever the site CLAIMS about its own volatility is
taken at face value. Sites routinely lie (changefreq=daily on pages that
never change) or say nothing. This module estimates each page's ACTUAL
change rate from the crawler's own visit history — the Poisson-process
freshness model of Cho & Garcia-Molina, "Effective Page Refresh Policies
for Web Crawlers" (ACM TODS 28(4), 2003) — and turns it into a recrawl
priority: expected staleness at the time of the next crawl round.

Model: page changes arrive as a Poisson process with rate ``lambda``. A
crawler only SAMPLES the page at visit times, so the natural estimator
X/T (changes seen / time observed) is biased low: two changes between
consecutive visits are observed as one. Cho & Garcia-Molina's
bias-reduced estimator (their Eq. for the repeated-access case, with the
+0.5 continuity correction that keeps it finite when every visit saw a
change) over n revisit comparisons of which X showed a changed
fingerprint, with mean inter-visit gap Ibar:

    lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / Ibar

Staleness then follows from the memoryless property: the page is stale at
age ``a`` (seconds since the last visit) with probability
``1 - exp(-lambda_hat * a)`` — which IS the recrawl priority (expected
value of a re-fetch now), the uniform-resource-allocation policy of the
paper applied per page.

Scale shape (10^10-URL history): visit rows shuffle ONCE keyed by url —
the lag window (prev fingerprint per url ordered by visit time) and the
per-url aggregate share the same hash partitioning, so Spark plans a
single Exchange for both; per-url history is short (tens of visits), so
there is no hot key. Output is one row per url. Everything after the
window is scan-side arithmetic (ln/exp on aggregated scalars, pure JVM).
All math is shared with the DuckDB oracle dialect (ln/exp/round behave
identically on doubles; outputs are rounded to 8dp so a final-digit libm
ulp cannot flip the comparison hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "change_stats",
    "change_rates",
    "recrawl_priorities",
]


def change_stats(
    visits: DataFrame,
    url_col: str = "url",
    ts_col: str = "visit_ts",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Per-url visit-history summary: ``n_visits``, ``n_changes`` (revisit
    comparisons whose fingerprint differs from the previous visit's),
    ``span_sec`` (first->last visit), ``last_ts``.

    ``visit_ts`` is seconds (double or castable); ties on (url, ts) are
    broken by fingerprint so the lag order is total and engine-independent.
    One shuffle: the window and the groupBy share the url partitioning.
    """
    w = Window.partitionBy("url").orderBy("_ts", "_fp")
    prev_fp = F.lag("_fp").over(w)
    changed = F.when(
        prev_fp.isNotNull() & (F.col("_fp") != prev_fp), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        visits.select(
            F.col(url_col).alias("url"),
            F.col(ts_col).cast("double").alias("_ts"),
            F.col(fp_col).alias("_fp"),
        )
        .withColumn("_chg", changed)
        .groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_visits"),
            F.sum("_chg").cast("bigint").alias("n_changes"),
            (F.max("_ts") - F.min("_ts")).alias("span_sec"),
            F.max("_ts").alias("last_ts"),
        )
    )


def change_rates(stats: DataFrame) -> DataFrame:
    """Cho & Garcia-Molina bias-reduced Poisson rate per url (8dp).

    ``n`` below is the number of revisit COMPARISONS (n_visits - 1); a
    url with a single visit has no evidence and gets a NULL rate (callers
    rank unknowns by a cold-start policy, not a fake 0.0 = "never
    changes"). ``span_sec == 0`` (all visits at one instant) likewise
    yields NULL: the estimator needs elapsed observation time.
    """
    n = (F.col("n_visits") - 1).cast("double")
    x = F.col("n_changes").cast("double")
    ibar = F.col("span_sec") / n
    lam = -F.log((n - x + 0.5) / (n + 0.5)) / ibar
    return stats.withColumn(
        "change_rate",
        F.when((n >= 1) & (F.col("span_sec") > 0), F.round(lam, 8)),
    )


def recrawl_priorities(rates: DataFrame, now_ts: float) -> DataFrame:
    """Staleness probability at ``now_ts`` = 1 - exp(-rate * age) — the
    expected payoff of re-fetching each url now. Unknown-rate urls
    (single visit) get priority NULL so a cold-start policy can slot them
    explicitly rather than silently outranking or trailing everything.
    Scan-only over the per-url stats (no further shuffle); callers feed
    the result into the frontier's existing priority ordering
    (operators/frontier.py host_window_topk), which is where the actual
    top-k selection and politeness interleave happen.
    """
    age = F.lit(float(now_ts)) - F.col("last_ts")
    p_stale = 1.0 - F.exp(-F.col("change_rate") * F.greatest(age, F.lit(0.0)))
    return rates.withColumn(
        "recrawl_priority",
        F.when(F.col("change_rate").isNotNull(), F.round(p_stale, 8)),
    )
