"""Crawl-trap detection and frontier collapse (infinite URL spaces).

A crawler's classic failure mode is a host that manufactures unbounded
distinct URLs rendering near-identical pages: session-ID links, tracking
parameters, calendar pages, faceted search. The reference bounds a crawl
only by ``--max-pages`` (reference ``mr_crawly/manager.py`` CrawlManager),
so one trap host silently consumes the whole page budget; this module is
the missing pre-fetch gate, run over the frontier BEFORE spending fetches
(IRLbot WWW'08 budgets the same failure per-host; Heritrix ships path- and
similarity-based "crawl trap" filters).

Two signals, both exact and oracle-checkable:

1. Parameter-cardinality traps (``trap_param_stats``): per (host, param),
   how many DISTINCT VALUES the parameter takes across the host's URLs.
   A session/tracking parameter takes ~one value per URL
   (value_ratio ~= 1.0); a genuine facet (``page=1..20``) takes few.
   Flagging is per-parameter, so the fix is surgical:
   ``strip_trap_params`` removes ONLY the flagged parameters and collapses
   the frontier by distinct cleaned URL — the crawl keeps the host and
   drops the infinite axis instead of blocklisting the whole site.

2. High-entropy path templates (``template_stats``): collapse ONLY
   id-looking runs (>= ``min_digit_run`` digits, or >= ``min_hex_run`` hex
   chars) to ``#``; short runs like ``/p12`` stay distinct, so ordinary
   pagination is NOT flagged. ``expansion = n_urls / n_templates`` per
   host: a host whose URLs differ only in opaque ids collapses to a few
   templates with huge expansion.

Scale shape (10^10-URL frontier): the param-pair explode is scan-side
(split + explode, zero Python); stats are ONE map-side-combined agg keyed
(host, param) — output bounded by the host x param vocabulary, never the
frontier; the strip is a broadcast join of the (small) flagged set plus a
scan-only list rebuild via higher-order functions (filter / array_join).
No raw URL text shuffles except the final distinct on cleaned URLs, which
IS the collapse. All string ops are plain split/substring shared with the
DuckDB oracle dialect (no parse_url), mirroring functions/urls.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "url_query_col",
    "url_base_col",
    "url_template_col",
    "param_pairs",
    "trap_param_stats",
    "strip_trap_params",
    "collapse_stats",
    "template_stats",
]


def url_query_col(url: Column) -> Column:
    """Query string = text after the FIRST '?' (RFC 3986 — a later '?' is
    query content); NULL when the URL has no query. The DuckDB twin is
    ``substr(url, position('?' in url) + 1)`` — NOT ``split_part(url, '?',
    2)``, which would stop at a second '?' and diverge on tracking/redirect
    URLs (same parity note as functions/urls.py url_param_count_col)."""
    return F.when(
        F.instr(url, "?") > 0,
        F.substring(url, F.instr(url, "?") + 1, F.length(url)),
    )


def url_base_col(url: Column) -> Column:
    """Everything before the FIRST '?' (the whole URL when no query)."""
    return F.substring_index(url, "?", 1)


def url_template_col(
    url: Column, min_digit_run: int = 6, min_hex_run: int = 8
) -> Column:
    """Collapse id-looking runs to '#': hex runs first (a long digit run is
    also hex, so ordering is load-bearing and shared with the oracle), then
    digit runs. Short numeric tokens (/p12, page=3) survive, so pagination
    does not alias into a trap template."""
    t = F.regexp_replace(url, "[0-9a-fA-F]{%d,}" % min_hex_run, "#")
    return F.regexp_replace(t, "[0-9]{%d,}" % min_digit_run, "#")


def param_pairs(
    df: DataFrame, url_col: str = "url", host_col: str = "host"
) -> DataFrame:
    """(host, url, param, value) — one row per query parameter per URL.

    Scan-side: split + explode, no shuffle, no Python. URLs without a
    query contribute nothing (explode of NULL drops the row). A '='-less
    token is a bare flag: param = token, value = ''."""
    url = F.col(url_col)
    kv = F.explode(F.split(url_query_col(url), "&")).alias("_kv")
    pairs = df.select(F.col(host_col), url.alias("_url"), kv).filter(
        F.col("_kv") != ""
    )
    value = F.when(
        F.instr(F.col("_kv"), "=") > 0,
        F.substring(
            F.col("_kv"), F.instr(F.col("_kv"), "=") + 1, F.length(F.col("_kv"))
        ),
    ).otherwise(F.lit(""))
    return pairs.select(
        F.col(host_col),
        F.col("_url").alias(url_col),
        F.substring_index(F.col("_kv"), "=", 1).alias("param"),
        value.alias("value"),
    )


def trap_param_stats(
    df: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    min_urls: int = 20,
    value_ratio: float = 0.5,
) -> DataFrame:
    """Per (host, param): n_urls, n_values, value_ratio, is_trap.

    ``value_ratio = n_values / n_urls`` — a parameter whose value is
    (nearly) unique per URL is manufacturing the URL space. ``min_urls``
    keeps small hosts out of the flag (5 URLs with 5 session ids is not
    evidence). ONE map-side-combined agg; output is bounded by the
    host x param vocabulary at any frontier size."""
    if min_urls < 1:
        raise ValueError(f"min_urls must be >= 1, got {min_urls}")
    if not (0.0 < value_ratio <= 1.0):
        raise ValueError(f"value_ratio must be in (0, 1], got {value_ratio}")
    pairs = param_pairs(df, url_col=url_col, host_col=host_col)
    stats = pairs.groupBy(host_col, "param").agg(
        F.countDistinct(url_col).alias("n_urls"),
        F.countDistinct("value").alias("n_values"),
    )
    ratio = F.round(F.col("n_values") / F.col("n_urls"), 4)
    return stats.select(
        host_col,
        "param",
        "n_urls",
        "n_values",
        ratio.alias("value_ratio"),
        (
            (F.col("n_urls") >= min_urls)
            & (F.col("n_values") / F.col("n_urls") >= value_ratio)
        ).alias("is_trap"),
    )


def _cleaned_urls(
    df: DataFrame, stats: DataFrame, url_col: str, host_col: str
) -> DataFrame:
    """(host, _before, _after): each frontier URL next to its rewrite
    without the host's flagged parameters.

    The flagged set is tiny (a slice of the host x param vocabulary) so it
    broadcasts; the rewrite is scan-only higher-order-function work
    (filter + array_join) — no shuffle here. Non-query URLs and hosts with
    no flagged params pass through byte-identical, so re-running on a
    clean frontier is a no-op (idempotence is tested)."""
    url = F.col(url_col)
    traps = (
        stats.filter(F.col("is_trap"))
        .groupBy(host_col)
        .agg(F.collect_set("param").alias("_traps"))
    )
    j = df.select(host_col, url_col).join(F.broadcast(traps), host_col, "left")
    kept = F.filter(
        F.split(url_query_col(url), "&"),
        lambda kv: ~F.array_contains(
            F.col("_traps"), F.substring_index(kv, "=", 1)
        ),
    )
    cleaned = (
        F.when(F.col("_traps").isNull() | (F.instr(url, "?") == 0), url)
        .when(F.size(kept) == 0, url_base_col(url))
        .otherwise(
            F.concat(url_base_col(url), F.lit("?"), F.array_join(kept, "&"))
        )
    )
    return j.select(
        F.col(host_col), url.alias("_before"), cleaned.alias("_after")
    )


def strip_trap_params(
    df: DataFrame,
    stats: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Rewrite each URL without its host's flagged parameters and collapse
    the frontier to distinct (host, cleaned url) — the only shuffle is the
    final distinct, which IS the collapse."""
    return (
        _cleaned_urls(df, stats, url_col, host_col)
        .select(F.col(host_col), F.col("_after").alias(url_col))
        .distinct()
    )


def collapse_stats(
    df: DataFrame,
    stats: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Per-host collapse accounting: distinct URLs before vs after the
    strip, and the saved fraction — what the gate buys the fetch budget.
    Same broadcast + scan shape as strip_trap_params, then ONE agg."""
    agg = _cleaned_urls(df, stats, url_col, host_col).groupBy(host_col).agg(
        F.countDistinct("_before").alias("n_before"),
        F.countDistinct("_after").alias("n_after"),
    )
    saved = F.round(
        (F.col("n_before") - F.col("n_after")) / F.col("n_before"), 4
    )
    return agg.select(host_col, "n_before", "n_after", saved.alias("saved_frac"))


def strip_candidate_traps(candidates: DataFrame, stats: DataFrame) -> DataFrame:
    """Engine-facing strip for a candidate outlink set keyed by URL only
    (engine.py run_round's ``candidates``): derive the host (parse_url —
    engine URLs are already canonical), rewrite without flagged params,
    collapse to distinct URLs, recompute the seen-set hash. Output schema
    (url, url_hash) matches what the seen anti-join consumes, so the gate
    is a drop-in stage between outlink dedup and filter_unseen."""
    from mr_crawly_spark.functions.urls import url_hash_col, url_host_col

    with_host = candidates.select(
        url_host_col(F.col("url")).alias("host"), "url"
    )
    cleaned = strip_trap_params(with_host, stats, url_col="url", host_col="host")
    return cleaned.select("url").withColumn(
        "url_hash", url_hash_col(F.col("url"))
    )


def template_stats(
    df: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    min_urls: int = 20,
    expansion: float = 10.0,
    min_digit_run: int = 6,
    min_hex_run: int = 8,
) -> DataFrame:
    """Per host: n_urls, n_templates, expansion, top_share, is_trap.

    Templates collapse ONLY high-entropy runs (see url_template_col), so a
    host is flagged when many distinct URLs differ solely in opaque ids —
    path-side session tokens / uuids / timestamps that the query-param
    signal cannot see. Two map-side-combined aggs: (host, template) counts
    then the per-host rollup — both bounded by the template vocabulary."""
    if min_urls < 1:
        raise ValueError(f"min_urls must be >= 1, got {min_urls}")
    if expansion <= 1.0:
        raise ValueError(f"expansion must be > 1, got {expansion}")
    url = F.col(url_col)
    tmpl = url_template_col(url, min_digit_run=min_digit_run, min_hex_run=min_hex_run)
    per_tmpl = (
        df.select(F.col(host_col), url.alias("_url"), tmpl.alias("_tmpl"))
        .groupBy(host_col, "_tmpl")
        .agg(F.countDistinct("_url").alias("_cnt"))
    )
    per_host = per_tmpl.groupBy(host_col).agg(
        F.sum("_cnt").alias("n_urls"),
        F.count("*").alias("n_templates"),
        F.max("_cnt").alias("_top"),
    )
    exp_col = F.round(F.col("n_urls") / F.col("n_templates"), 4)
    top_share = F.round(F.col("_top") / F.col("n_urls"), 4)
    return per_host.select(
        host_col,
        "n_urls",
        "n_templates",
        exp_col.alias("expansion"),
        top_share.alias("top_share"),
        (
            (F.col("n_urls") >= min_urls)
            & (F.col("n_urls") / F.col("n_templates") >= expansion)
        ).alias("is_trap"),
    )
