"""Robots gate + per-host politeness budgets (SURVEY.md F2/J4/F7/O3-budget).

The reference consults ``urllib.robotparser`` per URL before every fetch
(site_downloader.py:42-52) with two quirks we replicate exactly (B15):
URLs containing "sitemap" bypass robots, and anything unmatched / hosts
without rules default to ALLOW.

Spark-first design: the matcher is a **pure join + window** — no UDF at all.
Candidates join the rules table on ``host``; ``startswith`` does the prefix
theta inside whole-stage codegen; the first matching rule in ``rule_order``
wins via a ``min(struct(rule_order, allow))`` aggregation (struct min orders
lexicographically, rule_order first). At 10^10-URL scale the robots table
for the crawled hosts is millions of rows, so the broadcast is SIZE-GATED
like the fetch join (sources/corpus.py): forced only when the caller's row
bound fits BROADCAST_ROW_LIMIT, else the plan is left to AQE to pick
broadcast vs host-partitioned shuffle from runtime sizes. There is no
Python in the hot path either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mr_crawly_spark.datagen import (
    DEFAULT_CRAWL_DELAY,
    MAX_PER_HOST_PER_ROUND,
    ROUND_SECONDS,
)
from mr_crawly_spark.functions.urls import url_path_col


# mirror of sources/corpus.py BROADCAST_ROW_LIMIT: above this many rule rows
# we stop FORCING a broadcast and let AQE pick the physical join — at 10^7+
# crawled hosts the rules table no longer fits a driver broadcast
BROADCAST_ROW_LIMIT = 1_000_000


def robots_gate(
    candidates: DataFrame,
    robots: DataFrame,
    approx_rule_rows: int | None = None,
) -> DataFrame:
    """Append boolean ``allowed`` to ``candidates`` (must carry url, host).

    Semantics: first rule (by rule_order) whose path_prefix prefixes the URL
    path decides; no rule / no match -> allow; "sitemap" substring -> allow
    (site_downloader.py:49-52).

    ``approx_rule_rows``: caller's cheap upper bound on the rules-table size
    (the engine counts its checkpointed robots frame once per crawl). The
    broadcast is FORCED only under BROADCAST_ROW_LIMIT; unknown or huge ->
    plain join, AQE converts to broadcast at runtime iff actually small.
    """
    from mr_crawly_spark.functions.colcache import session_cached

    c = session_cached(
        candidates.sparkSession,
        "politeness.gate",
        lambda: {
            "path": url_path_col(F.col("url")),
            "prefix": F.col("_path").startswith(F.col("path_prefix")),
            "first_rule": F.min(F.struct("rule_order", "allow")).alias("_first_rule"),
            "rule_allow": F.col("_first_rule.allow").alias("_rule_allow"),
            "allowed": F.when(
                F.col("url").contains("sitemap"), F.lit(True)
            ).otherwise(F.coalesce(F.col("_rule_allow"), F.lit(True))),
        },
    )
    cand = candidates.withColumn("_path", c["path"])
    rules = robots.select("host", "rule_order", "allow", "path_prefix")
    if approx_rule_rows is not None and approx_rule_rows <= BROADCAST_ROW_LIMIT:
        rules = F.broadcast(rules)
    matched = (
        cand.select("url", "host", "_path")
        .join(rules, "host", "inner")
        .filter(c["prefix"])
        .groupBy("url")
        .agg(c["first_rule"])
        .select("url", c["rule_allow"])
    )
    return (
        cand.join(matched, "url", "left")
        .withColumn("allowed", c["allowed"])
        .drop("_path", "_rule_allow")
    )


def parse_robots_txt(
    pages: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """Parse raw robots.txt bodies into the structured rules table (S2 —
    the reference's urllib.robotparser consumes the raw file,
    site_downloader.py:42-48; the sandbox corpus pre-structures rules, so
    this operator closes the loop for real robots.txt ingest).

    Pure JVM: posexplode lines -> strip comments -> key/value regex -> the
    governing ``User-agent`` group via a running last-non-null window ->
    ``*``-group Allow/Disallow rows in file order, with the group's
    Crawl-delay attached to every rule row (hosts with a delay but no path
    rules get one null-path row so host_budgets still sees the delay).
    Output schema matches schemas.ROBOTS: (host, rule_order, allow,
    path_prefix, crawl_delay).
    """
    from pyspark.sql import Window

    lines = pages.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "raw"),
    ).withColumn("line", F.trim(F.regexp_replace(F.col("raw"), "#.*$", "")))
    kv = lines.select(
        "host",
        "line_no",
        F.lower(F.regexp_extract(F.col("line"), r"^([A-Za-z-]+)\s*:", 1)).alias("key"),
        F.trim(F.regexp_extract(F.col("line"), r":\s*(.*)$", 1)).alias("val"),
    ).filter(F.col("key") != "")
    w_run = (
        Window.partitionBy("host")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grouped = kv.withColumn(
        "agent",
        F.last(
            F.when(F.col("key") == "user-agent", F.col("val")), ignorenulls=True
        ).over(w_run),
    ).filter(F.col("agent") == "*")
    delays = grouped.filter(F.col("key") == "crawl-delay").groupBy("host").agg(
        F.max(F.col("val").cast("double")).alias("crawl_delay")
    )
    rules = grouped.filter(
        F.col("key").isin("allow", "disallow") & (F.col("val") != "")
    ).select(
        "host",
        "line_no",
        (F.col("key") == "allow").alias("allow"),
        F.col("val").alias("path_prefix"),
    )
    w_order = Window.partitionBy("host").orderBy("line_no")
    ordered = rules.withColumn(
        "rule_order", (F.row_number().over(w_order) - 1).cast("int")
    ).drop("line_no")
    with_delay = ordered.join(delays, "host", "left")
    # delay-only hosts still need a row to carry crawl_delay into budgets
    delay_only = delays.join(
        ordered.select("host").distinct(), "host", "left_anti"
    ).select(
        "host",
        F.lit(0).cast("int").alias("rule_order"),
        F.lit(True).alias("allow"),
        F.lit(None).cast("string").alias("path_prefix"),
        "crawl_delay",
    )
    return with_delay.select(
        "host", "rule_order", "allow", "path_prefix", "crawl_delay"
    ).unionByName(delay_only)


def host_budgets(
    robots: DataFrame, default_delay: float = DEFAULT_CRAWL_DELAY
) -> DataFrame:
    """Per-host fetch budget for one round: floor(ROUND_SECONDS/crawl_delay),
    clamped to [1, MAX_PER_HOST_PER_ROUND]. Hosts without robots rows get the
    default via the left-join coalesce in the frontier slice (frontier.py).

    ``default_delay`` is the CLI ``--delay`` knob (reference README.md:45
    documents a default per-request delay; its code never implements it —
    we complete the promised politeness envelope): hosts whose robots rows
    carry no Crawl-delay fall back to it, matching the oracle's
    Corpus.crawl_delay(host, default) rule exactly."""
    return (
        robots.groupBy("host")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
        .withColumn(
            "k_host",
            F.greatest(
                F.lit(1),
                F.least(
                    F.lit(MAX_PER_HOST_PER_ROUND),
                    F.floor(
                        F.lit(ROUND_SECONDS)
                        / F.greatest(
                            F.coalesce(
                                F.col("crawl_delay"), F.lit(float(default_delay))
                            ),
                            F.lit(1e-9),
                        )
                    ).cast("int"),
                ),
            ),
        )
        .select("host", "k_host")
    )


def default_k_host(delay: float = DEFAULT_CRAWL_DELAY) -> int:
    """Round budget for a host with no robots rows at all — the DataFrame-
    free twin of host_budgets' clamp, applied via the left-join coalesce in
    frontier.select_slice. Must equal datagen.host_budget(delay)."""
    return max(
        1, min(MAX_PER_HOST_PER_ROUND, int(ROUND_SECONDS // max(delay, 1e-9)))
    )


DEFAULT_K_HOST = default_k_host(DEFAULT_CRAWL_DELAY)


# --------------------------------------------------------------------- #
# Adaptive per-host throttling (beyond the reference, whose politeness is
# static robots Crawl-delay only): AIMD on the observed transient-failure
# rate, the congestion-control shape production crawlers converge on
# (IRLbot WWW'08 adapts per-host budgets from observed behavior; TCP's
# multiplicative-decrease/additive-increase gives fast backoff off a
# struggling host and slow, probing recovery). A host answering 5xx is
# ASKING for less load — robots metadata can't say that mid-crawl.

THROTTLE_FLOOR = 1.0 / 16.0


def update_throttle(
    throttle: DataFrame | None,
    round_outcomes: DataFrame,
    fail_threshold: float = 0.3,
    decrease: float = 0.5,
    increase: float = 0.25,
) -> DataFrame:
    """Fold one round's per-host outcome counts into the throttle state.

    ``round_outcomes``: (host, n_processed, n_transient) for THIS round —
    a map-side-combined agg bounded by the round's slice, never the
    frontier. ``throttle``: (host, mult) from the previous round or None.

    A host whose transient rate exceeded ``fail_threshold`` halves its
    multiplier (floored at THROTTLE_FLOOR); a host observed healthy this
    round recovers by ``increase`` toward 1.0. Hosts with no observation
    this round keep their multiplier — no evidence, no change. Rows that
    recover to 1.0 are DROPPED, so the state holds only currently-
    throttled hosts: its size tracks misbehaving hosts, not the 10^7-host
    universe, and the per-round budgets join stays broadcastable."""
    rate = F.col("n_transient") / F.greatest(F.col("n_processed"), F.lit(1))
    obs = round_outcomes.select(
        "host", (rate > F.lit(float(fail_threshold))).alias("_failing")
    )
    base = (
        throttle
        if throttle is not None
        else obs.sparkSession.createDataFrame(
            [], "host string, mult double"
        )
    )
    # full-outer shape as left + anti union (the apply_throttle rationale,
    # cf5b2a0): Spark cannot execute a full outer join as a broadcast
    # join, so the one-row-per-observed-host obs frame would force a
    # shuffle of both sides every round. Both legs below are
    # broadcast-eligible (state holds only throttled hosts; obs is
    # bounded by the round's slice).
    merged = base.join(obs, "host", "left").unionByName(
        obs.join(base.select("host"), "host", "left_anti").withColumn(
            "mult", F.lit(None).cast("double")
        ).select("host", "mult", "_failing")
    )
    new_mult = (
        F.when(
            F.col("_failing"),
            F.greatest(
                F.lit(THROTTLE_FLOOR),
                F.coalesce(F.col("mult"), F.lit(1.0)) * F.lit(float(decrease)),
            ),
        )
        .when(
            F.col("_failing") == F.lit(False),
            F.least(
                F.lit(1.0),
                F.coalesce(F.col("mult"), F.lit(1.0)) + F.lit(float(increase)),
            ),
        )
        # no observation this round: keep the multiplier as-is
        .otherwise(F.col("mult"))
    )
    return (
        merged.select("host", new_mult.alias("mult"))
        .filter(F.col("mult") < 1.0)
    )


def apply_throttle(
    budgets: DataFrame, throttle: DataFrame, default_k: int
) -> DataFrame:
    """Effective per-round budgets = host_budgets scaled by the throttle.

    Full join: a throttled host with no robots rows (it would normally
    take ``default_k`` via select_slice's coalesce) gets an explicit
    scaled row here, so the throttle binds for it too. Budget floors at 1
    — a throttled host slows to a crawl, it is never starved outright
    (the multiplicative floor bounds the backoff; full exclusion is a
    robots/error-status decision, not a congestion one).

    Shape note: NOT a full outer join — Spark cannot execute full outer
    as a broadcast join, so it would shuffle the whole budgets frame
    (one row per ruled host) every round just to fold in the tiny
    throttle state. Left join + anti-join union below keeps both legs
    broadcast-eligible: the throttle side is small by construction
    (throttled hosts only) and AQE converts at runtime."""
    eff = F.greatest(
        F.lit(1),
        F.floor(
            F.coalesce(F.col("k_host"), F.lit(int(default_k))).cast("double")
            * F.coalesce(F.col("mult"), F.lit(1.0))
        ).cast("int"),
    )
    scaled = (
        budgets.join(throttle, "host", "left")
        .select("host", eff.alias("k_host"))
    )
    eff_extra = F.greatest(
        F.lit(1),
        F.floor(F.lit(float(default_k)) * F.col("mult")).cast("int"),
    )
    extra = (
        throttle.join(budgets.select("host"), "host", "left_anti")
        .select("host", eff_extra.alias("k_host"))
    )
    return scaled.unionByName(extra)
