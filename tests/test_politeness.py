"""Robots gate (F2/J4, quirk B15) + politeness budgets (O3/F7) unit tests —
Spark matcher vs the oracle's reference implementation on the same rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from mr_crawly_spark import schemas as S
from mr_crawly_spark.datagen import generate_corpus, host_budget
from mr_crawly_spark.functions.urls import url_host_col
from mr_crawly_spark.operators.politeness import (
    DEFAULT_K_HOST,
    host_budgets,
    robots_gate,
)
from oracle.crawler import OracleCrawler


def test_robots_gate_matches_oracle(spark, corpus):
    oracle = OracleCrawler(corpus)
    urls = sorted(d["doc_id"] for d in corpus.documents)[:400]
    urls += [f"https://{h}/sitemap-index.xml" for h in corpus.hosts]  # bypass quirk
    urls += [f"https://unknown{i}.test/private/1" for i in range(3)]  # no rules
    cand = spark.createDataFrame([(u,) for u in urls], "url string").withColumn(
        "host", url_host_col(F.col("url"))
    )
    robots = spark.createDataFrame(
        [(r["host"], r["rule_order"], r["allow"], r["path_prefix"], r["crawl_delay"])
         for r in corpus.robots],
        schema=S.ROBOTS,
    )
    got = {r["url"]: r["allowed"] for r in robots_gate(cand, robots).collect()}
    want = {u: oracle.robots_allows(u) for u in urls}
    assert got == want
    assert not all(want.values())   # some are actually denied
    assert any("sitemap" in u and want[u] for u in urls)


def test_host_budgets_match_formula(spark, corpus):
    robots = spark.createDataFrame(
        [(r["host"], r["rule_order"], r["allow"], r["path_prefix"], r["crawl_delay"])
         for r in corpus.robots],
        schema=S.ROBOTS,
    )
    got = {r["host"]: r["k_host"] for r in host_budgets(robots).collect()}
    for host in {r["host"] for r in corpus.robots}:
        assert got[host] == host_budget(corpus.crawl_delay(host))
    # default for rule-less hosts
    assert DEFAULT_K_HOST == host_budget(10.0)


def test_hot_host_skew_exists(corpus):
    """Datagen contract: one host holds >=30% of pages (salting is tested
    against real skew, not uniform data)."""
    from collections import Counter

    hosts = Counter(d["doc_id"].split("/")[2] for d in corpus.documents)
    top = hosts.most_common(1)[0][1]
    assert top / sum(hosts.values()) >= 0.30


def test_generate_corpus_deterministic():
    a = generate_corpus(n_hosts=3, base_pages=6)
    b = generate_corpus(n_hosts=3, base_pages=6)
    assert a.documents == b.documents
    assert a.robots == b.robots
    assert a.sitemaps_raw == b.sitemaps_raw
    assert a.seeds == b.seeds


def test_parse_robots_txt_round_trip(spark, corpus):
    """S2 fetch+parse: rendering the corpus's structured rules to raw
    robots.txt text and re-parsing must reproduce the rules exactly."""
    from collections import defaultdict

    from mr_crawly_spark.operators.politeness import parse_robots_txt

    by_host = defaultdict(list)
    for r in corpus.robots:
        by_host[r["host"]].append(r)
    rows = []
    for host, rules in by_host.items():
        lines = ["User-agent: *"]
        delays = [r["crawl_delay"] for r in rules if r["crawl_delay"] is not None]
        if delays:
            lines.append(f"Crawl-delay: {max(delays)}")
        for r in sorted(rules, key=lambda r: r["rule_order"]):
            if r["path_prefix"] is not None:
                verb = "Allow" if r["allow"] else "Disallow"
                lines.append(f"{verb}: {r['path_prefix']}  # trailing comment")
        rows.append((host, "\n".join(lines)))
    pages = spark.createDataFrame(rows, "host string, robots_txt string")
    got = {
        (r["host"], r["rule_order"], r["allow"], r["path_prefix"], r["crawl_delay"])
        for r in parse_robots_txt(pages).collect()
    }
    want = set()
    for host, rules in by_host.items():
        delays = [r["crawl_delay"] for r in rules if r["crawl_delay"] is not None]
        delay = max(delays) if delays else None
        path_rules = [
            r for r in sorted(rules, key=lambda r: r["rule_order"])
            if r["path_prefix"] is not None
        ]
        for i, r in enumerate(path_rules):
            want.add((host, i, bool(r["allow"]), r["path_prefix"], delay))
        if not path_rules and delay is not None:
            want.add((host, 0, True, None, delay))
    assert got == want
    assert got  # corpus actually has rules


def test_parse_robots_txt_agent_groups_and_edge_cases(spark):
    """Only the ``*`` group governs (the reference's robotparser is asked
    for agent "*"); comments, blank lines, and delay-only hosts parse."""
    from mr_crawly_spark.operators.politeness import parse_robots_txt

    txt_a = "\n".join([
        "# global file comment",
        "User-agent: googlebot",
        "Disallow: /google-only",
        "",
        "User-agent: *",
        "Crawl-delay: 2.5",
        "Disallow: /private",
        "Allow: /private/ok   # inline",
        "",
        "User-agent: bingbot",
        "Disallow: /bing-only",
    ])
    txt_b = "User-agent: *\nCrawl-delay: 7"
    pages = spark.createDataFrame(
        [("a.test", txt_a), ("b.test", txt_b)], "host string, robots_txt string"
    )
    got = {
        (r["host"], r["rule_order"], r["allow"], r["path_prefix"], r["crawl_delay"])
        for r in parse_robots_txt(pages).collect()
    }
    assert got == {
        ("a.test", 0, False, "/private", 2.5),
        ("a.test", 1, True, "/private/ok", 2.5),
        ("b.test", 0, True, None, 7.0),
    }


def test_parsed_robots_drive_the_gate(spark):
    """End-to-end: raw text -> parse_robots_txt -> robots_gate (first
    matching rule wins, sitemap bypass, default allow)."""
    from mr_crawly_spark.functions.urls import url_host_col
    from mr_crawly_spark.operators.politeness import parse_robots_txt, robots_gate

    txt = "User-agent: *\nDisallow: /private\nAllow: /private/ok"
    pages = spark.createDataFrame(
        [("h.test", txt)], "host string, robots_txt string"
    )
    rules = parse_robots_txt(pages)
    cand = spark.createDataFrame(
        [("https://h.test/private/x",), ("https://h.test/private/sitemap.xml",),
         ("https://h.test/open",), ("https://h.test/private/ok/page",)],
        "url string",
    ).withColumn("host", url_host_col(F.col("url")))
    got = {r["url"]: r["allowed"] for r in robots_gate(cand, rules, 10).collect()}
    assert got == {
        "https://h.test/private/x": False,          # Disallow matches first
        "https://h.test/private/sitemap.xml": True,  # B15 sitemap bypass
        "https://h.test/open": True,                 # no rule -> allow
        "https://h.test/private/ok/page": False,     # first match wins (order)
    }


def test_host_budgets_default_delay_for_null_crawl_delay(spark):
    """--delay reaches hosts whose robots rows carry no Crawl-delay: the
    budget coalesces the null to the configured default (matching the
    oracle's Corpus.crawl_delay(host, default) aggregation rule)."""
    from mr_crawly_spark.operators.politeness import default_k_host, host_budgets

    rules = spark.createDataFrame(
        [("a.test", 0, False, "/private/", 15.0), ("b.test", 0, False, "/x/", None)],
        "host string, rule_order int, allow boolean, path_prefix string, "
        "crawl_delay double",
    )
    got = {r["host"]: r["k_host"] for r in host_budgets(rules, 30.0).collect()}
    assert got == {"a.test": 4, "b.test": 2}  # 60/15 -> 4; null -> 60/30 -> 2
    assert default_k_host(30.0) == 2
    assert default_k_host(2.0) == 8   # MAX_PER_HOST_PER_ROUND cap
    assert default_k_host(10.0) == 6  # the documented default


# ------------------------------------------------------------------ #
# adaptive per-host throttling (beyond-ref; AIMD on observed transient
# rate, politeness.update_throttle/apply_throttle)
class TestAdaptiveThrottle:
    def _obs(self, spark, rows):
        return spark.createDataFrame(
            rows, "host string, n_processed long, n_transient long"
        )

    def test_aimd_dynamics(self, spark):
        from mr_crawly_spark.operators.politeness import (
            THROTTLE_FLOOR,
            update_throttle,
        )

        # round 1: h1 failing (60% > 30%), h2 healthy
        t1 = update_throttle(
            None, self._obs(spark, [("h1", 10, 6), ("h2", 10, 0)])
        )
        m = {r["host"]: r["mult"] for r in t1.collect()}
        assert m == {"h1": 0.5}  # h2 at 1.0 is pruned from the state
        # round 2: h1 still failing -> halves again; h3 appears failing
        t2 = update_throttle(
            t1, self._obs(spark, [("h1", 5, 5), ("h3", 4, 2)])
        )
        m = {r["host"]: r["mult"] for r in t2.collect()}
        assert m["h1"] == 0.25 and m["h3"] == 0.5
        # round 3: h1 healthy -> additive recovery; h3 unobserved -> kept
        t3 = update_throttle(t2, self._obs(spark, [("h1", 8, 0)]))
        m = {r["host"]: r["mult"] for r in t3.collect()}
        assert m["h1"] == 0.5 and m["h3"] == 0.5
        # two more healthy rounds: h1 recovers to 1.0 and is pruned
        t4 = update_throttle(t3, self._obs(spark, [("h1", 8, 0)]))
        t5 = update_throttle(t4, self._obs(spark, [("h1", 8, 0)]))
        m = {r["host"]: r["mult"] for r in t5.collect()}
        assert "h1" not in m and m["h3"] == 0.5
        # the floor binds under sustained failure
        t = None
        for _ in range(8):
            t = update_throttle(t, self._obs(spark, [("h9", 4, 4)]))
        m = {r["host"]: r["mult"] for r in t.collect()}
        assert m["h9"] == THROTTLE_FLOOR

    def test_apply_throttle_budgets(self, spark):
        from mr_crawly_spark.operators.politeness import apply_throttle

        budgets = spark.createDataFrame(
            [("h1", 8), ("h2", 8)], "host string, k_host int"
        )
        throttle = spark.createDataFrame(
            [("h1", 0.5), ("h_norules", 0.25)], "host string, mult double"
        )
        eff = {
            r["host"]: r["k_host"]
            for r in apply_throttle(budgets, throttle, default_k=6).collect()
        }
        assert eff["h1"] == 4       # scaled
        assert eff["h2"] == 8       # untouched
        assert eff["h_norules"] == 1  # floor(6 * 0.25) = 1 — never 0

    def test_outcome_agg_counts_live_requests_only(self, spark):
        from mr_crawly_spark.engine import _throttle_outcomes

        rows = [
            # h1: 6 denied + 2 live that both 5xx'd — the live failure
            # rate is 100%, and denied rows must not dilute it to 25%
            *[("h1", "robots_denied", False)] * 6,
            ("h1", "retry", False),
            ("h1", "retry", False),
            # h2: all cache hits — zero live observations, no row at all
            *[("h2", "success", True)] * 4,
            # h3: one live success
            ("h3", "success", False),
        ]
        df = spark.createDataFrame(
            rows, "host string, _outcome string, _from_cache boolean"
        )
        got = {
            r["host"]: (r["n_processed"], r["n_transient"])
            for r in _throttle_outcomes(df).collect()
        }
        assert got == {"h1": (2, 2), "h3": (1, 0)}

    def test_apply_throttle_plan_has_no_full_outer(self, spark):
        from mr_crawly_spark.operators.politeness import apply_throttle

        budgets = spark.createDataFrame(
            [("h1", 8)], "host string, k_host int"
        )
        throttle = spark.createDataFrame(
            [("h1", 0.5)], "host string, mult double"
        )
        plan = (
            apply_throttle(budgets, throttle, default_k=6)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # full outer can't broadcast — it would shuffle the whole budgets
        # frame (one row per ruled host) every round
        assert "FullOuter" not in plan, plan
