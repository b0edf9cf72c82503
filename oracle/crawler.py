"""Sequential oracle: the executable specification of the crawl semantics.

The reference ships no working tests (tests/ empty; CI points at a missing
dir — .github/workflows/pytests.yml:23-24), so this oracle IS the golden
behavior our pytest suite asserts the Spark engine against (SURVEY.md §5).
It implements the reference's *intended* semantics — callbacks and queue
timing dissolved into a deterministic BFS-by-round loop — with the quirks
preserved:

- self-link quirk A4 (parser.py:57-58): the source URL joins the link set
  iff at least one same-domain link was found on the page;
- first-<url>-only sitemap quirk B9 (site_mapper.py:91): a leaf sitemap
  contributes exactly ONE url record;
- robots quirk B15 (site_downloader.py:49-52): URLs containing "sitemap"
  bypass robots; missing rules default to allow;
- map-failure fallback (manager.py:232-238): a seed whose host has no
  sitemap file enters the frontier itself;
- max-pages cutoff (manager.py:248-253): checked after each successful
  download — the crawl stops mid-round when the budget is reached;
- retry/backoff (manager.py:37): transient failures retry after 10/30/60
  logical seconds, at most MAX_RETRIES attempts; 404s are permanent errors.

Pinned deterministic order (SURVEY.md §7.2): rounds are BFS levels; within a
round, each host's slice is its top-k by (priority DESC, discovered_round
ASC, url ASC) with k = politeness budget; the in-round processing order is
(host ASC, priority DESC, discovered_round ASC, url ASC). Logical time
advances ROUND_SECONDS per round — never wall clock.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from mr_crawly_spark.datagen import (
    BACKOFF,
    DEFAULT_CRAWL_DELAY,
    DEFAULT_PRIORITY,
    MAX_RETRIES,
    ROUND_SECONDS,
    Corpus,
    host_budget,
    is_transient_fail,
)
from mr_crawly_spark.functions.urls import canonicalize_url


def url_host(url: str) -> str:
    """Host component — port stripped, matching the engine's
    ``parse_url(url, 'HOST')`` (functions/urls.py:url_host_col)."""
    netloc = url.split("://", 1)[1].split("/", 1)[0]
    return netloc.rsplit(":", 1)[0].lower() if ":" in netloc else netloc.lower()


def url_path(url: str) -> str:
    """Path component — query stripped, matching the engine's
    ``parse_url(url, 'PATH')`` (functions/urls.py:url_path_col)."""
    rest = url.split("://", 1)[1]
    path = "/" + rest.split("/", 1)[1] if "/" in rest else "/"
    return path.split("?", 1)[0]


@dataclass
class Entry:
    url: str
    host: str
    priority: float
    discovered_round: int
    status: str = "pending"
    retry_count: int = 0
    next_attempt_at: float = 0.0
    # sitemap recrawl metadata (O2, site_mapper.py:94-98): carried on the
    # frontier entry; None for link-discovered / fallback urls
    change_freq: str | None = None
    last_modified: str | None = None


@dataclass
class OracleResult:
    crawl_order: list[str] = field(default_factory=list)   # successful fetches, in order
    seen: set[str] = field(default_factory=set)            # urls ever admitted to frontier
    pages: dict[str, dict] = field(default_factory=dict)   # url -> {fetch_status, round, n_spans}
    links: set[tuple[str, str, str]] = field(default_factory=set)
    spans: dict[str, list[tuple]] = field(default_factory=dict)  # doc -> [(order,kind,text,media_ref)]
    sitemap_details: list[dict] = field(default_factory=list)
    frontier: dict[str, Entry] = field(default_factory=dict)
    rounds_run: int = 0


class OracleCrawler:
    def __init__(
        self,
        corpus: Corpus,
        max_pages: int = 10**9,
        max_rounds: int = 100,
        max_retries: int = MAX_RETRIES,
        default_delay: float = DEFAULT_CRAWL_DELAY,
    ):
        self.c = corpus
        self.max_pages = max_pages
        self.max_rounds = max_rounds
        # CLI `--retries` parity (reference main.py:33-38) — must equal the
        # engine's CrawlConfig.max_retries for golden lockstep
        self.max_retries = max_retries
        # CLI `--delay` parity (reference README.md:45): crawl delay for
        # hosts without a robots Crawl-delay — must equal the engine's
        # CrawlConfig.default_delay for golden lockstep
        self.default_delay = default_delay
        self.docs = {d["doc_id"]: d["spans"] for d in corpus.documents}
        self.sitemaps = {s["url"]: s for s in corpus.sitemaps_raw}
        self.res = OracleResult()

    # --- robots (F2/J4): first matching rule in rule_order wins; "sitemap"
    # substring bypasses; no rules / no match -> allow (B15) ----------------
    def robots_allows(self, url: str) -> bool:
        if "sitemap" in url:
            return True
        host, path = url_host(url), url_path(url)
        rules = sorted(
            (r for r in self.c.robots if r["host"] == host),
            key=lambda r: r["rule_order"],
        )
        for r in rules:
            if path.startswith(r["path_prefix"]):
                return bool(r["allow"])
        return True

    def _enqueue(
        self,
        url: str,
        priority: float,
        round_: int,
        change_freq: str | None = None,
        last_modified: str | None = None,
    ) -> None:
        if url in self.res.seen:
            return
        self.res.seen.add(url)
        self.res.frontier[url] = Entry(
            url=url, host=url_host(url), priority=priority,
            discovered_round=round_, change_freq=change_freq,
            last_modified=last_modified,
        )

    # --- bootstrap: sitemap expansion (site_mapper.py:69-135) --------------
    # Pinned dedup rule (order-free, so a distributed engine can reproduce
    # it): when several sitemap records announce the same loc, the frontier
    # entry gets the MAX announced priority; sitemap-less seeds fall back to
    # the seed URL itself (manager.py:232-238) at DEFAULT_PRIORITY.
    def bootstrap(self) -> None:
        fallbacks: list[str] = []
        for seed in sorted(self.c.seeds, key=lambda s: s["seed_url_id"]):
            seed_url = canonicalize_url(None, seed["url"])
            host = url_host(seed_url)
            start = None
            for cand in (f"https://{host}/sitemap-index.xml", f"https://{host}/sitemap.xml"):
                if cand in self.sitemaps:
                    start = cand
                    break
            if start is None:
                fallbacks.append(seed_url)
                continue
            # iterative expansion, index pages fan out (site_mapper.py:77-84)
            stack = [start]
            while stack:
                sm_url = stack.pop(0)
                sm = self.sitemaps.get(sm_url)
                if sm is None:
                    continue
                if sm["is_index"]:
                    stack.extend(sm["locs"])
                else:
                    # quirk B9: only the FIRST <url> record of a leaf
                    loc = sm["first_loc"]
                    if loc is None:
                        continue
                    canon = canonicalize_url(sm_url, loc)
                    pri = sm["first_priority"] if sm["first_priority"] is not None else DEFAULT_PRIORITY
                    self.res.sitemap_details.append(
                        {"source_url": seed_url, "index_url": sm_url, "loc": canon,
                         "priority": pri, "frequency": sm["first_changefreq"],
                         "modified": sm["first_lastmod"], "status": "mapped"}
                    )
        # pinned dedup rule shared with operators/sitemap.py: the winning
        # record is max(priority, frequency, modified) as a tuple with None
        # sorting smallest (empty-string sentinel); its recrawl metadata
        # rides along onto the frontier entry (O2)
        best: dict[str, tuple] = {}
        for d in self.res.sitemap_details:
            key = (d["priority"], d["frequency"] or "", d["modified"] or "")
            if d["loc"] not in best or key > best[d["loc"]]:
                best[d["loc"]] = key
        for loc in sorted(best):
            pri, freq, mod = best[loc]
            self._enqueue(loc, pri, 0, change_freq=freq or None,
                          last_modified=mod or None)
        for seed_url in fallbacks:
            self._enqueue(seed_url, DEFAULT_PRIORITY, 0)

    # --- outlink extraction (parser.py:38-59 semantics over spans) ---------
    def extract_links(self, url: str, spans: list[dict]) -> set[str]:
        host = url_host(url)
        links: set[str] = set()
        for s in sorted(spans, key=lambda s: s["offset"]):
            if s["kind"] != "link" or not s["text"]:
                continue
            canon = canonicalize_url(url, s["text"])
            if canon is None:
                continue
            if url_host(canon) == host:      # same-domain filter (parser.py:56)
                links.add(canon)
                links.add(url)               # self-link quirk A4 (parser.py:58)
        return links

    # --- one micro-batch round ---------------------------------------------
    def run_round(self, r: int) -> int:
        t = r * ROUND_SECONDS
        eligible = [
            e for e in self.res.frontier.values()
            if e.status == "pending" and e.next_attempt_at <= t
        ]
        # host-keyed window O3: per-host top-k by (priority DESC, round ASC, url ASC)
        by_host: dict[str, list[Entry]] = {}
        for e in eligible:
            by_host.setdefault(e.host, []).append(e)
        slice_: list[Entry] = []
        for host, entries in by_host.items():
            entries.sort(key=lambda e: (-e.priority, e.discovered_round, e.url))
            k = host_budget(self.c.crawl_delay(host, self.default_delay))
            slice_.extend(entries[:k])
        # in-round global order O5
        slice_.sort(key=lambda e: (e.host, -e.priority, e.discovered_round, e.url))

        processed = 0
        for e in slice_:
            if len(self.res.crawl_order) >= self.max_pages:
                break  # budget reached mid-round: rest stays pending (F6)
            processed += 1
            if not self.robots_allows(e.url):
                e.status = "robots_denied"
                continue
            spans = self.docs.get(e.url)
            if spans is None:
                e.status = "error"  # permanent 404
                self.res.pages[e.url] = {"fetch_status": 404, "round": r, "n_spans": 0}
                continue
            if is_transient_fail(e.url) and e.retry_count == 0:
                e.retry_count += 1
                if e.retry_count >= self.max_retries:
                    e.status = "error"
                else:
                    # attempts beyond the schedule reuse the last step
                    e.next_attempt_at = t + BACKOFF[
                        min(e.retry_count, len(BACKOFF)) - 1
                    ]
                continue
            # 200 OK
            e.status = "fetched"
            self.res.crawl_order.append(e.url)
            self.res.pages[e.url] = {"fetch_status": 200, "round": r, "n_spans": len(spans)}
            self.res.spans[e.url] = [
                (s["offset"], s["kind"], s["text"], s["media_ref"])
                for s in sorted(spans, key=lambda s: s["offset"])
            ]
            seed_url = f"https://{e.host}/"
            linkset = self.extract_links(e.url, spans)
            for link in sorted(linkset):
                self.res.links.add((seed_url, e.url, link))
                self._enqueue(link, DEFAULT_PRIORITY, r)
        return processed

    def run(self) -> OracleResult:
        self.bootstrap()
        r = 0
        while r < self.max_rounds:
            r += 1
            pending = [e for e in self.res.frontier.values() if e.status == "pending"]
            if not pending or len(self.res.crawl_order) >= self.max_pages:
                break
            self.run_round(r)
            self.res.rounds_run = r
        return self.res
