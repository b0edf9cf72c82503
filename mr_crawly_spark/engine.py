"""CrawlEngine: the micro-batch crawl loop (SURVEY.md §3.3, §2.9).

One round = one deterministic driver iteration (Trigger.AvailableNow-style):

    slice    = frontier rank window (O3) ∧ politeness gate (F7)
    fetched  = slice ⟕ corpus (J1, bucket-pruned broadcast join)
    outcome  = robots (F2) / 404 / transient-503 retry (F7) / 200
    links    = explode link spans (A1) → canonicalize (P2) → hash (P3)
               → same-domain (F1) → dedup + self-link quirk (D1/A4)
    fresh    = links ⟖̸ seen (J3, Bloom-prefiltered anti-join)
    frontier' = status rewrites + merge (D6); seen' += fresh
    snapshot (S11): frontier snapshot, seen/pages/links deltas, round manifest

Logical time advances ROUND_SECONDS per round — wall clock never enters the
semantics, so outputs are identical at any parallelism (the pytest suite
asserts local[2] ≡ local[8] ≡ sequential oracle).

Budget semantics (F6, manager.py:248-253): max_pages counts successful
fetches; when a round could cross the budget, a global-order window decides
exactly which slice entries are processed (the rest stay pending) — matching
the reference's mid-round shutdown. The window is single-partition, so it
only runs on rounds that can actually hit the budget (short-circuit).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mr_crawly_spark import schemas as S
from mr_crawly_spark.datagen import (
    BACKOFF,
    MAX_RETRIES,
    ROUND_SECONDS,
    TRANSIENT_FAIL_MOD,
)
from mr_crawly_spark.functions.urls import url_hash_col
from mr_crawly_spark.operators import seen as seen_ops
from mr_crawly_spark.operators.frontier import (
    apply_updates,
    new_frontier_entries,
    select_slice,
)
from mr_crawly_spark.operators.parse import extract_outlinks
from mr_crawly_spark.operators.politeness import host_budgets, robots_gate
from mr_crawly_spark.operators.sitemap import bootstrap_frontier_urls, expand_sitemaps
from mr_crawly_spark.plans.catalog import SnapshotCatalog
from mr_crawly_spark.sources.corpus import CorpusFetcher


@dataclass
class CrawlConfig:
    warehouse: str
    run_id: str = "run_0001"
    max_pages: int = 10**9
    max_rounds: int = 100
    salt_partitions: int | None = None   # repartition width for hot-host salting
    salt: int = 16
    use_bloom: bool = False
    bloom_buckets: int = 32
    bloom_fpp: float = 0.01
    # Bloom is sized once for the expected final seen-set cardinality; FPP
    # degrades (never correctness — it's a prefilter) if the crawl outgrows it
    bloom_expected_n: int = 1 << 20
    # parquet-snapshot cadence: rounds in between keep state as
    # localCheckpoint()ed in-memory DataFrames (lineage truncated, no disk
    # I/O); resume points exist at flushed rounds only. 1 = flush every
    # round (max resumability), larger = fewer commit jobs per round.
    checkpoint_interval: int = 1


def _transient_fail_col(url):
    """JVM-side twin of datagen.is_transient_fail: md5 of 'fail:'+url, first
    15 hex chars as int, mod TRANSIENT_FAIL_MOD — no UDF, codegen-friendly."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit("fail:"), url)), 1, 15), 16, 10)
    return h.cast("long") % TRANSIENT_FAIL_MOD == 0


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        fetcher: CorpusFetcher,
        robots: DataFrame,
        sitemaps_raw: DataFrame,
        seeds: DataFrame,
        config: CrawlConfig,
    ):
        self.spark = spark
        self.fetcher = fetcher
        self.robots = robots
        self.sitemaps_raw = sitemaps_raw
        self.seeds = seeds
        self.cfg = config
        self.catalog = SnapshotCatalog(spark, config.warehouse)
        self.budgets = host_budgets(robots)  # tiny, reused every round
        self.visited_count = 0
        self.round = 0
        # driver-tracked counters (exact, updated per round) — avoid
        # re-counting the frontier every round just to test loop conditions
        self.pending_count: int | None = None
        self.frontier_count: int | None = None
        self._blooms: dict[int, bytes] | None = None
        self._bloom_mk: tuple[int, int] | None = None
        # in-memory state between parquet snapshots (localCheckpoint'ed)
        self._frontier: DataFrame | None = None
        self._seen: DataFrame | None = None
        self._deltas: dict[str, list[DataFrame]] = {"pages": [], "links": [], "seen": []}
        self._last_metrics: dict = {}

    # ------------------------------------------------------------------ #
    def _write_run_row(self, end: bool) -> None:
        """Run bookkeeping (S9, data.py:38-60): start row at bootstrap, final
        row with end_time at completion (insert-then-update emulated as
        last-writer-wins rows; readers take max(end_time) per run_id)."""
        import datetime

        first_seed = self.seeds.orderBy("seed_url_id").first()
        now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
        if not end:
            self._run_started = now
        row = [(
            self.cfg.run_id,
            first_seed["url"] if first_seed else None,
            getattr(self, "_run_started", now),
            self.cfg.max_pages,
            now if end else None,
        )]
        self.catalog.commit(
            "runs", self.spark.createDataFrame(row, S.RUNS), self.round,
            mode="delta", n_rows=1,
        )

    def _write_sitemap_index_json(self) -> None:
        """S10 (manager.py:224-225): sitemap-index url -> child sitemap urls
        as a JSON side file next to the warehouse manifests. The index map is
        tiny relative to the crawl (one entry per sitemap-index document)."""
        import json as _json
        import os as _os

        rows = self.sitemaps_raw.filter(F.col("is_index")).select("url", "locs").collect()
        path = _os.path.join(self.cfg.warehouse, "sitemap_indexes.json")
        with open(path, "w") as f:
            _json.dump({r["url"]: list(r["locs"]) for r in rows}, f, indent=1)

    def bootstrap(self) -> None:
        """Round 0: sitemap expansion -> initial frontier + seen (SURVEY §3.2)."""
        details, fallback = expand_sitemaps(self.seeds, self.sitemaps_raw)
        first = bootstrap_frontier_urls(details, fallback)
        frontier = new_frontier_entries(first, round_=0, run_id=self.cfg.run_id)
        seen = frontier.select("url_hash", "url").withColumn(
            "first_seen_round", F.lit(0)
        ).withColumn("run_id", F.lit(self.cfg.run_id))
        self.catalog.commit("sitemaps", details, 0, mode="delta")
        m = self.catalog.commit("frontier", frontier, 0, mode="snapshot")
        self.catalog.commit("seen", seen, 0, mode="delta", n_rows=m["n_rows"])
        empty_pages = self.spark.createDataFrame([], S.PAGES)
        empty_links = self.spark.createDataFrame([], S.LINKS)
        self.catalog.commit("pages", empty_pages, 0, mode="delta", n_rows=0)
        self.catalog.commit("links", empty_links, 0, mode="delta", n_rows=0)
        self.round = 0
        self.visited_count = 0
        self.pending_count = m["n_rows"]
        self.frontier_count = m["n_rows"]
        self._frontier = self.catalog.load("frontier", max_round=0)
        self._seen = self.catalog.load("seen", max_round=0)
        self._deltas = {"pages": [], "links": [], "seen": []}
        self._write_run_row(end=False)
        self._write_sitemap_index_json()
        self._commit_round(
            {"visited_count": 0, "processed": 0, "pending_count": m["n_rows"]}
        )

    def resume(self) -> bool:
        """Pick up from the last complete round manifest (north_rule:
        'resumable from checkpoint'). Returns True if state was found."""
        last = self.catalog.last_round()
        if last is None:
            return False
        self.round = last["round"]
        self.visited_count = last["visited_count"]
        self.pending_count = last.get("pending_count")  # None -> recount lazily
        self.frontier_count = None
        self._frontier = None  # reload from the flushed snapshot lazily
        self._seen = None
        self._deltas = {"pages": [], "links": [], "seen": []}
        return True

    def _commit_round(self, extra: dict) -> None:
        self.catalog.commit_round(
            self.round,
            {
                "run_id": self.cfg.run_id,
                "logical_time": self.round * ROUND_SECONDS,
                **extra,
            },
        )

    # ------------------------------------------------------------------ #
    def _bloom_sidecar_path(self) -> str:
        import os

        return os.path.join(self.cfg.warehouse, "seen_bloom")

    def _maybe_build_blooms(self, seen: DataFrame) -> None:
        """Build the bucketed Bloom once (full scan of seen), then keep it
        incrementally updated per round (_bloom_add_delta) — the full build
        never reruns inside a crawl. On resume the sidecar is reloaded."""
        if not self.cfg.use_bloom or self._blooms is not None:
            return
        m, k = seen_ops.bloom_params(self.cfg.bloom_expected_n, self.cfg.bloom_fpp)
        self._bloom_mk = (m, k)
        import os

        if os.path.isdir(self._bloom_sidecar_path()):
            self._blooms = seen_ops.read_bloom_sidecar(
                self.spark, self._bloom_sidecar_path()
            )
            return
        self._blooms = seen_ops.build_bucket_blooms(
            seen, self.cfg.bloom_buckets, m, k
        )

    def _bloom_add_delta(self, seen_delta: DataFrame) -> None:
        """OR the new urls' bitmaps into the cached Bloom (distributed build
        on the small delta; no driver-side hashing of raw urls)."""
        if self._blooms is None:
            return
        m, k = self._bloom_mk
        delta = seen_ops.build_bucket_blooms(
            seen_delta, self.cfg.bloom_buckets, m, k
        )
        import numpy as np

        for bucket, bits in delta.items():
            if bucket in self._blooms:
                merged = np.frombuffer(self._blooms[bucket], dtype=np.uint8) | \
                    np.frombuffer(bits, dtype=np.uint8)
                self._blooms[bucket] = merged.tobytes()
            else:
                self._blooms[bucket] = bits

    def _outcome_counts(self, df: DataFrame) -> dict:
        """One aggregation job for every per-round metric."""
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_is_success")).alias("ok"),
            F.sum((F.col("_outcome") == "robots_denied").cast("int")).alias("denied"),
            F.sum((F.col("_outcome") == "error404").cast("int")).alias("err404"),
            F.sum((F.col("_outcome") == "retry").cast("int")).alias("retries"),
            F.sum(
                (
                    (F.col("_outcome") == "retry")
                    & (F.col("retry_count") + 1 < MAX_RETRIES)
                ).cast("int")
            ).alias("retry_back"),
        ).first()
        return {k: int(row[k] or 0) for k in
                ("n", "ok", "denied", "err404", "retries", "retry_back")}

    def run_round(self) -> dict:
        """Execute one crawl round; returns the round's metric dict."""
        r = self.round + 1
        t = r * ROUND_SECONDS
        if self._frontier is None:
            self._frontier = self.catalog.load("frontier", max_round=self.round)
        if self._seen is None:
            self._seen = self.catalog.load("seen", max_round=self.round)
        frontier, seen = self._frontier, self._seen

        sliced = select_slice(
            frontier, self.budgets, t,
            salt_partitions=self.cfg.salt_partitions, salt=self.cfg.salt,
        )
        gated = robots_gate(sliced, self.robots)
        fetched = self.fetcher.fetch(gated)

        classified = (
            fetched.withColumn(
                "_transient",
                _transient_fail_col(F.col("url"))
                & (F.col("retry_count") == 0)
                & F.col("spans").isNotNull(),
            )
            .withColumn(
                "_outcome",
                F.when(~F.col("allowed"), F.lit("robots_denied"))
                .when(F.col("spans").isNull(), F.lit("error404"))
                .when(F.col("_transient"), F.lit("retry"))
                .otherwise(F.lit("success")),
            )
            .withColumn("_is_success", (F.col("_outcome") == "success").cast("int"))
            .persist()
        )
        cnt = self._outcome_counts(classified)
        n_slice = cnt["n"]
        if n_slice == 0:
            self.round = r
            self._last_metrics = {"round": r, "processed": 0, "fetched_ok": 0}
            if r % self.cfg.checkpoint_interval == 0:
                self.flush()
            classified.unpersist()
            return self._last_metrics

        # --- budget gate (F6): only rounds that actually cross max_pages pay
        # for the global-order window -----------------------------------------
        if self.visited_count + cnt["ok"] > self.cfg.max_pages:
            w = Window.orderBy(
                F.col("host").asc(),
                F.col("priority").desc(),
                F.col("discovered_round").asc(),
                F.col("url").asc(),
            ).rowsBetween(Window.unboundedPreceding, -1)
            classified = classified.withColumn(
                "_succ_before", F.coalesce(F.sum("_is_success").over(w), F.lit(0))
            ).withColumn(
                "_processed",
                (F.lit(self.visited_count) + F.col("_succ_before"))
                < F.lit(self.cfg.max_pages),
            ).persist()
            processed = classified.filter(F.col("_processed"))
            cnt = self._outcome_counts(processed)
        else:
            classified = classified.withColumn("_processed", F.lit(True))
            processed = classified.filter(F.col("_processed"))

        successes = processed.filter(F.col("_outcome") == "success")
        errors404 = processed.filter(F.col("_outcome") == "error404")

        # --- sinks: pages (S5/S6) -------------------------------------------
        def page_rows(df: DataFrame, status: int) -> DataFrame:
            return df.select(
                "url", "url_hash", "host",
                F.lit(status).alias("fetch_status"),
                F.coalesce(F.size("spans"), F.lit(0)).cast("int").alias("n_spans"),
                F.lit(r).alias("round"),
                "priority", "discovered_round",
                F.lit(self.cfg.run_id).alias("run_id"),
            )

        pages_delta = page_rows(successes, 200).unionByName(page_rows(errors404, 404))

        # --- parse + links (A1/A2/F1/D1/A4, S7) ------------------------------
        # persisted: feeds the links sink AND the seen/frontier merge — without
        # it the canonicalize UDF + dedup shuffles would run once per consumer
        links_pairs = extract_outlinks(
            successes.select("url", "host", "spans")
        ).persist()
        links_delta = links_pairs.join(
            successes.select(F.col("url").alias("source_url"), "host"),
            "source_url",
            "inner",
        ).select(
            F.concat(F.lit("https://"), F.col("host"), F.lit("/")).alias("seed_url"),
            "source_url",
            "linked_url",
            F.lit(r).alias("round"),
            F.lit(self.cfg.run_id).alias("run_id"),
        ).dropDuplicates(["seed_url", "source_url", "linked_url"])

        # --- dedup against seen (D2/J3) --------------------------------------
        candidates = (
            links_pairs.select(F.col("linked_url").alias("url"))
            .dropDuplicates(["url"])
            .withColumn("url_hash", url_hash_col(F.col("url")))
        )
        self._maybe_build_blooms(seen)
        if self._blooms is not None:
            m, k = self._bloom_mk
            fresh = seen_ops.filter_unseen(
                candidates, seen, self._blooms, self.cfg.bloom_buckets, m, k
            )
        else:
            fresh = seen_ops.filter_unseen(candidates, seen)

        new_entries = new_frontier_entries(
            fresh.select("url"), round_=r, run_id=self.cfg.run_id
        ).persist()  # consumed by both the seen delta and the frontier union
        seen_delta = new_entries.select("url_hash", "url").withColumn(
            "first_seen_round", F.lit(r)
        ).withColumn("run_id", F.lit(self.cfg.run_id))

        # --- frontier status rewrites (P10) -----------------------------------
        updates = processed.select(
            "url_hash",
            "url",
            F.when(F.col("_outcome") == "success", F.lit("fetched"))
            .when(F.col("_outcome") == "robots_denied", F.lit("robots_denied"))
            .when(F.col("_outcome") == "error404", F.lit("error"))
            .when(F.col("retry_count") + 1 >= MAX_RETRIES, F.lit("error"))
            .otherwise(F.lit("pending"))
            .alias("new_status"),
            F.when(F.col("_outcome") == "retry", F.col("retry_count") + 1)
            .otherwise(F.col("retry_count"))
            .alias("new_retry_count"),
            F.when(
                (F.col("_outcome") == "retry")
                & (F.col("retry_count") + 1 < MAX_RETRIES),
                F.lit(t)
                + F.element_at(
                    F.array(*[F.lit(b) for b in BACKOFF]), F.col("retry_count") + 1
                ),
            )
            .otherwise(F.col("next_attempt_at"))
            .alias("new_next_attempt_at"),
        )
        frontier_next = apply_updates(frontier, updates).unionByName(new_entries)

        # --- state update: localCheckpoint (lineage cut, in-memory) ----------
        n_ok, n_processed = cnt["ok"], cnt["n"]
        # coalesce the small per-round deltas so the in-memory union's
        # partition count stays bounded between flushes
        seen_delta_ck = seen_delta.coalesce(8).localCheckpoint()
        n_new = seen_delta_ck.count()  # cheap: already materialized
        if self.cfg.use_bloom and n_new:
            self._bloom_add_delta(seen_delta_ck)
        self._frontier = frontier_next.localCheckpoint()
        self._seen = seen.unionByName(seen_delta_ck)
        self._deltas["seen"].append(seen_delta_ck)
        self._deltas["pages"].append(pages_delta.coalesce(8).localCheckpoint())
        self._deltas["links"].append(links_delta.coalesce(8).localCheckpoint())

        metrics = {
            "round": r,
            "slice": n_slice,
            "processed": n_processed,
            "fetched_ok": n_ok,
            "denied": cnt["denied"],
            "err404": cnt["err404"],
            "retries": cnt["retries"],
            "new_urls": n_new,
        }
        self.visited_count += n_ok
        if self.frontier_count is not None:
            self.frontier_count += n_new
        if self.pending_count is not None:
            self.pending_count += n_new + cnt["retry_back"] - n_processed
        self.round = r
        self._last_metrics = metrics
        if r % self.cfg.checkpoint_interval == 0:
            self.flush()
        classified.unpersist()
        links_pairs.unpersist()
        new_entries.unpersist()
        return metrics

    def flush(self) -> None:
        """Parquet-snapshot the in-memory state (S11): frontier snapshot,
        one batched delta per append-only table, then the round manifest
        (written last — the atomic resume point)."""
        r = self.round
        if getattr(self, "_flushed_round", None) == r:
            return
        self._flushed_round = r
        if self._frontier is not None:
            self.catalog.commit(
                "frontier", self._frontier, r, mode="snapshot",
                metrics=self._last_metrics, n_rows=self.frontier_count,
            )
        for table in ("seen", "pages", "links"):
            deltas = self._deltas[table]
            if deltas:
                df = deltas[0]
                for d in deltas[1:]:
                    df = df.unionByName(d)
                self.catalog.commit(table, df, r, mode="delta")
                self._deltas[table] = []
        if self.cfg.use_bloom and self._blooms is not None:
            # persist the Bloom next to the seen snapshot (resume/scale path)
            seen_ops.write_bloom_sidecar(
                self.spark, self._blooms, self._bloom_sidecar_path()
            )
        # reload state from the flushed parquet: bounds partition counts and
        # drops the accumulated in-memory blocks
        self._frontier = None
        self._seen = None
        self._commit_round(
            {"visited_count": self.visited_count,
             "pending_count": self.pending_count, **self._last_metrics}
        )

    # ------------------------------------------------------------------ #
    def has_pending(self) -> bool:
        if self.pending_count is not None:
            return self.pending_count > 0
        frontier = self.catalog.load("frontier", max_round=self.round)
        n = frontier.filter(F.col("status") == "pending").count()
        self.pending_count = n
        return n > 0

    def run(self, fresh: bool = True) -> list[dict]:
        """Drive until the frontier drains or budgets run out (main.py:17-21)."""
        if fresh or not self.resume():
            self.bootstrap()
        history: list[dict] = []
        while (
            self.round < self.cfg.max_rounds
            and self.visited_count < self.cfg.max_pages
            and self.has_pending()
        ):
            history.append(self.run_round())
        if self.round % self.cfg.checkpoint_interval != 0:
            self.flush()  # final state always lands on disk
        self._write_run_row(end=True)  # complete_run (data.py:52-60)
        return history

    # ------------------------------------------------------------------ #
    # result accessors (golden-comparison views)
    def crawl_order(self) -> DataFrame:
        """Deterministic global crawl order O5: (round, host, priority DESC,
        discovered_round, url) over successful fetches."""
        if any(self._deltas.values()):
            self.flush()
        pages = self.catalog.load("pages", max_round=self.round)
        w = Window.orderBy(
            F.col("round").asc(), F.col("host").asc(), F.col("priority").desc(),
            F.col("discovered_round").asc(), F.col("url").asc(),
        )
        return (
            pages.filter(F.col("fetch_status") == 200)
            .withColumn("rank", F.row_number().over(w))
            .select("rank", "url")
        )

    def table(self, name: str) -> DataFrame:
        if any(self._deltas.values()):
            self.flush()
        return self.catalog.load(name, max_round=self.round)
