"""Manual smoke: run oracle + engine on the small corpus, diff results."""

from __future__ import annotations

import sys
import tempfile

from mr_crawly_spark.datagen import generate_corpus, corpus_to_spark
from mr_crawly_spark.engine import CrawlConfig, CrawlEngine
from mr_crawly_spark.session import get_spark
from mr_crawly_spark.sources.corpus import CorpusFetcher
from oracle.crawler import OracleCrawler

max_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 10**9

corpus = generate_corpus(n_hosts=4, base_pages=10, hot_factor=3, n_seeds=3)
oracle = OracleCrawler(corpus, max_pages=max_pages).run()
print(f"oracle: visited={len(oracle.crawl_order)} seen={len(oracle.seen)} "
      f"links={len(oracle.links)} rounds={oracle.rounds_run}")

spark = get_spark(master="local[4]", shuffle_partitions=8)
docs, robots, sitemaps, seeds = corpus_to_spark(spark, corpus)
wh = tempfile.mkdtemp(prefix="crawl_wh_")
eng = CrawlEngine(
    spark, CorpusFetcher(spark, documents=docs), robots, sitemaps, seeds,
    CrawlConfig(warehouse=wh, max_pages=max_pages),
)
hist = eng.run()
print("engine history:", hist)

e_order = [r["url"] for r in eng.crawl_order().orderBy("rank").collect()]
o_order = oracle.crawl_order
print(f"engine: visited={len(e_order)}")
if e_order != o_order:
    for i, (a, b) in enumerate(zip(o_order, e_order)):
        if a != b:
            print(f"  DIVERGE at {i}: oracle={a} engine={b}")
            break
    print(f"  len oracle={len(o_order)} engine={len(e_order)}")
    only_o = set(o_order) - set(e_order)
    only_e = set(e_order) - set(o_order)
    print("  only oracle:", sorted(only_o)[:5])
    print("  only engine:", sorted(only_e)[:5])
else:
    print("CRAWL ORDER MATCH")

e_seen = {r["url"] for r in eng.table("seen").collect()}
print("SEEN MATCH" if e_seen == oracle.seen else
      f"SEEN DIFF only_o={sorted(oracle.seen - e_seen)[:5]} only_e={sorted(e_seen - oracle.seen)[:5]}")

e_links = {(r["seed_url"], r["source_url"], r["linked_url"])
           for r in eng.table("links").collect()}
print("LINKS MATCH" if e_links == oracle.links else
      f"LINKS DIFF only_o={sorted(oracle.links - e_links)[:3]} only_e={sorted(e_links - oracle.links)[:3]}")
