"""Inverted-index retrieval over the crawled corpus: a build-once postings
index plus document-at-a-time (DAAT) top-k search whose per-query cost
tracks the QUERY TERMS' postings, not the corpus — the retrieval complement
of curation.bm25_scores (which rescans every document per query; the index
amortizes tokenization and tf aggregation across all future queries, the
same build-once contract as similarity.lsh_index / ivf_index).

Reference parity: the reference crawler stores pages and links but ships no
search (mr_crawly/cache.py data tables); this is beyond-ref surface for the
task brief's training-data pipeline (find topic documents in a 10^10-page
crawl without a per-query corpus scan).

Scale notes (100 TB):
- Postings are BLOCKED: block = md5(doc_id) % n_doc_blocks, so a stopword's
  postings split across n_doc_blocks rows instead of materializing one
  multi-GB array row (the classic single-hot-key OOM). Raise n_doc_blocks
  with corpus size; blocks also give the query's explode natural
  parallelism.
- The build is tokenize -> explode -> ONE map-side-combined (term, doc) tf
  agg -> ONE bounded (term, block) postings agg: two shuffles at any size.
- A query filters the index to its literal term list FIRST (parquet
  predicate pushdown / partition pruning when the index is written
  partitioned by term bucket), so everything downstream is proportional to
  the matched postings.
- Score sums are decimal(20,6)-quantized per contribution (the
  selection.hashed_classifier_scores convention), so results are
  partition-order invariant and engine-reproducible; ties break on doc_id.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mr_crawly_spark.operators.curation import sample_hash_col

BLOCK_SALT = "blk"


def build_inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_doc_blocks: int = 64,
) -> DataFrame:
    """Build the postings index: one row per (term, block) with
    ``postings = array<struct<doc_id, tf>>`` sorted by doc_id and
    ``df_block`` = |postings| (blocks partition documents, so a term's
    corpus document frequency is the SUM of its df_block values — no
    distinct-count needed at query time).

    Tokenization is the bm25 contract: lowercase, whitespace split.
    Documents with only-whitespace text contribute nothing.
    """
    if n_doc_blocks < 1:
        raise ValueError(f"n_doc_blocks must be >= 1, got {n_doc_blocks}")
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    tf = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    blocked = tf.withColumn(
        "block",
        F.pmod(
            sample_hash_col(F.col("doc_id"), BLOCK_SALT), F.lit(n_doc_blocks)
        ).cast("int"),
    )
    return blocked.groupBy("term", "block").agg(
        F.count(F.lit(1)).cast("bigint").alias("df_block"),
        F.array_sort(F.collect_list(F.struct("doc_id", "tf"))).alias(
            "postings"
        ),
    )


def search_topk(
    index: DataFrame,
    query_terms: list[str],
    n_docs: int,
    k: int = 10,
    require_all: bool = False,
) -> DataFrame:
    """DAAT top-k over the postings index: filter the index to the literal
    query-term list (this is the pushdown/pruning step — nothing larger
    than the matched postings flows further), explode those postings, and
    combine per document.

    Score = Σ_t tf_t · idf_t with idf = ln((N+1)/(df_t+1)) + 1 (the smoothed
    tf-idf form; BM25's length normalization lives in curation.bm25_scores,
    which carries doc lengths — postings deliberately don't, to stay 16
    bytes/entry). Per-term idf folds into driver literals from a KB-sized
    df agg over the ALREADY-FILTERED index (≤ |terms|·n_doc_blocks rows).
    Each contribution is decimal(20,6)-quantized before the sum, so the
    score is partition-order invariant; the final top-k orders by
    (score desc, doc_id) — a TakeOrderedAndProject, never a global sort.

    ``require_all`` = conjunctive AND: only documents containing every
    query term (by distinct-term count — terms are deduped first).

    Returns (doc_id, n_terms, score) with ≤ k rows.
    """
    if n_docs < 0:
        raise ValueError(f"n_docs must be >= 0, got {n_docs}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    matched = index.filter(F.col("term").isin(terms))
    # per-term corpus df: blocks partition docs -> sum of df_block.
    # <= |terms| rows of driver metadata (the bm25_scores_exploded class).
    dfreq = {
        r["term"]: int(r["_df"])
        for r in matched.groupBy("term")
        .agg(F.sum("df_block").alias("_df"))
        .collect()
    }
    idf = {
        t: math.log((n_docs + 1.0) / (dfreq.get(t, 0) + 1.0)) + 1.0
        for t in terms
    }
    idf_map = F.create_map(
        *[x for t in terms for x in (F.lit(t), F.lit(idf[t]))]
    )
    hit = matched.select(
        "term", F.explode("postings").alias("_p")
    ).select(
        "term",
        F.col("_p.doc_id").alias("doc_id"),
        F.col("_p.tf").alias("tf"),
    )
    contrib = (F.col("tf") * idf_map[F.col("term")]).cast("decimal(20,6)")
    scored = hit.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum(contrib).cast("double").alias("score"),
    )
    if require_all:
        # a doc appears at most once per term (tf is pre-aggregated), so
        # the per-doc row count IS the distinct-term count
        scored = scored.filter(F.col("n_terms") == len(terms))
    return scored.orderBy(
        F.col("score").desc(), F.col("doc_id")
    ).limit(k)
