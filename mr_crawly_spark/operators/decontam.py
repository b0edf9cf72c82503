"""Benchmark decontamination + exact-substring-duplication signals for the
training-data pipeline (task brief: dedup / curation at 100 TB).

Two operators, both over word n-gram shingles (the same zipped-slice
shingle machinery as MinHash, ``functions/text.py``):

- :func:`ngram_contamination` — the GPT-3-style decontamination check:
  for each corpus document, how many of its distinct n-grams also occur in
  a benchmark/eval set. At real scale the benchmark side is tiny (eval
  suites are MBs against a 100-TB corpus), so its distinct-shingle set is
  broadcast and the whole check is ONE scan of the corpus with a map-side
  hash-join — no shuffle of corpus text at all, only the final per-doc
  groupBy (map-side combined, one narrow shuffle of (doc_id, counts)).

- :func:`duplicated_ngram_fraction` — the exact-substring-duplication
  signal (the cheap relative of suffix-array dedup, Lee et al. 2021,
  "Deduplicating Training Data Makes Language Models Better"): per
  document, the fraction of its distinct n-grams that occur in ≥2
  documents. Shape: explode distinct shingles → md5-hash each shingle to a
  60-bit int (cuts shuffle width from full n-gram strings to 8 bytes; the
  SAME md5-prefix hash is computable in DuckDB so the oracle matches
  bit-for-bit) → groupBy shingle-hash with map-side combine (hot shingles
  like common phrases collapse to one row per map task BEFORE the shuffle,
  which is why this uses groupBy+join rather than a window: a window over
  a hot shingle would funnel every occurrence of "the end of" into one
  partition) → join doc-frequency back → per-doc aggregate.

Both emit exact ANSI-SQL twins in ``__spark_entry__.oracle_sql()``;
documents with fewer than n tokens have no shingles and are absent from
the output of both (explode/unnest agree on dropping empties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mr_crawly_spark.functions.text import shingles


def _distinct_doc_shingles(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("sh"),
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per corpus document: (doc_id, n_ngrams, n_contaminated, contam_frac)
    where n_contaminated counts the document's distinct n-grams that also
    appear anywhere in ``benchmark``.

    ``broadcast_bench`` defaults True (eval sets are small); pass False to
    let AQE pick the strategy when the benchmark side is itself large
    (e.g. decontaminating against another corpus) — the plan degrades to a
    shuffle equi-join on the shingle, still no cross product.
    """
    bench_sh = (
        benchmark.select(
            F.explode(
                F.array_distinct(shingles(F.col(text_col), n))
            ).alias("sh")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)
    doc_sh = _distinct_doc_shingles(corpus, n, id_col, text_col)
    joined = doc_sh.join(bench_sh, "sh", "left")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.count("_hit").alias("n_contaminated"),
        F.round(F.count("_hit") / F.count(F.lit(1)), 4).alias("contam_frac"),
    )


def duplicated_ngram_fraction(
    docs: DataFrame,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per document: (doc_id, n_ngrams, n_dup, dup_frac) where n_dup counts
    the document's distinct n-grams that occur in ≥2 documents corpus-wide.

    dup_frac ≈ 1 flags near-verbatim boilerplate (mirrors the
    exact-substring dedup signal); the downstream gate is typically
    ``dup_frac < threshold`` composed into the curation pipeline.
    """
    doc_sh = _distinct_doc_shingles(docs, n, id_col, text_col).select(
        id_col,
        # md5-prefix 60-bit hash — identical expression in the DuckDB
        # oracle; shuffles 8 bytes per shingle instead of the string
        F.conv(F.substring(F.md5(F.col("sh")), 1, 15), 16, 10)
        .cast("long")
        .alias("sh_h"),
    )
    # per-doc distinct already applied, so count(*) per hash == doc frequency
    doc_freq = doc_sh.groupBy("sh_h").agg(F.count(F.lit(1)).alias("_df"))
    joined = doc_sh.join(doc_freq, "sh_h")
    dup = F.sum(F.when(F.col("_df") >= 2, 1).otherwise(0))
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        dup.cast("bigint").alias("n_dup"),
        F.round(dup / F.count(F.lit(1)), 4).alias("dup_frac"),
    )
