"""BPE merge learning on Spark — the first n merge rules of byte-pair
encoding tokenizer training (Sennrich et al. ACL 2016), learned corpus-wide.

Each round is exactly two distributed steps over the token stream:

1. adjacent-pair counting — ONE map-side-combined shuffle whose post-agg
   size is the pair-vocabulary (bounded by vocab^2 in theory, by the
   corpus's realized bigram set in practice), followed by a
   TakeOrderedAndProject top-1, so ONE row reaches the driver per round;
2. merge application — a leftmost non-overlapping string replace() folded
   into the next round's scan (pure JVM, zero shuffles). Leftmost
   non-overlapping replacement over a single-separator token stream is
   exactly BPE's greedy left-to-right merge order: the matched pair
   consumes its shared separator, so 'a a a' merges (1,2) and leaves the
   third 'a' — the textbook behavior.

The token stream is the document's whitespace tokens joined on \\x01; a
learned merge glues its pair with \\x02, which makes merged units atoms
for every later round while keeping them distinguishable from organic
tokens that happen to concatenate to the same string (the symbol-sequence
property real BPE training has). Both control bytes are stripped from the
input first so hostile text cannot forge an atom.

At 10^10 documents each round costs one corpus scan + one combined agg;
the corpus text itself never shuffles. Round r's scan re-evaluates r-1
replaces, so intermediate corpora are persisted and rolled (the MLlib
iterative-algorithm pattern) to keep lineage flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BPE_SEP = "\x01"
BPE_GLUE = "\x02"


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 4,
    text_col: str = "text",
    persist: bool = True,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules over the corpus.

    Returns (step, token_a, token_b, freq) — one row per learned rule in
    order; token_a/token_b may contain the \\x02 glue when a rule builds
    on an earlier merge. Ties break deterministically (freq DESC, then
    binary string order of the pair), so the trajectory is replayable in
    SQL. Stops early when no adjacent pair remains.
    """
    spark = docs.sparkSession
    clean = F.replace(
        F.replace(F.col(text_col), F.lit(BPE_SEP), F.lit(" ")),
        F.lit(BPE_GLUE),
        F.lit(" "),
    )
    cur = docs.select(
        F.concat_ws(BPE_SEP, F.split(F.trim(clean), r"\s+")).alias("s")
    )
    if persist:
        cur = cur.persist()
    prev = None
    merges: list[tuple[int, str, str, int]] = []
    try:
        for step in range(1, n_merges + 1):
            w = F.split(F.col("s"), BPE_SEP)
            n = F.size(w)
            pairs = cur.select(
                F.explode(
                    F.zip_with(
                        F.slice(w, F.lit(1), F.greatest(n - 1, F.lit(0))),
                        F.slice(w, F.lit(2), F.greatest(n - 1, F.lit(0))),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                    )
                ).alias("p")
            )
            top = (
                pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .count()
                .orderBy(F.desc("count"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b, freq = top[0]["a"], top[0]["b"], int(top[0]["count"])
            merges.append((step, a, b, freq))
            nxt = cur.select(
                F.replace(
                    F.col("s"),
                    F.lit(a + BPE_SEP + b),
                    F.lit(a + BPE_GLUE + b),
                ).alias("s")
            )
            if persist:
                nxt = nxt.persist()
                if prev is not None:
                    prev.unpersist()
                prev = cur
            cur = nxt
    finally:
        if persist:
            cur.unpersist()
            if prev is not None:
                prev.unpersist()
    return spark.createDataFrame(
        merges, "step int, token_a string, token_b string, freq bigint"
    )


def apply_bpe_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize ``text_col`` with an already-learned merge list: replay the
    rules in order (the BPE inference rule) and return the documents with a
    ``bpe_tokens`` array column. Pure JVM scan — zero shuffles, usable as a
    pre-training tokenization pass at any corpus size."""
    clean = F.replace(
        F.replace(F.col(text_col), F.lit(BPE_SEP), F.lit(" ")),
        F.lit(BPE_GLUE),
        F.lit(" "),
    )
    s = F.concat_ws(BPE_SEP, F.split(F.trim(clean), r"\s+"))
    for a, b in merges:
        s = F.replace(s, F.lit(a + BPE_SEP + b), F.lit(a + BPE_GLUE + b))
    return docs.withColumn("bpe_tokens", F.split(s, BPE_SEP))
