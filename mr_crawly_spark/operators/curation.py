"""Corpus-curation operators for the training-data pipeline (task brief):
token-bounded chunking and deterministic sampling. Both are pure JVM
column expressions with exact DuckDB twins in __spark_entry__ — and both
are RNG-free (md5-derived decisions), so reruns, resumes, and different
partitionings produce identical outputs (the same determinism contract as
the crawl engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mr_crawly_spark.functions.text import tokens


def chunk_documents(
    documents: DataFrame,
    max_tokens: int = 100,
    overlap: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into token-bounded sliding chunks — the standard
    pre-training preparation for long documents (context-window packing).

    Output: (id_col, chunk_index, chunk_text, n_tokens), one row per chunk;
    stride = max_tokens - overlap, the last chunk may be short, documents
    shorter than max_tokens yield exactly one chunk. All JVM: sequence ->
    explode -> slice over the token array (tokenized once per row), so the
    fan-out runs inside whole-stage codegen and scales with output rows.
    """
    assert 0 <= overlap < max_tokens
    stride = max_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # number of stride-aligned windows covering all n tokens:
    # 1 + ceil(max(n - max_tokens, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - max_tokens, F.lit(0)) / F.lit(stride)
    ).cast("int")
    with_toks = documents.select(
        F.col(id_col), toks.alias("_toks"), n_chunks.alias("_nc")
    )
    exploded = with_toks.select(
        id_col,
        "_toks",
        F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_index"),
    )
    piece = F.slice(
        F.col("_toks"), F.col("chunk_index") * stride + 1, max_tokens
    )
    return exploded.select(
        id_col,
        F.col("chunk_index").cast("bigint").alias("chunk_index"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("bigint").alias("n_tokens"),
    )


def pack_sequences(
    documents: DataFrame,
    seq_len: int = 128,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style sequence packing (Brown et al. 2020 §2.1): concatenate
    documents end-to-end into a token stream and slice it into fixed
    ``seq_len`` blocks — documents STRADDLE block boundaries, so every
    training sequence except a shard's last is exactly full (zero padding
    waste). The complement of :func:`chunk_documents`, which windows each
    document independently and pads/short-fills the tail.

    Packing is a sequential recurrence (each block's content depends on
    every earlier document), so it runs PER SHARD: shard =
    md5-hash(id) % n_shards — deterministic and engine-independent, unlike
    a partition id. Practitioners pack per output shard/file for exactly
    this reason; parallelism = n_shards regardless of corpus size, and the
    per-shard running offset is ONE window over that shard only. A
    document touching b blocks explodes into b rows (b <= n/seq_len + 1),
    and blocks reassemble with ONE groupBy on (shard, seq_id) whose groups
    are bounded at seq_len tokens — two shuffles total at any corpus size.

    Output: (shard, seq_id, n_docs, n_tokens, packed_fp) — one row per
    packed sequence; n_tokens == seq_len everywhere but each shard's final
    block; packed_fp = md5 of the space-joined packed tokens (the full
    sequence's identity without shipping seq_len-token strings around).

    Determinism contract: stream order within a shard is ``id_col`` order,
    so reruns, resumes, and repartitionings pack byte-identical sequences
    (docs with only-whitespace text are dropped — they contribute no
    tokens and would perturb n_docs).
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    base = (
        documents.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("_id"),
            F.pmod(sample_hash_col(F.col(id_col), "pack"), F.lit(n_shards))
            .cast("int")
            .alias("shard"),
            toks.alias("_toks"),
        )
        .withColumn("_n", F.size("_toks").cast("bigint"))
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pos = base.select(
        "shard",
        "_toks",
        "_n",
        F.coalesce(F.sum("_n").over(w), F.lit(0)).cast("bigint").alias("_start"),
    )
    # blocks this doc touches: floor(start/L) .. floor((end-1)/L), integer
    # div (never float — a double quotient could round across a boundary)
    blocks = pos.select(
        "shard",
        "_toks",
        "_start",
        (F.col("_start") + F.col("_n")).alias("_end"),
        F.explode(
            F.sequence(
                F.expr(f"_start div {seq_len}"),
                F.expr(f"(_start + _n - 1) div {seq_len}"),
            )
        ).alias("seq_id"),
    )
    off = F.greatest(F.col("_start"), F.col("seq_id") * seq_len)
    pend = F.least(F.col("_end"), (F.col("seq_id") + 1) * seq_len)
    pieces = blocks.select(
        "shard",
        "seq_id",
        off.alias("_off"),
        F.slice(
            "_toks", (off - F.col("_start") + 1).cast("int"), (pend - off).cast("int")
        ).alias("_piece"),
    )
    packed = (
        pieces.groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_off", "_piece"))),
                    lambda x: x["_piece"],
                )
            ).alias("_packed"),
        )
        .select(
            "shard",
            F.col("seq_id").cast("bigint").alias("seq_id"),
            "n_docs",
            F.size("_packed").cast("bigint").alias("n_tokens"),
            F.md5(F.concat_ws(" ", "_packed")).alias("packed_fp"),
        )
    )
    return packed


SAMPLE_MOD = 1_000_000


def sample_hash_col(key: Column, salt: str) -> Column:
    """Deterministic uniform draw in [0, SAMPLE_MOD): md5 of salt|key,
    first 15 hex chars as int, mod 10^6 — identical in DuckDB."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(SAMPLE_MOD))


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str,
    salt: str = "sample",
) -> DataFrame:
    """Keep ~fraction of rows, decided by an md5 threshold on the row key —
    no RNG state, so the sample is identical across runs, engines, resumes,
    and partitionings (Spark's df.sample is seed+partition-layout dependent
    and NOT reproducible after a repartition). Different salts give
    independent samples; a row's fate is monotone in fraction (a 1% sample
    is a subset of the 10% sample — handy for staged experiments)."""
    threshold = int(fraction * SAMPLE_MOD)
    return df.filter(sample_hash_col(F.col(key_col), salt) < threshold)


# per-term column bound for bm25_scores: each query term adds a withColumn
# + an agg column, so plan width (and Catalyst analysis time) is linear in
# terms — fine for topic queries, degenerate at hundreds (r4 verdict #4)
BM25_MAX_TERMS = 32


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a fixed query-term set —
    the standard corpus-curation ranking primitive (select training docs
    matching a topic query; score quality prompts against anchors).

    Spark-first shape, pure JVM end to end:
    - one whitespace tokenization per doc (lowercased), per-term tf via
      ``size(filter(tokens, = term))`` — whole-stage codegen, no UDF;
    - corpus statistics (N, avgdl, per-term df) are ONE map-side-combined
      aggregation collapsing to a single driver row (KBs at any corpus
      size — this is the only driver touch, same class as IVF centroids);
    - idf = ln((N - df + 0.5)/(df + 0.5) + 1)  (the Lucene BM25+ form)
      folds into literal coefficients, so the final score is one scan-only
      projection: score = Σ_t idf_t · tf_t·(k1+1) / (tf_t + k1·(1 − b +
      b·dl/avgdl)). At 10^10 docs: one agg pass + one projection pass,
      no joins, no shuffles beyond the agg's single-row combine.

    Returns (id_col, bm25 double rounded to 4) for every document.

    The per-term columns bound the query size: each term adds one
    ``withColumn`` + one agg column, so hundreds of terms would degenerate
    into very wide plans and slow analysis. Topic curation uses a handful
    of terms; past BM25_MAX_TERMS this raises instead of silently building
    a pathological plan (split long queries, or pre-reduce them to their
    top discriminative terms)."""
    import math

    if len(query_terms) > BM25_MAX_TERMS:
        raise ValueError(
            f"bm25_scores got {len(query_terms)} query terms; the per-term "
            f"column shape is bounded at {BM25_MAX_TERMS} (wide-plan "
            "degeneracy past that) — use bm25_scores_exploded, whose plan "
            "size is constant in the term count"
        )
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    # consumed twice (corpus-stats scalar agg, final scoring projection):
    # the lazy checkpoint runs the tokenize + per-term tf pass once
    d = docs.select(F.col(id_col), toks.alias("_t")).withColumn(
        "_dl", F.size("_t")
    )
    def _eq(term: str):
        # NB: a `lambda x, t=t:` default-arg binding would make the lambda
        # binary and pyspark would treat it as an (element, index) HOF
        return lambda x: x == F.lit(term)

    for i, t in enumerate(query_terms):
        d = d.withColumn(f"_tf{i}", F.size(F.filter(F.col("_t"), _eq(t))))
    d = d.localCheckpoint(eager=False)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.avg("_dl").alias("avgdl"),
    ] + [
        F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"df{i}")
        for i in range(len(query_terms))
    ]
    stats = d.agg(*aggs).first()  # one row — KB driver metadata
    n = float(stats["n"])
    if n == 0:
        # empty corpus: avg() is NULL (float(None) raised, ADVICE r4)
        from pyspark.sql.types import DoubleType, StructField, StructType

        empty_schema = StructType(
            [docs.schema[id_col], StructField("bm25", DoubleType())]
        )
        return docs.sparkSession.createDataFrame([], empty_schema)
    # all-empty docs give avgdl == 0; floor it so the dl/avgdl length
    # normalization never divides by zero (dl is 0 for every row then,
    # so the floored denominator still scores those docs 0)
    avgdl = float(stats["avgdl"] or 0.0) or 1.0
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        idf = math.log((n - stats[f"df{i}"] + 0.5) / (stats[f"df{i}"] + 0.5) + 1.0)
        tf = F.col(f"_tf{i}")
        score = score + F.lit(idf) * (
            tf * F.lit(k1 + 1.0)
        ) / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.lit(avgdl)))
    return d.select(F.col(id_col), F.round(score, 4).alias("bm25"))


def bm25_scores_exploded(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """bm25_scores for LARGE query-term sets (r4 verdict #4's restructure):
    identical semantics, but the term set never widens the plan — plan size
    is CONSTANT in the number of terms, so hundreds/thousands of anchor
    terms stay analyzable where the per-term-column shape degenerates.

    Shape: tokenize once → explode → filter to the term set (an isin over
    the literal list; the filter discards the non-query tokens BEFORE the
    shuffle) → tf = one map-side-combined count per (doc, term) → per-term
    document frequencies collected (≤ |terms| rows, KBs) and folded with
    the corpus stats into a literal idf MAP → per-doc score is one more
    combined sum, left-joined back so termless docs score 0.0. Three
    shuffles total at any corpus size, all partial-aggregated; no joins
    against anything bigger than the doc list itself.

    Returns (id_col, bm25 double rounded to 4) for every document —
    the same contract as bm25_scores, INCLUDING query-multiset semantics:
    a term repeated in query_terms contributes once per repetition (its
    multiplicity folds into the idf coefficient; mult*x vs repeated
    addition can differ by an ulp at multiplicity >= 4, far below the
    4-dp output rounding)."""
    import math
    from collections import Counter

    mult = Counter(query_terms)
    terms = sorted(mult)
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    # consumed twice (corpus-stats scalar agg, final scoring projection):
    # the lazy checkpoint runs the tokenize + per-term tf pass once
    d = docs.select(F.col(id_col), toks.alias("_t")).withColumn(
        "_dl", F.size("_t")
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n"), F.avg("_dl").alias("avgdl")
    ).first()
    n = float(stats["n"])
    if n == 0:
        from pyspark.sql.types import DoubleType, StructField, StructType

        empty_schema = StructType(
            [docs.schema[id_col], StructField("bm25", DoubleType())]
        )
        return docs.sparkSession.createDataFrame([], empty_schema)
    avgdl = float(stats["avgdl"] or 0.0) or 1.0
    tf = (
        d.select(F.col(id_col), F.col("_dl"), F.explode("_t").alias("_term"))
        .filter(F.col("_term").isin(terms))
        .groupBy(id_col, "_dl", "_term")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    # per-term document frequency: <= |terms| rows — KB driver metadata,
    # the same class as bm25_scores' 1-row stats agg / IVF centroids
    dfreq = {
        r["_term"]: int(r["_n"])
        for r in tf.groupBy("_term").agg(F.count(F.lit(1)).alias("_n")).collect()
    }
    idf = {
        t: math.log((n - dfreq.get(t, 0) + 0.5) / (dfreq.get(t, 0) + 0.5) + 1.0)
        for t in terms
    }
    idf_map = F.create_map(
        *[x for t in terms for x in (F.lit(t), F.lit(idf[t] * mult[t]))]
    )
    # identical double op ORDER to bm25_scores (and the DuckDB oracle):
    # idf * (tf*(k1+1)) / (tf + k1*((1-b) + b*dl/avgdl))
    contrib = (
        idf_map[F.col("_term")]
        * (F.col("_tf") * F.lit(k1 + 1.0))
        / (
            F.col("_tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.lit(avgdl))
        )
    )
    scores = (
        tf.select(F.col(id_col), contrib.alias("_c"))
        .groupBy(id_col)
        .agg(F.sum("_c").alias("_s"))
    )
    return (
        d.select(F.col(id_col))
        .join(scores, id_col, "left")
        .select(
            F.col(id_col),
            F.round(F.coalesce(F.col("_s"), F.lit(0.0)), 4).alias("bm25"),
        )
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate-heavy
    domains, keep all rare high-quality strata): the per-row draw is the
    same md5 threshold, compared against its stratum's fraction."""
    thr = None
    for value, frac in fractions.items():
        cond = F.col(strata_col) == value
        lit = F.lit(int(frac * SAMPLE_MOD))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    default = F.lit(int(default_fraction * SAMPLE_MOD))
    thr = thr.otherwise(default) if thr is not None else default
    return df.filter(sample_hash_col(F.col(key_col), salt) < thr)

def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_token_frac: float = 0.8,
    max_dup_trigram_frac: float = 0.25,
    max_top_bigram_frac: float = 0.18,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): documents
    dominated by repeated fragments (boilerplate, keyword stuffing, decode
    loops) are low-value training data. Per document:

    - ``dup_token_frac``   = 1 - distinct_tokens / n_tokens
    - ``dup_trigram_frac`` = 1 - distinct_trigrams / n_trigrams
    - ``top_bigram_frac``  = tokens covered by the single most frequent
      bigram / n_tokens
    - ``keep``             = all three below their thresholds

    Scale shape: the token/trigram fractions are scan-only array
    expressions (whole-stage codegen, zero shuffles). The top-bigram pass
    is explode -> ONE map-side-combined count per (doc, bigram) -> per-doc
    max -> doc-keyed join back; hot documents cannot skew a partition
    because the bigram count collapses map-side before either shuffle.
    All ratios are int/int doubles, so Spark and the DuckDB oracle agree
    bit-exactly. Docs with fewer than 2 (3) tokens define the bigram
    (trigram) fraction as 0.0."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # consumed twice (scan-side fractions, top-bigram agg): the lazy
    # checkpoint runs the tokenize once
    d = docs.select(F.col(id_col), toks.alias("_t")).withColumn(
        "_n", F.size("_t")
    ).localCheckpoint(eager=False)

    def grams(width: int):
        # the shared zipped-slice shingle builder (one n-gram construction
        # repo-wide; the old local element_at shape was the O(tokens²)
        # form shingles' docstring warns about)
        from mr_crawly_spark.functions.text import shingles_of_tokens

        return shingles_of_tokens(F.col("_t"), width)

    scan = d.select(
        F.col(id_col),
        F.col("_n"),
        (1.0 - F.size(F.array_distinct("_t")) / F.col("_n")).alias("_dtok"),
        F.when(
            F.col("_n") >= 3,
            1.0 - F.size(F.array_distinct(grams(3))) / (F.col("_n") - 2),
        ).otherwise(F.lit(0.0)).alias("_dtri"),
    )
    top_bigram = (
        d.select(F.col(id_col), F.explode(grams(2)).alias("_bg"))
        .groupBy(id_col, "_bg")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_maxbg"))
    )
    out = scan.join(top_bigram, id_col, "left")
    # capped at 1: self-overlapping repeats ("a a a a") count each token in
    # several bigram instances, so raw coverage can exceed the doc length
    top_frac = F.least(
        F.lit(1.0),
        F.coalesce(2.0 * F.col("_maxbg") / F.col("_n"), F.lit(0.0)),
    )
    return out.select(
        F.col(id_col),
        F.col("_n").cast("bigint").alias("n_tokens"),
        F.round("_dtok", 4).alias("dup_token_frac"),
        F.round("_dtri", 4).alias("dup_trigram_frac"),
        F.round(top_frac, 4).alias("top_bigram_frac"),
        (
            (F.col("_dtok") <= max_dup_token_frac)
            & (F.col("_dtri") <= max_dup_trigram_frac)
            & (top_frac <= max_top_bigram_frac)
        ).alias("keep"),
    )


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram language-model score — the cheap perplexity proxy used to
    rank crawl text against its own corpus distribution (CCNet-style,
    Wenzek et al. 2020, with the corpus itself as the LM): per document,
    the mean log-probability of its tokens under the corpus unigram
    distribution. Unusually low scores flag gibberish / rare-token spam;
    unusually high ones flag boilerplate.

    Scale shape: corpus vocabulary counts are ONE explode + map-side-
    combined groupBy (the vocabulary stays distributed — never collected;
    only the scalar total-token count reaches the driver). Per-doc term
    frequencies are a second combined groupBy, joined to the vocabulary on
    the token — a key whose heaviest value (the most common token) is
    already collapsed to one row per doc by the tf aggregation, so the
    join cannot skew. Both join sides derive from the same tf lineage, so
    the unpersisted plan recomputes the explode+groupBy once per side —
    at corpus scale, checkpoint ``docs`` (or the returned frame) the way
    the engine checkpoints its per-round frames rather than caching inside
    this operator. Output: (id_col, n_tokens, avg_logprob)."""
    import math

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    d = docs.select(F.col(id_col), toks.alias("_t")).withColumn(
        "_n", F.size("_t")
    )
    tok = d.select(F.col(id_col), F.col("_n"), F.explode("_t").alias("_w"))
    tf = tok.groupBy(id_col, "_n", "_w").agg(F.count(F.lit(1)).alias("_tf"))
    vocab = tf.groupBy("_w").agg(F.sum("_tf").alias("_cnt"))
    # corpus token total for the literal: sum of per-doc sizes — the same
    # integer as vocab.agg(sum(_cnt)) (explode emits size(_t) rows per doc;
    # null-text docs are null in both: explode skips them, sum ignores
    # nulls) without paying the explode+two-agg pass a second time just to
    # read one scalar
    total = d.agg(F.sum("_n").cast("bigint").alias("t")).first()["t"]
    if not total:
        from pyspark.sql.types import (
            DoubleType, LongType, StructField, StructType,
        )

        return docs.sparkSession.createDataFrame(
            [],
            StructType(
                [
                    docs.schema[id_col],
                    StructField("n_tokens", LongType()),
                    StructField("avg_logprob", DoubleType()),
                ]
            ),
        )
    ln_total = float(math.log(float(total)))
    contrib = F.col("_tf") * (F.log(F.col("_cnt").cast("double")) - F.lit(ln_total))
    return (
        tf.join(vocab, "_w")
        .groupBy(id_col, "_n")
        .agg(F.sum(contrib).alias("_s"))
        .select(
            F.col(id_col),
            F.col("_n").cast("bigint").alias("n_tokens"),
            F.round(F.col("_s") / F.col("_n"), 4).alias("avg_logprob"),
        )
    )


def bigram_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
) -> DataFrame:
    """Bigram-LM perplexity of each document under the corpus's OWN
    add-k-smoothed bigram distribution — the CCNet perplexity-filtering
    stage (Wenzek et al. 2020 §4.3 rank by LM perplexity; they use a
    pretrained KenLM, here the corpus itself is the LM, the same
    self-trained stance as unigram_logprob one level up the n-gram
    ladder). Low ppl = templated/boilerplate text, high ppl = gibberish;
    both tails are what the filter trims.

    P(b|a) = (c(ab) + k) / (c(a·) + k·V) with c(a·) = Σ_b c(ab) (context
    mass from the bigram table itself) and V = corpus unigram vocabulary;
    ppl(doc) = exp(-Σ tf·ln P / n_bigrams). Docs with no bigram (< 2
    tokens) are excluded. Output: (id_col, n_bigrams, ppl), 4dp.

    Scale shape: per-doc bigram tf and the corpus model are two map-side-
    combined aggs over one explode; the context table derives FROM the
    model (groupBy on the first word — no second corpus pass); only two
    scalars (V, total) reach the driver. Joins are on bigram then first-
    word — both already tf-collapsed per doc, so the hottest key is one
    row per doc. Each ln-contribution is decimal(20,6)-quantized, making
    the per-doc sum partition-order invariant (inv_search convention)."""
    from mr_crawly_spark.functions.text import shingles_of_tokens, tokens

    if k <= 0:
        raise ValueError(f"smoothing k must be > 0, got {k}")
    # whitespace-only docs tokenize to [""] — drop them BEFORE the vocab
    # count or the phantom empty token inflates V
    d = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_t")
    )
    bg = d.select(
        F.col(id_col),
        F.explode(shingles_of_tokens(F.col("_t"), 2)).alias("_b"),
    )
    # tf feeds the model agg AND the final join; model feeds ctx AND the
    # final join — lazy checkpoints run the tokenize+shingle+agg lineage
    # once per frame instead of once per consumer
    tf = bg.groupBy(id_col, "_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("_tf")
    ).localCheckpoint(eager=False)
    model = tf.groupBy("_b").agg(
        F.sum("_tf").cast("bigint").alias("_cab")
    ).localCheckpoint(eager=False)
    ctx = model.groupBy(
        F.split(F.col("_b"), " ", 2)[0].alias("_a")
    ).agg(F.sum("_cab").cast("bigint").alias("_ca"))
    v_row = (
        d.select(F.explode("_t").alias("_w")).agg(
            F.count_distinct("_w").alias("v")
        ).first()
    )
    v = int(v_row["v"] or 0)
    if v == 0:
        from pyspark.sql.types import (
            DoubleType, LongType, StructField, StructType,
        )

        return docs.sparkSession.createDataFrame(
            [],
            StructType(
                [
                    docs.schema[id_col],
                    StructField("n_bigrams", LongType()),
                    StructField("ppl", DoubleType()),
                ]
            ),
        )
    ln_p = F.log(
        (F.col("_cab") + F.lit(float(k)))
        / (F.col("_ca") + F.lit(float(k) * v))
    )
    contrib = (F.col("_tf") * ln_p).cast("decimal(20,6)")
    return (
        tf.join(model, "_b")
        .join(ctx, F.split(F.col("_b"), " ", 2)[0] == F.col("_a"))
        .groupBy(id_col)
        .agg(
            F.sum("_tf").cast("bigint").alias("n_bigrams"),
            F.sum(contrib).cast("double").alias("_s"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(
                F.exp(-F.col("_s") / F.col("n_bigrams")), 4
            ).alias("ppl"),
        )
    )


def temperature_mix_weights(
    counts: dict[str, int], alpha: float, target_frac: float
) -> dict[str, float]:
    """Per-stratum keep probabilities for temperature-flattened corpus
    mixing (the multilingual-LM sampling rule, Conneau & Lample 2019:
    q_s ~ p_s^alpha): alpha < 1 upweights rare strata (languages, domains)
    and downweights dominant ones, and target_frac scales the expected
    output to that fraction of the corpus. Probabilities are capped at 1
    (sampling never replicates rows; the cap shifts mass to the remaining
    strata nowhere — document-level upsampling is a separate concern).

    Driver-side by design: the strata table is the MIXING CONFIG
    (languages / top-level domains / source buckets — thousands at most),
    the same KB-sized driver-metadata class as IVF centroids and the BM25
    term stats; the document table itself never leaves the executors."""
    n_total = float(sum(counts.values()))
    if n_total == 0:
        return {}
    powed = {s: (c / n_total) ** alpha for s, c in counts.items()}
    z = sum(powed.values())
    return {
        s: min(1.0, powed[s] / z * target_frac * n_total / counts[s])
        for s in counts
    }


def temperature_mix_sample(
    docs: DataFrame,
    stratum_col: str,
    key_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    salt: str = "mix",
) -> DataFrame:
    """Deterministically sample ``docs`` to a temperature-flattened
    stratum mixture: keep probabilities from temperature_mix_weights, the
    per-row draw the same md5 threshold as deterministic_sample — RNG-free,
    so reruns, resumes, and any partitioning produce the identical sample.
    One map-side-combined count per stratum (KB to the driver, see
    temperature_mix_weights), then a scan-only filter — no extra shuffle
    on the documents."""
    counts = {
        r[stratum_col]: r["c"]
        for r in docs.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    # NULL strata are dropped from the sample: they have no defined mixing
    # weight (and `col == lit(None)` below could never match them — they
    # would silently fall through to the 0 threshold anyway; popping here
    # also keeps them out of n_total and makes sorted() safe)
    counts.pop(None, None)
    q = temperature_mix_weights(counts, alpha, target_frac)
    thr = None
    for s, p in sorted(q.items()):
        # round-to-nearest (not truncation): the oracle recomputes q with
        # its own libm, and int(round()) only disagrees when q*MOD sits
        # within an ulp of x.5 — truncation would flip on ANY ulp drift
        # across an integer boundary
        lit = F.lit(int(round(p * SAMPLE_MOD)))
        cond = F.col(stratum_col) == s
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    if thr is None:
        return docs.filter(F.lit(False))
    return docs.filter(sample_hash_col(F.col(key_col), salt) < thr.otherwise(F.lit(0)))


def domain_token_cap_exact(
    docs: DataFrame,
    budget_tokens: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "cap",
) -> DataFrame:
    """Cap each domain's contribution to the corpus at
    ``budget_tokens``: within a domain, documents are taken greedily in
    deterministic md5 order until the running token total passes the
    budget (the first crossing doc is INCLUDED, so every non-empty domain
    contributes at least one document).

    Output: (id_col, domain_col, n_tokens, kept). The order is an
    md5-shuffle of doc ids (not doc order), so the kept set is an unbiased,
    reproducible, partition-invariant sample of the domain — the standard
    "no single domain dominates the mixture" gate.

    Plan shape: one scan computes n_tokens, ONE shuffle on domain feeds a
    running-sum window. SKEW CAVEAT, load-bearing at 100 TB: the window
    funnels each domain into one task, so a 10^9-doc domain serializes.
    Use this variant when domains are bounded (hosts, shards); for
    heavy-tailed domain distributions use domain_token_cap_sampled — same
    contract in expectation, no window, no skew."""
    from pyspark.sql import Window

    from mr_crawly_spark.functions.text import token_count

    w = (
        Window.partitionBy(domain_col)
        .orderBy(sample_hash_col(F.col(id_col), salt), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = docs.select(
        F.col(id_col),
        F.col(domain_col),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    run = F.sum("n_tokens").over(w)
    # kept iff the PREVIOUS running total (exclusive) is still under budget
    return base.select(
        id_col,
        domain_col,
        "n_tokens",
        ((run - F.col("n_tokens")) < budget_tokens).alias("kept"),
    )


def domain_token_cap_sampled(
    docs: DataFrame,
    budget_tokens: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "cap",
) -> DataFrame:
    """The scale-safe twin of domain_token_cap_exact: instead of a greedy
    running-sum window (which serializes each domain into one task), keep
    each document with probability min(1, budget/domain_tokens) via the
    md5 threshold — the kept set meets the budget IN EXPECTATION, with no
    window and no skew: per-domain token totals are ONE map-side-combined
    aggregation (a few rows per domain — broadcastable for any realistic
    domain count), then one scan-side filter.

    Deterministic, partition-invariant, and monotone in budget (a domain's
    kept set at budget B is a subset of its kept set at B' > B — the same
    md5-threshold property as deterministic_sample)."""
    from mr_crawly_spark.functions.text import token_count

    base = docs.select(
        F.col(id_col),
        F.col(domain_col),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    totals = base.groupBy(domain_col).agg(
        F.sum("n_tokens").alias("_domain_tokens")
    )
    frac = F.least(
        F.lit(1.0), F.lit(float(budget_tokens)) / F.col("_domain_tokens")
    )
    threshold = F.round(frac * SAMPLE_MOD, 0)
    return (
        base.join(F.broadcast(totals), domain_col)
        .select(
            id_col,
            domain_col,
            "n_tokens",
            (
                sample_hash_col(F.col(id_col), salt) < threshold
            ).alias("kept"),
        )
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot-to-snapshot corpus delta — the bookkeeping op an
    incremental curation pipeline runs before reprocessing anything:
    (id_col, status) with status in {'added','removed','changed',
    'unchanged'}, decided by the content fingerprint (functions.text.
    fingerprint: md5 of case-folded whitespace-collapsed text, so
    formatting-only edits count as unchanged).

    One full-outer join on the id — fingerprints are computed scan-side,
    so the join shuffles (id, 32-byte md5) pairs, never text. Downstream:
    re-curate only status != 'unchanged' (at 100 TB the unchanged mass is
    the overwhelming majority, and this is what makes nightly incremental
    runs O(delta) instead of O(corpus))."""
    from mr_crawly_spark.functions.text import fingerprint

    o = old.select(F.col(id_col), fingerprint(F.col(text_col)).alias("_fo"))
    n = new.select(F.col(id_col), fingerprint(F.col(text_col)).alias("_fn"))
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("_fo").isNull(), F.lit("added"))
        .when(F.col("_fn").isNull(), F.lit("removed"))
        .when(F.col("_fo") == F.col("_fn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(id_col, status.alias("status"))


def top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-k most frequent word n-grams — the introspection
    pass behind boilerplate discovery, contamination triage, and stopword
    curation. Output: (ngram, freq, n_docs), frequency-descending with a
    deterministic tiebreak on the ngram string.

    Plan shape at 100 TB: explode -> ONE map-side-combined aggregation
    (hot n-grams collapse per map task before the shuffle) -> global top-k
    via orderBy+limit, which Spark executes as per-partition top-k + a
    k-row merge (TakeOrderedAndProject), never a full sort."""
    from mr_crawly_spark.functions.text import shingles, tokens

    feats = (
        shingles(F.col(text_col), n) if n > 1 else tokens(F.col(text_col))
    )
    exploded = docs.select(F.col(id_col), F.explode(feats).alias("ngram"))
    counted = exploded.groupBy("ngram").agg(
        F.count(F.lit(1)).alias("freq"),
        F.count_distinct(F.col(id_col)).alias("n_docs"),
    )
    return counted.orderBy(
        F.col("freq").desc(), F.col("ngram").asc()
    ).limit(k)


def percentile_ranks(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact percent_rank of every row's ``value_col`` — the
    normalization step before mixing heterogeneous quality signals
    (length, lang-ID confidence, classifier logits score on incompatible
    scales; their percentiles mix): pct = #strictly-smaller / (n-1),
    ties share a rank, 4dp-rounded. Output (id_col, value_col, pct).

    Scale shape: the naive percent_rank() window orders ALL ROWS in one
    partition — a 10^10-row sort funnelled through one task. This
    instead aggregates a VALUE HISTOGRAM first (one map-side-combined
    shuffle; quality signals have bounded domains — lengths, rounded
    scores — so the histogram is tiny relative to the corpus), runs the
    cumulative window over DISTINCT VALUES (O(distinct), not O(rows)),
    and joins ranks back by value (AQE-broadcast for small histograms).
    The length_quantiles rank-straddle trick, applied rowwise."""
    from pyspark.sql import Window

    df = df.filter(F.col(value_col).isNotNull())  # null has no rank
    hist = df.groupBy(F.col(value_col).alias("_v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    w = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = hist.select(
        "_v",
        (F.sum("_c").over(w) - F.col("_c")).alias("_below"),
    )
    totals = df.agg(F.count(F.lit(1)).alias("_n")).first()
    n = int(totals["_n"] or 0)
    if n <= 1:
        return df.select(
            id_col, value_col, F.lit(0.0).alias("pct")
        )
    pct = F.round(F.col("_below") / F.lit(float(n - 1)), 4)
    return (
        df.join(ranked, F.col(value_col) == F.col("_v"))
        .select(id_col, value_col, pct.alias("pct"))
    )


def pmi_collocations(
    docs: DataFrame,
    k: int = 50,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k word collocations by pointwise mutual information — the
    phrase-mining pass behind tokenizer-vocab curation and multi-word
    entity discovery (PMI finds 'new york', raw frequency finds 'of the').

    pmi(a,b) = ln( P(ab) / (P(a) P(b)) ) with P(ab) = c_ab / N_bigrams and
    P(w) = c_w / N_tokens (textbook estimator, Church & Hanks 1990); the
    ``min_count`` floor drops the classic PMI pathology of rare pairs
    scoring highest (two hapaxes that co-occur once have maximal PMI).

    Output: (bigram, freq, pmi) — pmi 4dp-rounded, ordered (pmi desc,
    bigram) via TakeOrderedAndProject.

    Plan shape at 100 TB: two map-side-combined aggs (unigrams, bigrams —
    the bigram table is pre-shrunk by min_count BEFORE any join), then two
    equi-joins keyed on a word each. Hot words (stopwords) fan out on the
    join side, but the left side is the already-thresholded bigram table
    (<< corpus), and AQE's skew-join split handles the residue; the two
    corpus totals fold to driver literals from KB-sized aggs."""
    from mr_crawly_spark.functions.text import shingles_of_tokens, tokens

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    base = docs.filter(F.length(F.trim(F.col(text_col))) > 0)
    toks = base.select(tokens(F.col(text_col)).alias("_w"))
    # vocabulary-sized and consumed three times (totals scalar, ua, ub) —
    # the lazy checkpoint computes the tokenize+explode+agg once instead
    # of once per consumer
    uni = (
        toks.select(F.explode("_w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_w"))
        .localCheckpoint(eager=False)
    )
    big = (
        toks.select(
            F.explode(shingles_of_tokens(F.col("_w"), 2)).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .filter(F.col("freq") >= min_count)
    )
    totals = uni.agg(
        F.sum("c_w").alias("_nt"), F.count(F.lit(1)).alias("_nv")
    ).first()
    n_tokens = int(totals["_nt"] or 0)
    if n_tokens == 0:
        return big.select(
            "bigram", "freq", F.lit(0.0).alias("pmi")
        ).limit(0)
    # size(shingles(_w, 2)) == greatest(size(_w) - 1, 0) exactly (the
    # shifted-slice builder's own length formula) — count bigrams without
    # materializing the shingle strings a second time
    n_bigrams_row = (
        toks.select(
            F.greatest(F.size("_w") - 1, F.lit(0)).alias("_nb")
        )
        .agg(F.sum("_nb").alias("_n"))
        .first()
    )
    n_bigrams = int(n_bigrams_row["_n"] or 0)
    if n_bigrams == 0:
        return big.select(
            "bigram", "freq", F.lit(0.0).alias("pmi")
        ).limit(0)
    w1 = F.split(F.col("bigram"), " ", 2)[0]
    w2 = F.split(F.col("bigram"), " ", 2)[1]
    ua = uni.select(F.col("w").alias("_w1"), F.col("c_w").alias("_ca"))
    ub = uni.select(F.col("w").alias("_w2"), F.col("c_w").alias("_cb"))
    joined = (
        big.withColumn("_w1", w1)
        .withColumn("_w2", w2)
        .join(ua, "_w1")
        .join(ub, "_w2")
    )
    # ln( (c_ab/N_big) / ((c_a/N_tok)(c_b/N_tok)) ): the totals are
    # literals, so this is scan-only after the joins
    pmi = F.round(
        F.log(
            (F.col("freq") / F.lit(float(n_bigrams)))
            / (
                (F.col("_ca") / F.lit(float(n_tokens)))
                * (F.col("_cb") / F.lit(float(n_tokens)))
            )
        ),
        4,
    )
    return (
        joined.select("bigram", "freq", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("bigram"))
        .limit(k)
    )


def tfidf_keywords(
    docs: DataFrame,
    top_j: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-j keywords by tf-idf — the cheap topic descriptor
    a curation pipeline attaches before mixture balancing. Output:
    (id_col, term, tf bigint, tfidf double, rank bigint), rank 1..j per doc,
    deterministic ties (tfidf desc, then term asc).

    idf = ln(N / df) with N from one count; term document-frequencies are
    one map-side-combined agg; the per-doc top-j is a window over (doc) —
    partitioned by DOCUMENT, so no hot-key funnel (every doc has few
    terms; contrast a per-TERM window, which would serialize 'the')."""
    from pyspark.sql import Window

    from mr_crawly_spark.functions.text import tokens

    n_docs = docs.count()
    if n_docs == 0:
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        return docs.sparkSession.createDataFrame(
            [],
            StructType(
                [
                    docs.schema[id_col],
                    StructField("term", StringType()),
                    StructField("tf", LongType()),
                    StructField("tfidf", DoubleType()),
                    StructField("rank", LongType()),
                ]
            ),
        )
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    scored = tf.join(df_, "term").select(
        id_col,
        "term",
        F.col("tf").cast("bigint").alias("tf"),
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("_df")), 4
        ).alias("tfidf"),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_j)
    )


def length_quantiles(
    docs: DataFrame,
    probs: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """EXACT type-7 (quantile_cont) token-count quantiles per group,
    computed the 100-TB-safe way: never serialize a group's values.

    Spark's exact ``percentile()`` aggregate buffers EVERY value of a
    group in one task — a straight OOM at web scale. Token counts are
    small integers, so the full distribution compresses losslessly into a
    histogram: ONE map-side-combined groupBy (post-agg rows = distinct
    lengths per group, thousands at most regardless of corpus size), a
    per-group cumulative window over that tiny histogram, and a
    rank-straddle join per requested probability. Exact to the last
    interpolated digit, validated against DuckDB's independent
    quantile_cont implementation (the oracle does NOT mirror this plan —
    it sorts raw values — so a histogram/rank bug cannot self-confirm).

    Returns (group_col, p, q): the interpolated quantile q of whitespace
    token counts for each probability p, rounded to 4 dp.
    """
    from pyspark.sql import Window

    spark = docs.sparkSession
    hist = (
        docs.groupBy(
            F.col(group_col).alias("_g"),
            F.size(tokens(F.col(text_col))).cast("bigint").alias("_v"),
        )
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn(
            "_cum",
            F.sum("_c").over(Window.partitionBy("_g").orderBy("_v")),
        )
    )
    totals = hist.groupBy("_g").agg(F.max("_cum").alias("_n"))
    probs_df = spark.createDataFrame(
        [(float(p),) for p in probs], "p double"
    )
    pr = (
        totals.crossJoin(F.broadcast(probs_df))
        .withColumn("_pos", F.col("p") * (F.col("_n") - 1))
        .withColumn("_k_lo", F.floor("_pos").cast("bigint"))
        .withColumn(
            "_k_hi", F.least(F.col("_k_lo") + 1, F.col("_n") - 1)
        )
        .withColumn("_frac", F.col("_pos") - F.col("_k_lo"))
    )

    def _value_at(rank_col: str, out: str) -> DataFrame:
        # value at 0-indexed rank k = min histogram value whose cumulative
        # count covers k+1; the non-equi part only scans the group's own
        # (tiny) histogram slice after the equi-join on _g
        return (
            pr.select("_g", "p", rank_col)
            .join(hist.select("_g", "_v", "_cum"), "_g")
            .filter(F.col("_cum") >= F.col(rank_col) + 1)
            .groupBy("_g", "p")
            .agg(F.min("_v").alias(out))
        )

    lo = _value_at("_k_lo", "_v_lo")
    hi = _value_at("_k_hi", "_v_hi")
    return (
        pr.join(lo, ["_g", "p"]).join(hi, ["_g", "p"])
        .select(
            F.col("_g").alias(group_col),
            "p",
            F.round(
                F.col("_v_lo")
                + F.col("_frac") * (F.col("_v_hi") - F.col("_v_lo")),
                4,
            ).alias("q"),
        )
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    A-ES): rank every row by u^(1/w) with u uniform in (0,1] and keep the
    top k — each row's inclusion probability is proportional to its
    weight, in one distributed pass.

    RNG-free like every sampler in this module: u derives from the 60-bit
    md5 prefix of (salt | key), so reruns, resumes, and repartitions draw
    the SAME sample, and a different ``salt`` draws a fresh independent
    one. The rank is rounded to 12 dp before ordering (u is exact integer
    math, but pow() may differ by 1 ulp across engines; 12 dp is far
    below any real rank gap and lets the DuckDB oracle reproduce the
    exact selection), ties break on the key. The top-k runs as
    TakeOrderedAndProject — per-partition heads, no global sort, no
    driver collection beyond k rows.

    Rows with weight <= 0 or null are excluded (A-ES domain). Returns the
    sampled rows with their ``_rank``.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    rk = F.round(F.pow(u, F.lit(1.0) / w), 12)
    return (
        docs.filter(w > 0)
        .withColumn("_rank", rk)
        .orderBy(F.desc("_rank"), F.asc(key_col))
        .limit(int(k))
    )
