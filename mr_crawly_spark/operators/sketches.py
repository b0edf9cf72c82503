"""Distributed sketches. HyperLogLog (Flajolet et al. 2007) distinct
counting over the md5-prefix hash the whole repo shares with its DuckDB
oracles, split into the two pieces that matter at 100 TB:

- :func:`hll_registers` — the heavy pass: hash, bucket on the low ``b``
  bits, take the per-bucket max leading-zero rank. ONE map-side-combined
  shuffle whose post-agg size is <= 2^b rows (16 KB of longs at b=12)
  REGARDLESS of input size. Registers are max-mergeable: union register
  tables from any number of shards / days / streams and re-max — the
  associativity that makes the sketch incremental and resumable.
- :func:`hll_estimate` — the cheap pass: alpha_m * m^2 / sum(2^-M_j) with
  Flajolet's small-range linear-counting correction (E <= 2.5m and empty
  registers present -> m * ln(m/V)). Empty registers contribute 2^0 = 1
  to the denominator and are counted arithmetically from m - n_present —
  the register table never needs densifying.

Determinism: the rank uses the BINARY-STRING length of the remaining
hash bits (conv/bin), not floor(log2(...)) — integer-exact in both
engines, no float-boundary risk. The hash is 60 bits (md5 prefix), so
the large-range collision correction is irrelevant below ~10^17 items.

Standard error is 1.04/sqrt(m): b=12 -> ~1.6%. For exact counts use
countDistinct; this is the fixed-memory path.

Also here:

- KMV / k-minimum-values (Bar-Yossef et al. RANDOM'02; Beyer et al.
  SIGMOD'07) — the DISTINCT sketch that, unlike HLL, supports set
  INTERSECTION and Jaccard between corpora (the theta-sketch idea,
  Dasgupta et al.). The sketch is the k smallest distinct 60-bit
  hashes: one map-side-combined distinct + a TakeOrderedAndProject
  (per-partition heads, never a global sort), <= k rows at any input
  size. Merging shards = union + re-take-k-smallest, bit-identical to
  one pass.
- DDSketch (Masson, Rim & Lee, VLDB'19) — the MERGEABLE quantile
  sketch with a RELATIVE-error guarantee: bucket = ceil(ln(x)/ln(gamma))
  with gamma = (1+alpha)/(1-alpha), so any quantile estimate is within
  alpha of the true value multiplicatively. Build = ONE map-side-
  combined agg bounded at O(log_gamma(max/min)) rows at any input size;
  buckets are SUM-mergeable across shards/days/streams (exact long
  counts -> merge is bit-identical to one pass). The exact complement
  lives in curation.length_quantiles; this is the fixed-memory /
  incremental path.

Cross-engine determinism for the new sketches: KMV is pure integer
(hash order ties are impossible across DISTINCT hashes); DDSketch
rounds ln(x)/ln(gamma) to 9 dp before ceil() so a last-ulp libm
difference between the JVM and DuckDB cannot flip a bucket boundary,
and rounds the reported estimate to 6 dp.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash60(col: Column) -> Column:
    """The repo-standard 60-bit md5-prefix hash (DuckDB twin:
    ('0x' || substr(md5(x), 1, 15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hll_registers(
    df: DataFrame, col: str, b: int = 12
) -> DataFrame:
    """(bucket, rho) register table for the values of ``col``: bucket =
    low ``b`` hash bits, rho = max over the bucket of (leading zeros of
    the remaining 60-b bits) + 1. Merge shards with unionByName ->
    groupBy(bucket).max(rho)."""
    if not 4 <= b <= 28:
        raise ValueError(f"b must be in [4, 28], got {b}")
    m = 1 << b
    w = 60 - b
    h = _hash60(F.col(col))
    rest = F.shiftright(h, b)
    rho = F.when(rest == 0, F.lit(w + 1)).otherwise(
        F.lit(w) - F.length(F.conv(rest.cast("string"), 10, 2)) + 1
    )
    return (
        df.select(
            h.bitwiseAND(F.lit(m - 1)).alias("bucket"), rho.alias("_rho")
        )
        .groupBy("bucket")
        .agg(F.max("_rho").cast("int").alias("rho"))
    )


def hll_estimate(registers: DataFrame, b: int = 12) -> DataFrame:
    """Collapse a register table into one row:
    (m, v_empty, est) — est rounded to 4 dp."""
    m = 1 << b
    agg = registers.agg(
        F.count(F.lit(1)).alias("_p"),
        # coalesce: an EMPTY register table (no input seen yet) sums to
        # null — the estimate must be 0 (linear counting with V = m),
        # not null
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("rho"))), F.lit(0.0)
        ).alias("_s"),
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    raw = alpha * m * m / (F.col("_s") + (F.lit(m) - F.col("_p")))
    v = (F.lit(m) - F.col("_p")).cast("bigint")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    est = F.when((raw <= 2.5 * m) & (v > 0), linear).otherwise(raw)
    return agg.select(
        F.lit(m).cast("bigint").alias("m"),
        v.alias("v_empty"),
        F.round(est, 4).alias("est"),
    )


def hll_distinct(df: DataFrame, col: str, b: int = 12) -> DataFrame:
    """Convenience: registers + estimate in one call."""
    return hll_estimate(hll_registers(df, col, b), b)


def cms_tables(
    df: DataFrame,
    col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) build pass: ``d``
    independent hash rows x ``w`` buckets. ONE explode-by-d (constant
    fan-out) + ONE map-side-combined agg whose post-agg size is <= d*w
    rows at any input size. Tables are SUM-mergeable: union shard tables
    and re-sum — bit-identical to one pass (counts are exact longs), so
    the sketch is incremental across shards/days/streams like
    :func:`hll_registers`.

    Row hashes are the repo-standard 60-bit md5 prefix of ``i || '|' ||
    value`` — independent per row, replayable in DuckDB."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 and w >= 2, got d={d}, w={w}")
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(d)])
    ).alias("row")
    h = _hash60(
        F.concat_ws("|", F.col("row").cast("string"), F.col(col))
    )
    # two-level build: aggregate per VALUE first (map-side combinable, the
    # same shuffle bound the probe side's distinct already pays), then
    # hash each distinct value d times and SUM the counts per (row,
    # bucket). Identical table — sum over value groups — but the d md5
    # evaluations are paid per distinct value, not per raw row (30x fewer
    # on the bench's partkey stream).
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("_c"))
    return (
        counts.select(F.col(col), F.col("_c"), rows)
        .select("row", F.pmod(h, F.lit(w)).alias("bucket"), "_c")
        .groupBy("row", "bucket")
        .agg(F.sum("_c").alias("cnt"))
    )


def cms_query(
    tables: DataFrame,
    items: DataFrame,
    col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Point-frequency estimates: for each item, min over the d rows of
    its bucket's count (missing bucket = 0). Never underestimates; the
    overestimate is bounded by e*N/w with probability 1 - e^-d. The probe
    is a broadcast-sized equi-join on (row, bucket) — at scale the d*w
    table is KBs, so Catalyst broadcasts it and the probe is map-side."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("row")
    h = _hash60(F.concat_ws("|", F.col("row").cast("string"), F.col(col)))
    probes = items.select(F.col(col), rows).select(
        col, "row", F.pmod(h, F.lit(w)).alias("bucket")
    )
    return (
        probes.join(tables, ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# --------------------------------------------------------------------------
# KMV / k-minimum-values distinct sketch (intersectable, unlike HLL)
# --------------------------------------------------------------------------

_HASH_SPACE = float(1 << 60)


def kmv_sketch(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """The k smallest DISTINCT 60-bit hashes of ``col`` — one column
    ``h``, <= k rows at any input size. Plan: map-side-combined
    distinct (one shuffle) + TakeOrderedAndProject (per-partition
    heads; the global sort never materializes). Merge shards with
    :func:`kmv_merge` — bit-identical to sketching the unioned input."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return (
        df.select(_hash60(F.col(col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(sketches: list[DataFrame], k: int = 256) -> DataFrame:
    """Union shard sketches and re-take the k smallest distinct hashes.
    Associative and idempotent: equals :func:`kmv_sketch` over the
    concatenated raw inputs, bit for bit."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """One row (n_kept, est): if the sketch holds fewer than k hashes
    the count was exact (est = n_kept); otherwise the Bar-Yossef
    unbiased estimator DV = (k-1) / U_k with U_k = (k-th smallest hash
    + 1) / 2^60. Rounded to 4 dp like :func:`hll_estimate`."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("_hk"),
    )
    uk = (F.col("_hk").cast("double") + F.lit(1.0)) / F.lit(_HASH_SPACE)
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) / uk)
    return agg.select(
        F.col("n_kept").cast("bigint").alias("n_kept"),
        F.round(est, 4).alias("est"),
    )


def kmv_set_stats(
    sk_a: DataFrame, sk_b: DataFrame, k: int = 256
) -> DataFrame:
    """Jaccard / intersection / union estimates from two KMV sketches —
    the operation HLL registers cannot do. Theta-sketch rule (Beyer et
    al. SIGMOD'07 §5): form the combined sketch X = k smallest distinct
    hashes of (A ∪ B); with K = |X|,

        jaccard = |{h in X : h in A AND h in B}| / K
        union_est = K if K < k else (k-1)/U_k   (exact when both small)
        inter_est = jaccard * union_est

    Everything is integer until the two final divisions (4-dp rounded);
    both sketch tables are <= k rows so the whole computation is a
    KB-sized join no matter how large the sketched corpora were."""
    a = sk_a.select("h", F.lit(1).alias("_a"))
    b = sk_b.select("h", F.lit(1).alias("_b"))
    both = (
        a.unionByName(b.withColumnRenamed("_a", "_b"), allowMissingColumns=True)
        .groupBy("h")
        .agg(F.max("_a").alias("_a"), F.max("_b").alias("_b"))
        .orderBy("h")
        .limit(k)
    )
    agg = both.agg(
        F.count(F.lit(1)).alias("_kk"),
        F.max("h").alias("_hk"),
        F.sum(
            F.when((F.col("_a") == 1) & (F.col("_b") == 1), 1).otherwise(0)
        ).alias("_m"),
    )
    uk = (F.col("_hk").cast("double") + F.lit(1.0)) / F.lit(_HASH_SPACE)
    union_est = F.when(
        F.col("_kk") < k, F.col("_kk").cast("double")
    ).otherwise(F.lit(float(k - 1)) / uk)
    jac = F.when(F.col("_kk") == 0, F.lit(0.0)).otherwise(
        F.col("_m").cast("double") / F.col("_kk").cast("double")
    )
    return agg.select(
        F.col("_kk").cast("bigint").alias("k_eff"),
        F.col("_m").cast("bigint").alias("n_common"),
        F.round(jac, 4).alias("jaccard_est"),
        F.round(jac * union_est, 4).alias("inter_est"),
        F.round(union_est, 4).alias("union_est"),
    )


# --------------------------------------------------------------------------
# DDSketch — mergeable relative-error quantiles
# --------------------------------------------------------------------------


def _dd_gamma(alpha: float) -> float:
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    return (1.0 + alpha) / (1.0 - alpha)


def dd_sketch(df: DataFrame, col: str, alpha: float = 0.01) -> DataFrame:
    """(bucket, cnt) DDSketch table over the POSITIVE values of ``col``:
    bucket = ceil(round(ln(x)/ln(gamma), 9)). ONE map-side-combined agg
    whose post-agg size is O(log_gamma(max/min)) rows — a few hundred at
    alpha=0.01 over any real length distribution — regardless of input
    size. Non-positive values are excluded by contract (the sketch is
    defined on x > 0; callers sketching signed data shift first).
    Merge shard tables with unionByName -> groupBy(bucket).sum(cnt):
    exact long counts, so the merge is bit-identical to one pass."""
    gamma = _dd_gamma(alpha)
    x = F.col(col).cast("double")
    bucket = F.ceil(F.round(F.log(x) / F.lit(float(math.log(gamma))), 9))
    return (
        df.filter(x > 0)
        .select(bucket.cast("bigint").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dd_merge(tables: list[DataFrame]) -> DataFrame:
    """Sum-merge shard sketch tables (associative, exact)."""
    if not tables:
        raise ValueError("need at least one sketch table")
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def dd_quantiles(
    sketch: DataFrame, probs: list[float], alpha: float = 0.01
) -> DataFrame:
    """(p, est) for each probability: rank r = max(1, ceil(p * n)), est
    = the gamma-midpoint 2*gamma^i/(gamma+1) of the first bucket whose
    cumulative count reaches r — guaranteed within a factor (1 ± alpha)
    of the true quantile (Masson et al. VLDB'19 Thm 1). The sketch
    table is tiny, so the cumulative window and the rank-straddle join
    are KB-sized regardless of the sketched corpus."""
    from pyspark.sql import Window

    gamma = _dd_gamma(alpha)
    if not probs:
        raise ValueError("need at least one probability")
    for p in probs:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"probability out of [0,1]: {p}")
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bucket", "cnt", F.sum("cnt").over(w).alias("_cum")
    )
    n = sketch.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("_n"))
    pr = n.select(
        F.explode(F.array(*[F.lit(float(p)) for p in probs])).alias("p"),
        "_n",
    ).select(
        "p",
        "_n",
        F.greatest(F.lit(1), F.ceil(F.col("p") * F.col("_n"))).alias("_r"),
    )
    hit = (
        pr.join(cum, cum["_cum"] >= pr["_r"], "left")
        .groupBy("p", "_n")
        .agg(F.min("bucket").alias("_i"))
    )
    est = F.round(
        F.lit(2.0)
        * F.pow(F.lit(float(gamma)), F.col("_i").cast("double"))
        / F.lit(float(gamma) + 1.0),
        6,
    )
    return hit.select(
        "p",
        F.col("_n").cast("bigint").alias("n"),
        F.when(F.col("_n") == 0, F.lit(None).cast("double"))
        .otherwise(est)
        .alias("est"),
    ).orderBy("p")


# --------------------------------------------------------------------------
# Per-group HLL — approximate distinct counts BY KEY in one pass
# --------------------------------------------------------------------------


def hll_registers_by(
    df: DataFrame, keys: list[str], col: str, b: int = 12
) -> DataFrame:
    """(keys…, bucket, rho) register table — the grouped twin of
    :func:`hll_registers` for "distinct X per Y" at scale (distinct
    URLs per host, distinct users per day) where exact countDistinct
    per group would shuffle every raw value. ONE map-side-combined agg
    bounded at n_groups * 2^b rows; merge shards with unionByName ->
    groupBy(keys, bucket).max(rho), bit-identical to one pass."""
    if not keys:
        raise ValueError("keys must be non-empty; use hll_registers")
    if not 4 <= b <= 28:
        raise ValueError(f"b must be in [4, 28], got {b}")
    m = 1 << b
    w = 60 - b
    h = _hash60(F.col(col))
    rest = F.shiftright(h, b)
    rho = F.when(rest == 0, F.lit(w + 1)).otherwise(
        F.lit(w) - F.length(F.conv(rest.cast("string"), 10, 2)) + 1
    )
    return (
        df.select(
            *keys,
            h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
            rho.alias("_rho"),
        )
        .groupBy(*keys, "bucket")
        .agg(F.max("_rho").cast("int").alias("rho"))
    )


def hll_estimate_by(
    registers: DataFrame, keys: list[str], b: int = 12
) -> DataFrame:
    """(keys…, est) — :func:`hll_estimate` applied per group: one more
    map-side-combined agg over the register table (already tiny), the
    same alpha_m * m^2 / sum(2^-rho) estimator and linear-counting
    small-range branch, 4-dp rounded."""
    m = 1 << b
    agg = registers.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_p"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s"),
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    raw = alpha * m * m / (F.col("_s") + (F.lit(m) - F.col("_p")))
    v = (F.lit(m) - F.col("_p")).cast("bigint")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    est = F.when((raw <= 2.5 * m) & (v > 0), linear).otherwise(raw)
    return agg.select(*keys, F.round(est, 4).alias("est"))


def hll_distinct_by(
    df: DataFrame, keys: list[str], col: str, b: int = 12
) -> DataFrame:
    """Convenience: grouped registers + grouped estimate in one call."""
    return hll_estimate_by(hll_registers_by(df, keys, col, b), keys, b)


def dd_sketch_by(
    df: DataFrame, keys: list[str], col: str, alpha: float = 0.01
) -> DataFrame:
    """(keys…, bucket, cnt) — the grouped twin of :func:`dd_sketch` for
    "quantiles of X per Y" (token counts per source / latencies per
    host) with the same relative-error and sum-mergeability contracts;
    ONE map-side-combined agg bounded at n_groups * O(log_gamma(max/min))
    rows. Merge shards with unionByName -> groupBy(keys, bucket).sum."""
    if not keys:
        raise ValueError("keys must be non-empty; use dd_sketch")
    gamma = _dd_gamma(alpha)
    x = F.col(col).cast("double")
    bucket = F.ceil(F.round(F.log(x) / F.lit(float(math.log(gamma))), 9))
    return (
        df.filter(x > 0)
        .select(*keys, bucket.cast("bigint").alias("bucket"))
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dd_quantiles_by(
    sketch: DataFrame,
    keys: list[str],
    probs: list[float],
    alpha: float = 0.01,
) -> DataFrame:
    """(keys…, p, est) — :func:`dd_quantiles` per group: the cumulative
    window partitions by the keys, the rank-straddle join adds the keys
    as equi-conditions. Still KB-sized per group at any corpus size."""
    from pyspark.sql import Window

    gamma = _dd_gamma(alpha)
    if not keys:
        raise ValueError("keys must be non-empty; use dd_quantiles")
    if not probs:
        raise ValueError("need at least one probability")
    for p in probs:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"probability out of [0,1]: {p}")
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # rename the cum side's columns: both sides derive from `sketch`, and
    # distinct names sidestep the ambiguous-self-join analyzer trap
    cum = sketch.select(
        *[F.col(k).alias(f"_c_{k}") for k in keys],
        F.col("bucket").alias("_cbucket"),
        F.sum("cnt").over(w).alias("_cum"),
    )
    n = sketch.groupBy(*keys).agg(F.sum("cnt").alias("_n"))
    pr = n.select(
        *keys,
        F.explode(F.array(*[F.lit(float(p)) for p in probs])).alias("p"),
        "_n",
    ).select(
        *keys,
        "p",
        "_n",
        F.greatest(F.lit(1), F.ceil(F.col("p") * F.col("_n"))).alias("_r"),
    )
    cond = F.col("_cum") >= F.col("_r")
    for kcol in keys:
        cond = cond & (F.col(f"_c_{kcol}") == F.col(kcol))
    hit = (
        pr.join(cum, cond, "left")
        .groupBy(*keys, "p", "_n")
        .agg(F.min("_cbucket").alias("_i"))
    )
    est = F.round(
        F.lit(2.0)
        * F.pow(F.lit(float(gamma)), F.col("_i").cast("double"))
        / F.lit(float(gamma) + 1.0),
        6,
    )
    return hit.select(
        *keys,
        "p",
        F.col("_n").cast("bigint").alias("n"),
        est.alias("est"),
    )
