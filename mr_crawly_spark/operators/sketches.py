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
"""

from __future__ import annotations

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
    return (
        df.select(F.col(col), rows)
        .select("row", F.pmod(h, F.lit(w)).alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
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
