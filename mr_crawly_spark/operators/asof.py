"""As-of (most-recent-prior) join — the standard time-series/attribution
operator Spark's DataFrame API lacks (pandas has merge_asof; DuckDB has
native ASOF JOIN, which serves as the independent oracle).

Spark-first plan: tag both sides, union, and carry the right side's row
forward with ``last(_r, ignorenulls=True)`` over a per-key window ordered
by (timestamp, side). That is ONE shuffle keyed on the join keys and one
linear scan per key — no per-left-row probe, no range explosion, no UDF.
At equal timestamps the right row sorts first (side 0 < 1), giving the
conventional inclusive `l.ts >= r.ts` match. Right rows must be unique
per (key, ts) — with duplicates "the matched row" is ill-defined in any
engine (DuckDB's ASOF picks arbitrarily too); pre-aggregate to enforce it.

Scale: the window partitions by join key, so a pathologically hot key
serializes its own rows into one task (the usual window caveat — if a key
can exceed a task, pre-split by coarse time bucket and as-of join the
bucket boundaries). Everything else is map-side: no driver collection at
any size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """For every left row, attach the right row with the same key and the
    greatest ``right_ts`` <= ``left_ts`` (backward as-of, inclusive).

    Returns all left columns plus the matched right row's non-key columns
    (null when no prior right row exists, or when the match is older than
    ``tolerance_sec``). Left/right non-key column names must not collide —
    rename before joining (same contract as pandas merge_asof suffixes,
    made explicit)."""
    keys = [on] if isinstance(on, str) else list(on)
    rvals = [c for c in right.columns if c not in keys]
    if not rvals:
        raise ValueError(
            "right side has no non-key columns to carry; include at least "
            f"the timestamp column (right_ts={right_ts!r})"
        )
    overlap = set(rvals) & {c for c in left.columns if c not in keys}
    if overlap:
        raise ValueError(f"column collision across sides: {sorted(overlap)}")
    r2 = right.select(
        *keys,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in rvals]).alias("_r"),
    )
    l2 = left.select(
        *keys,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(dict(r2.dtypes)["_r"]).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r2 = r2.withColumn("_l", F.lit(None).cast(dict(l2.dtypes)["_l"]))
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "_m", F.last("_r", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    if tolerance_sec is not None:
        fresh = (
            F.col("_ats").cast("double")
            - F.col(f"_m.{right_ts}").cast("double")
        ) <= float(tolerance_sec)
        matched = matched.withColumn(
            "_m", F.when(fresh, F.col("_m")).otherwise(F.lit(None))
        )
    return matched.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(c) for c in rvals],
    )
