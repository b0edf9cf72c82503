"""Range (interval-containment) join — point-in-interval matching, the
second time-series operator Spark's DataFrame API lacks a scalable plan
for (the first, most-recent-prior, lives in operators/asof.py).

Spark's own planner turns `l JOIN r ON l.p BETWEEN r.lo AND r.hi` into a
BroadcastNestedLoopJoin (or a cartesian product when neither side fits a
broadcast): every left row is tested against EVERY right interval —
O(|L|·|R|), a non-starter at 100 TB. DuckDB plans a proper IEJoin, which
is why it serves as the independent oracle.

Spark-first plan (the standard bucketized-overlap rewrite, cf. the
published Databricks range-join optimization and GeoSpark-style spatial
binning): pick a bucket width ``w``, explode each right interval into
the integer buckets it touches (`sequence(floor(lo/w), floor(hi/w))` —
constant, data-bounded fan-out), bucket each left point at
`floor(p/w)`, then ONE equi-join on (keys…, bucket) plus the exact
`lo <= p <= hi` residual filter. A (left, right) pair can only meet in
the single bucket containing the point, so the rewrite produces no
duplicates and needs no post-dedup. Cost: one shuffle each side on an
equi-key Catalyst can hash — AQE handles skew like any other equi-join.

Choosing ``w``: fan-out per interval is `span/w + 1`, and bucket
selectivity falls as `w` grows; set ``w`` near the TYPICAL interval
span so most intervals explode into 1–2 buckets. A `max_fanout` guard
(enforced executor-side with `raise_error`, since the driver never sees
the data) catches a mis-set width before it melts the shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lo: str,
    hi: str,
    bucket_width: float,
    on: str | Sequence[str] | None = None,
    max_fanout: int = 4096,
) -> DataFrame:
    """Inner-join left rows to every right interval containing them:
    optional equi-keys ``on`` match AND ``lo <= point <= hi`` (both ends
    inclusive). ``point``/``lo``/``hi`` are numeric — cast timestamps
    with unix_timestamp()/epoch first so bucket arithmetic is exact.

    Returns all left columns plus all right non-key columns; names must
    not collide across sides (rename first — same explicit contract as
    asof_join). Intervals with ``lo > hi`` are empty and drop out
    naturally. An interval spanning more than ``max_fanout`` buckets
    aborts the job executor-side (F.raise_error) — that means
    ``bucket_width`` is mis-sized for the data, not that the join is
    wrong."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    if max_fanout < 1:
        raise ValueError(f"max_fanout must be >= 1, got {max_fanout}")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    rvals = [c for c in right.columns if c not in keys]
    overlap = set(rvals) & {c for c in left.columns if c not in keys}
    if overlap:
        raise ValueError(f"column collision across sides: {sorted(overlap)}")

    w = F.lit(float(bucket_width))
    b_lo = F.floor(F.col(lo).cast("double") / w)
    b_hi = F.floor(F.col(hi).cast("double") / w)
    span = b_hi - b_lo + 1
    guarded_hi = F.when(
        span > max_fanout,
        F.raise_error(
            F.concat(
                F.lit(
                    f"range_join: interval spans more than {max_fanout} "
                    f"buckets at bucket_width={bucket_width} (lo="
                ),
                F.col(lo).cast("string"),
                F.lit(", hi="),
                F.col(hi).cast("string"),
                F.lit("); raise bucket_width or max_fanout"),
            )
        ).cast("bigint"),
    ).otherwise(b_hi)
    r2 = right.filter(
        F.col(lo).isNotNull()
        & F.col(hi).isNotNull()
        & (F.col(lo) <= F.col(hi))
    ).select(
        *right.columns,
        F.explode(F.sequence(b_lo, guarded_hi)).alias("_bucket"),
    )
    l2 = left.filter(F.col(point).isNotNull()).select(
        *left.columns,
        F.floor(F.col(point).cast("double") / w).alias("_bucket"),
    )
    cond = l2["_bucket"] == r2["_bucket"]
    for kcol in keys:
        cond = cond & (l2[kcol] == r2[kcol])
    cond = cond & (r2[lo] <= l2[point]) & (l2[point] <= r2[hi])
    joined = l2.join(r2, cond, "inner")
    out_cols = [l2[c] for c in left.columns] + [r2[c] for c in rvals]
    return joined.select(*out_cols)
