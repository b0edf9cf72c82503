"""Loader for the driver-provided parquet tables (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Parallelism restore (r06, guide §2.5 "input skew"): the fixture tables
# arrive as ONE parquet file with ONE row group, so a scan — and every
# map operator whole-stage-fused into it (hashing, shingling, explodes,
# partial aggregation: most of each query's CPU) — runs on a single core
# regardless of session width (measured: the cms build stage ran 3 tasks,
# one of which did all 600k rows' work). A parquet row group is the unit
# of split parallelism, so byte-range splitting cannot help; a cheap
# round-robin exchange right after the scan can. Gates keep the rule
# scale-honest rather than local-tuned:
#  - only when the file layout's natural split count (row groups across
#    files) is below the session parallelism — a cluster-sized table with
#    hundreds of row groups is left alone;
#  - only under a byte ceiling (the exchange must be trivially cheap;
#    big inputs have enough natural splits anyway);
#  - only past a row floor (5-row dimension tables would pay scheduling
#    overhead for nothing).
_REPARTITION_BYTE_CEILING = 1 << 30
_REPARTITION_ROW_FLOOR = 500

_layout_cache: dict[str, tuple[int, int, int]] = {}


def _parquet_layout(path: str) -> tuple[int, int, int]:
    """(total_bytes, total_rows, total_row_groups) for a parquet file or
    directory of files, read from footers on the driver (no Spark job)."""
    if path in _layout_cache:
        return _layout_cache[path]
    import pyarrow.parquet as pq

    files = []
    if os.path.isdir(path):
        for dp, _dn, fn in os.walk(path):
            files.extend(
                os.path.join(dp, f) for f in fn if f.endswith(".parquet")
            )
    else:
        files.append(path)
    total_bytes = total_rows = total_groups = 0
    for f in files:
        total_bytes += os.path.getsize(f)
        meta = pq.ParquetFile(f).metadata
        total_rows += meta.num_rows
        total_groups += meta.num_row_groups
    _layout_cache[path] = (total_bytes, total_rows, total_groups)
    return _layout_cache[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    assert name in TABLES, name
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    try:
        total_bytes, total_rows, total_groups = _parquet_layout(path)
    except Exception:
        return df  # unreadable footer: serve the plain scan
    width = spark.sparkContext.defaultParallelism
    if (
        total_groups < width
        and total_bytes < _REPARTITION_BYTE_CEILING
        and total_rows >= _REPARTITION_ROW_FLOOR
    ):
        df = df.repartition(width)
    return df
