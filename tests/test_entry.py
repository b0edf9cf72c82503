"""Local mirror of the driver's correctness gate: every queries() entry with
an oracle_sql() twin runs on Spark AND DuckDB at sf0.001 and must match on
row count + sorted-values (float-tolerant). Rows-only entries must return a
stable, non-degenerate result."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()
SQL_CHECKED = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 4)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    import decimal

    if isinstance(v, decimal.Decimal):
        return round(float(v), 4)
    return v


def _rows(colnames, records):
    """Order-insensitive multiset of column-name-sorted, normalized rows
    (Counter instead of sort: rows may contain None alongside ints/strs,
    which python3 refuses to order)."""
    from collections import Counter

    idx = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(_norm(rec[i]) for i in idx) for rec in records)


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_duckdb(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = _rows(s_cols, [tuple(r) for r in sdf.collect()])

    res = ddb.execute(ORACLES[name])
    d_cols = [d[0] for d in res.description]
    d_rows = _rows(d_cols, res.fetchall())

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert sum(s_rows.values()) == sum(d_rows.values()), (
        f"{name}: row count {sum(s_rows.values())} vs duckdb {sum(d_rows.values())}"
    )
    if s_rows != d_rows:
        only_s = list((s_rows - d_rows).keys())[:3]
        only_d = list((d_rows - s_rows).keys())[:3]
        raise AssertionError(f"{name}: spark-only {only_s} duckdb-only {only_d}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert len(df.columns) > 0
    assert df.count() > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "n_tokens", "quality", "pred_lang"}
