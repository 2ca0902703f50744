"""Replicates the driver's correctness gate locally: every ``queries()``
entry runs on Spark and (when an oracle exists) is compared against the
DuckDB ``oracle_sql()`` result — row count, column names, and
order-insensitive values."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 5)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:19]
    return v


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ALL_QUERIES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_vs_oracle(spark, duck, name):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(spark_rows) >= 0          # rows-only check
        return
    res = duck.sql(oracles[name])
    duck_cols = res.columns
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), \
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), \
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    got = _rowset([tuple(r) for r in spark_rows], spark_cols)
    want = _rowset(duck_rows, duck_cols)
    for g, w in zip(got, want):
        assert g == w, f"{name}: first differing row {g} vs {w}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"backend_used", "success", "n_docs", "total_chars"} <= set(
        df.columns)
    assert sum(r.n_docs for r in rows) == 500
