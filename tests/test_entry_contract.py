"""Driver-contract harness: every queries() entry runs; every oracle_sql()
entry matches DuckDB on row count, sorted column names, and sorted values
(the same comparison shape the driver uses for CORRECTNESS_r{N}.json)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style value normalization: fixed decimal text
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


ORACLE = entrymod.oracle_sql()
ALL = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_runs(spark, name):
    df = ALL[name](spark, SF_DIR)
    assert df.count() >= 0  # runs and returns a stable schema
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match(spark, ddb, name):
    df = ALL[name](spark, SF_DIR)
    spark_rows = df.collect()
    spark_cols = df.columns
    res = ddb.sql(ORACLE[name])
    duck_cols = [c for c in res.columns]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    _, s = _canon(spark_cols, [[r[c] for c in spark_cols] for r in spark_rows])
    _, d = _canon(duck_cols, duck_rows)
    mism = [i for i, (a, b) in enumerate(zip(s, d)) if a != b][:5]
    assert s == d, f"{name}: first mismatches {[(s[i], d[i]) for i in mism]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
