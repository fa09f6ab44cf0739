"""Mimic the driver's correctness gate: run each __spark_entry__
queries() entry on Spark and its oracle_sql() twin on DuckDB at
sf0.01, compare row count, schema width and order-insensitive values."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: round(float(v), 9)
                if hasattr(v, "as_tuple") or isinstance(v, float)
                else v
            )
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    assert out.count() > 0
    assert len(out.schema.fields) == 3


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_against_oracle(spark, duck, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    assert got is not None
    if name not in ORACLES:
        # rows-only contract: must run and return a stable schema.
        assert len(got.columns) >= 1
        return
    exp = duck.sql(ORACLES[name]).df()
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    assert sorted(map(str.lower, got.columns)) == sorted(map(str.lower, exp.columns)), name
    exp.columns = [c for c in exp.columns]
    g = _normalize(got)
    e = _normalize(exp)
    e.columns = g.columns
    pd.testing.assert_frame_equal(g, e, check_dtype=False, atol=1e-9, rtol=0)
