#!/usr/bin/env python
"""Zero-tolerance oracle audit (the README claim): every oracle-backed
contract query compared against its DuckDB oracle at sf0.01 with
column-sorted frames, atol=0 (bit-for-bit float equality) and the sign
of zero checked. Stricter than the driver gate and the local pytest
gate (both round floats to 9 decimals before hashing).

Usage: python tools/zero_tolerance_audit.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import struct
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _key(v):
    """Sort/compare key that distinguishes -0.0 from 0.0 and NaNs."""
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", b"nan")
        return ("f", struct.pack(">d", v))
    return (type(v).__name__, str(v))


def _frame_key(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    rows = [tuple(_key(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def main() -> None:
    from rhealpixdggs_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    spark = get_spark(app_name="audit", master="local[8]")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = []
    for name, sql in oracles.items():
        sdf = queries[name](spark, SF_DIR).toPandas()
        odf = con.sql(sql).df()
        ok = (
            len(sdf) == len(odf)
            and sorted(sdf.columns) == sorted(odf.columns)
            and _frame_key(sdf) == _frame_key(odf)
        )
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(sdf)} rows)")
        if not ok:
            bad.append(name)
    spark.stop()
    print(f"\n{len(oracles) - len(bad)}/{len(oracles)} bit-exact; mismatches: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
