"""Spark column API for the S2 cross-index (kernel/s2.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernel import s2


def s2_cell_id(lon: Column, lat: Column, level: int = 30) -> Column:
    """(lon, lat) -> int64 S2 cell id at `level` (vectorized kernel)."""

    @pandas_udf(T.LongType())
    def _enc(lo: pd.Series, la: pd.Series) -> pd.Series:
        ids = s2.cell_id_from_lonlat(
            lo.to_numpy(dtype=np.float64, na_value=np.nan),
            la.to_numpy(dtype=np.float64, na_value=np.nan),
            level,
        )
        out = pd.Series(ids, index=lo.index)
        out[lo.isna() | la.isna()] = None
        return out

    return _enc.asNondeterministic()(lon, lat)


def s2_token(cell_id: Column) -> Column:
    """int64 S2 id -> canonical hex token."""

    @pandas_udf(T.StringType())
    def _tok(ids: pd.Series) -> pd.Series:
        mask = ids.notna()
        out = pd.Series([None] * len(ids), index=ids.index, dtype=object)
        if mask.any():
            out[mask] = s2.token(ids[mask].to_numpy(dtype=np.int64))
        return out

    return _tok.asNondeterministic()(cell_id)


def s2_parent(cell_id: Column, level: int) -> Column:
    """Pure column math: clear bits below the level lsb and set it —
    no UDF (parent = (id & -lsb) | lsb with lsb = 1 << 2*(30-level))."""
    lsb = 1 << (2 * (s2.MAX_LEVEL - level))
    # ~(2*lsb - 1) == -(2*lsb) in two's complement.
    return cell_id.bitwiseAND(F.lit(-(lsb << 1))).bitwiseOR(F.lit(lsb))
