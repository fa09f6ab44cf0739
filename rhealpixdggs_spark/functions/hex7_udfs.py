"""Spark column functions for the hex7 (H3-style aperture-7) index.

Encode / center / k_ring are Arrow pandas UDFs over the NumPy kernel;
parent / resolution / face are pure bitwise int64 column expressions
(the cell layout was designed for this — kernel/hex7.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernel import hex7 as H

__all__ = [
    "hex7_encode",
    "hex7_center",
    "hex7_k_ring",
    "hex7_neighbors",
    "hex7_parent",
    "hex7_children",
    "hex7_resolution",
    "hex7_face",
    "hex7_token",
]


def hex7_encode(lon: Column, lat: Column, res: int) -> Column:
    @pandas_udf(T.LongType())
    def _enc(lo: pd.Series, la: pd.Series) -> pd.Series:
        out = H.encode(lo.to_numpy(np.float64), la.to_numpy(np.float64), res)
        # The kernel's -1 null sentinel must not escape to SQL: a -1
        # cell would silently unpack to res=15/face=31 garbage in
        # hex7_parent / groupBy. NULL propagates instead (same contract
        # as sql_api.hex7_encode_fn).
        ser = pd.Series(out, index=lo.index, dtype="Int64")
        ser[ser < 0] = pd.NA
        return ser

    return _enc.asNondeterministic()(lon, lat)


def hex7_center(cell: Column) -> Column:
    """Uniform-resolution batches only (grouped inside the UDF)."""
    ret = T.StructType(
        [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
    )

    @pandas_udf(ret)
    def _ctr(c: pd.Series) -> pd.DataFrame:
        arr = c.to_numpy(np.int64)
        lon = np.full(arr.shape, np.nan)
        lat = np.full(arr.shape, np.nan)
        res = (arr >> H._RES_SHIFT) & 0xF
        for r in np.unique(res):
            m = res == r
            lon[m], lat[m] = H.cell_center(arr[m])
        return pd.DataFrame({"lon": lon, "lat": lat}, index=c.index)

    return _ctr.asNondeterministic()(cell)


def hex7_k_ring(cell: Column, k: int = 1) -> Column:
    @pandas_udf(T.ArrayType(T.LongType()))
    def _kr(c: pd.Series) -> pd.Series:
        arr = c.to_numpy(np.int64)
        res = (arr >> H._RES_SHIFT) & 0xF
        out = np.empty(arr.shape[0], dtype=object)
        for r in np.unique(res):
            m = np.where(res == r)[0]
            rings = H.k_ring(arr[m], k)
            for row, i in enumerate(m):
                out[i] = rings[row].tolist()
        return pd.Series(out, index=c.index)

    return _kr.asNondeterministic()(cell)


def hex7_neighbors(cell: Column) -> Column:
    """Cross-face-correct 6-neighborhood (kernel hex7.neighbors): the
    lattice neighbor on the same face, or the gnomonic re-encode onto
    the adjacent face's lattice when the neighbor center crosses an
    icosahedron edge. Array of 6 ids (duplicates possible near
    vertices — consumers dedupe)."""

    @pandas_udf(T.ArrayType(T.LongType()))
    def _nb(c: pd.Series) -> pd.Series:
        arr = c.to_numpy(np.int64)
        res = (arr >> H._RES_SHIFT) & 0xF
        out = np.empty(arr.shape[0], dtype=object)
        for r in np.unique(res):
            m = np.where(res == r)[0]
            nbs = H.neighbors(arr[m])
            for row, i in enumerate(m):
                out[i] = nbs[row].tolist()
        return pd.Series(out, index=c.index)

    return _nb.asNondeterministic()(cell)


def hex7_parent(cell: Column, parent_res: int) -> Column:
    """Native bitwise parent: set digit slots below parent_res to 7,
    rewrite the res field. No Python."""
    out = cell
    for lvl in range(parent_res + 1, H.MAX_RES + 1):
        out = out.bitwiseOR(F.lit(7 << H._DIG_SHIFT(lvl)).cast("long"))
    res_mask = 0xF << H._RES_SHIFT
    return (
        out.bitwiseAND(F.lit(~res_mask).cast("long"))
        .bitwiseOR(F.lit(parent_res << H._RES_SHIFT).cast("long"))
    )


def hex7_children(cell: Column, res: int) -> Column:
    """Array of the 7 aperture-7 children of a resolution-``res`` cell
    (GBT digit append — EXACT in lattice space, kernel/hex7.py header).
    Pure bitwise int64 column math: clear the level-(res+1) digit slot
    from the 7 filler, write each digit 0-6, bump the res field.
    ``res`` is the PARENT resolution (a Python int — callers iterate
    per-level, as hex7_compact/hex7_uncompact do)."""
    shift = H._DIG_SHIFT(res + 1)
    res_mask = 0xF << H._RES_SHIFT
    base = (
        cell.bitwiseAND(F.lit(~(7 << shift)).cast("long"))
        .bitwiseAND(F.lit(~res_mask).cast("long"))
        .bitwiseOR(F.lit((res + 1) << H._RES_SHIFT).cast("long"))
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(6)),
        lambda d: base.bitwiseOR(F.shiftleft(d.cast("long"), shift)),
    )


def hex7_resolution(cell: Column) -> Column:
    return F.shiftright(cell, H._RES_SHIFT).bitwiseAND(F.lit(0xF))


def hex7_face(cell: Column) -> Column:
    return F.shiftright(cell, H._FACE_SHIFT).bitwiseAND(F.lit(0x1F))


def hex7_token(cell: Column) -> Column:
    # lower(): kernel token() emits '%016x' (lowercase); the column and
    # kernel surfaces must produce comparable tokens.
    return F.lower(F.lpad(F.hex(cell), 16, "0"))
