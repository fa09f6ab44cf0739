"""SQL API surface: register the engine's geometry kernels as SQL
functions so the whole engine is usable from `spark.sql(...)` /
spark-sql, not just the DataFrame API.

    from rhealpixdggs_spark.functions.sql_api import register_sql_functions
    register_sql_functions(spark)
    spark.sql("SELECT rhp_encode(lon, lat, 9) AS cell_id FROM pages")

Only the geometry ops need registration (Arrow pandas UDFs with
per-resolution grouping, since the kernels are uniform-resolution).
Hierarchy algebra is deliberately NOT wrapped: in SQL it is plain
`substring(cell_id, 1, r+1)` / `length(cell_id)-1` / `rpad(...)` /
`rlike(...)` — native expressions Catalyst folds into codegen
(SURVEY.md section 2.3)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernel import cells as KC
from ..kernel import hex7 as H7
from ..kernel import s2 as S2
from ..kernel.constants import WGS84_003, DggsConfig

_POINT = T.StructType(
    [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
)


def register_sql_functions(
    spark: SparkSession, cfg: DggsConfig = WGS84_003
) -> None:
    """Idempotent: re-registering replaces the previous functions."""

    @pandas_udf(T.StringType())
    def rhp_encode_sql_fn(lo: pd.Series, la: pd.Series, res: pd.Series) -> pd.Series:
        lon = lo.to_numpy(np.float64, na_value=np.nan)
        lat = la.to_numpy(np.float64, na_value=np.nan)
        r = res.to_numpy(np.float64, na_value=-1).astype(np.int64)
        out = np.empty(lon.shape[0], dtype=object)
        out[:] = None
        for rv in np.unique(r[r >= 0]):
            m = r == rv
            out[m] = KC.encode(cfg, lon[m], lat[m], int(rv), plane=False)
        return pd.Series(out, index=lo.index, dtype=object)

    @pandas_udf(T.LongType())
    def rhp_encode_idx_fn(lo: pd.Series, la: pd.Series, res: pd.Series) -> pd.Series:
        lon = lo.to_numpy(np.float64, na_value=np.nan)
        lat = la.to_numpy(np.float64, na_value=np.nan)
        r = res.to_numpy(np.float64, na_value=-1).astype(np.int64)
        idx = np.full(lon.shape[0], -1, dtype=np.int64)
        for rv in np.unique(r[r >= 0]):
            m = r == rv
            idx[m] = KC.encode_index(cfg, lon[m], lat[m], int(rv), plane=False)
        out = pd.Series(idx, index=lo.index)
        out[idx < 0] = None
        return out

    @pandas_udf(_POINT)
    def rhp_nucleus_fn(cells: pd.Series) -> pd.DataFrame:
        arr = cells.to_numpy(dtype=object)
        lon = np.full(arr.shape[0], np.nan)
        lat = np.full(arr.shape[0], np.nan)
        ok = np.array([isinstance(c, str) and len(c) > 0 for c in arr])
        lens = np.array([len(c) if isinstance(c, str) else 0 for c in arr])
        for L in np.unique(lens[ok]):
            m = ok & (lens == L)
            f, d = KC.parse_suids(arr[m].astype(str))
            lon[m], lat[m] = KC.nucleus(cfg, f, d, plane=False)
        return pd.DataFrame({"lon": lon, "lat": lat}, index=cells.index)

    @pandas_udf(T.LongType())
    def hex7_encode_fn(lo: pd.Series, la: pd.Series, res: pd.Series) -> pd.Series:
        lon = lo.to_numpy(np.float64, na_value=np.nan)
        lat = la.to_numpy(np.float64, na_value=np.nan)
        r = res.to_numpy(np.float64, na_value=-1).astype(np.int64)
        out = np.full(lon.shape[0], -1, dtype=np.int64)
        bad = (r < 0) | ~np.isfinite(lon) | ~np.isfinite(lat)
        for rv in np.unique(r[~bad]):
            m = (r == rv) & ~bad
            out[m] = H7.encode(lon[m], lat[m], int(rv))
        s = pd.Series(out, index=lo.index)
        s[out < 0] = None
        return s

    @pandas_udf(T.LongType())
    def s2_encode_fn(lo: pd.Series, la: pd.Series, lvl: pd.Series) -> pd.Series:
        lon = lo.to_numpy(np.float64, na_value=np.nan)
        lat = la.to_numpy(np.float64, na_value=np.nan)
        r = lvl.to_numpy(np.float64, na_value=-1).astype(np.int64)
        out = np.zeros(lon.shape[0], dtype=np.int64)
        bad = (r < 0) | ~np.isfinite(lon) | ~np.isfinite(lat)
        for rv in np.unique(r[~bad]):
            m = (r == rv) & ~bad
            out[m] = S2.cell_id_from_lonlat(lon[m], lat[m], int(rv))
        s = pd.Series(out, index=lo.index)
        s[bad] = None
        return s

    spark.udf.register("rhp_encode", rhp_encode_sql_fn)
    spark.udf.register("rhp_encode_idx", rhp_encode_idx_fn)
    spark.udf.register("rhp_nucleus", rhp_nucleus_fn)
    spark.udf.register("hex7_encode", hex7_encode_fn)
    spark.udf.register("s2_encode", s2_encode_fn)
