"""Tile-table construction: full grids, polygon covers, zones.

Grid generation is the SURVEY section 2.4 plan: cells at resolution k
are exactly the level-order indices [ind(k), ind(k+1)), so
spark.range + the index->suid kernel generates any slice of the grid
embarrassingly parallel — no successor chain, no driver loop.
Polygon covers (polyfill) run driver-side on NumPy — polygon counts
are tiny next to the pages table — and land in a broadcastable
DataFrame."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernel import cells as KC
from ..kernel import regions as KR
from ..kernel.constants import WGS84_003, DggsConfig


def grid(spark: SparkSession, resolution: int, cfg: DggsConfig = WGS84_003,
         partitions: int | None = None) -> DataFrame:
    """All cells at a resolution as (cell_id string, cell_idx long).

    Distributed: spark.range over the level-order index interval
    (cell.py:93-98), suid materialized by the index codec kernel
    (cell.py:89-119) one Arrow batch at a time."""
    lo = cfg.num_cells(0, resolution - 1) if resolution > 0 else 0
    hi = lo + 6 * cfg.N_side ** (2 * resolution)

    @pandas_udf(T.StringType())
    def idx_to_suid(idx: pd.Series) -> pd.Series:
        face, digits = KC.suid_from_level_order_index(
            cfg, idx.to_numpy(dtype=np.int64), resolution
        )
        return pd.Series(KC.suid_strings(face, digits), index=idx.index)

    rng = spark.range(lo, hi, numPartitions=partitions)
    return rng.select(
        idx_to_suid(F.col("id")).alias("cell_id"), F.col("id").alias("cell_idx")
    )


def polyfill_tiles(
    spark: SparkSession,
    polygons: dict[str, list],
    res: int,
    cfg: DggsConfig = WGS84_003,
    plane: bool = False,
    compress: bool = False,
) -> DataFrame:
    """Rasterize named polygons to a tile table
    (tile_id, res, zone). `polygons` maps zone name ->
    [(exterior_ring, holes), ...]."""
    rows = []
    for name, polys in polygons.items():
        for cell in sorted(KR.polyfill(cfg, polys, res, plane=plane, compress=compress)):
            rows.append((cell, len(cell) - 1, name))
    schema = T.StructType(
        [
            T.StructField("tile_id", T.StringType()),
            T.StructField("res", T.IntegerType()),
            T.StructField("zone", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def tile_boundaries(tiles: DataFrame, cfg: DggsConfig = WGS84_003,
                    tile_col: str = "tile_id") -> DataFrame:
    """Attach densified ellipsoidal boundaries (FIXTURES.md tiles
    spec: n=5 per edge) for point-in-polygon fixtures."""
    from ..functions.udfs import _decode_udf  # local import, shares wrapper

    def fn(face, digits):
        b = KC.boundary(cfg, face, digits, n_per_edge=5, plane=False)
        return [
            [{"lon": float(p[0]), "lat": float(p[1])} for p in row] for row in b
        ]

    ring_t = T.ArrayType(
        T.StructType(
            [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
        )
    )
    return tiles.withColumn("boundary", _decode_udf(cfg, fn, ring_t)(F.col(tile_col)))


def compress_cells_df(cells: DataFrame, cell_col: str = "cell_id",
                      cfg: DggsConfig = WGS84_003) -> DataFrame:
    """Distributed compress_order_cells (conversion.py:114-135): replace
    any complete set of N_side^2 siblings by the parent, iteratively to
    fixpoint. Pure groupBy/union per level — no UDF."""
    n_child = cfg.N_side**2
    out = cells.select(F.col(cell_col).alias("cell_id")).distinct()
    # Longest suid bounds the number of iterations.
    max_len = out.agg(F.max(F.length("cell_id"))).collect()[0][0] or 1
    for _ in range(int(max_len) - 1):
        parents = (
            out.where(F.length("cell_id") > 1)
            .groupBy(F.expr("substring(cell_id, 1, length(cell_id)-1)").alias("parent"))
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") == n_child)
            .select(F.col("parent"))
        )
        if parents.isEmpty():
            break
        merged = out.join(
            parents,
            F.expr("substring(cell_id, 1, length(cell_id)-1)") == F.col("parent"),
            "left_anti",
        )
        out = merged.unionByName(parents.select(F.col("parent").alias("cell_id")))
    return out


def linetrace_df(
    lines: DataFrame,
    res: int,
    cfg: DggsConfig = WGS84_003,
    line_col: str = "line",
    plane: bool = False,
) -> DataFrame:
    """Distributed linetrace (dggs.py:1096-1179 walk, parallel across
    lines): `line_col` is array<struct<lon,lat>>; output appends
    (seq, cell_id) rows per input row. Each line's neighbor walk is
    inherently sequential, so parallelism comes from the row axis —
    the right decomposition for millions of small geometries."""

    @pandas_udf(T.ArrayType(T.StringType()))
    def _trace(col: pd.Series) -> pd.Series:
        out = []
        for coords in col:
            if coords is None or len(coords) < 2:
                out.append([])
                continue
            pts = [(float(p["lon"]), float(p["lat"])) for p in coords]
            out.append([str(c) for c in KR.linetrace(cfg, [pts], res, plane=plane)])
        return pd.Series(out, index=col.index, dtype=object)

    traced = lines.withColumn("_cells", _trace.asNondeterministic()(F.col(line_col)))
    return traced.select(
        *[c for c in lines.columns if c != line_col],
        F.posexplode("_cells").alias("seq", "cell_id"),
    )


def region_cover_df(
    spark: SparkSession,
    res: int,
    nw: tuple[float, float],
    se: tuple[float, float],
    cfg: DggsConfig = WGS84_003,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed closed-form planar region cover (the SURVEY section
    2.6 plan): planar res-k cells form a regular lattice over the
    rHEALPix image, so the cover of a planar rect is a 2D spark.range
    cross of the corner cells' row/col spans — no neighbor walking, no
    driver loop. Cell centers outside the image (beyond the polar
    squares) encode to null and are filtered.

    Matches the kernel/reference cells_from_region planar matrix
    (dggs.py:1181-1297 semantics) row-major as (row_i, col_i, cell_id);
    scales to covers of any size (e.g. a whole-planet res-9 cover is
    2.3e9 rows of pure column math + one encode pass)."""
    import math

    from ..functions.udfs import rhp_encode

    w = cfg.cell_width(res)
    x_min, y_max = cfg.R_A * -np.pi, cfg.R_A * (3 * np.pi / 4)
    col0 = math.floor((nw[0] - x_min) / w)
    col1 = math.floor((se[0] - x_min) / w)
    row0 = math.floor((y_max - nw[1]) / w)
    row1 = math.floor((y_max - se[1]) / w)
    ncols = col1 - col0 + 1
    nrows = row1 - row0 + 1
    grid = spark.range(0, nrows * ncols, numPartitions=partitions).select(
        (F.col("id") / ncols).cast("long").alias("row_i"),
        (F.col("id") % ncols).alias("col_i"),
    )
    x = F.lit(x_min) + (F.col("col_i") + col0 + F.lit(0.5)) * F.lit(w)
    y = F.lit(y_max) - (F.col("row_i") + row0 + F.lit(0.5)) * F.lit(w)
    return grid.select(
        "row_i",
        "col_i",
        rhp_encode(x, y, res, cfg, plane=True).alias("cell_id"),
    ).where(F.col("cell_id").isNotNull())
