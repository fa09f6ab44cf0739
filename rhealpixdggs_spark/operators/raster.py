"""Raster <-> vector tile assignment (north_star: "raster-to-vector
tile assignment"; no counterpart in the reference — engine-level,
SURVEY.md section 2.7).

A raster is modelled as a regular lon/lat pixel grid, generated
distributed from ``spark.range`` (no driver materialization): pixel
centers are pure column arithmetic, so at 100 TB the grid is just an
iterator — Catalyst fuses generation, encode and aggregation into one
stage with no shuffle before the per-cell combine.

raster_to_cells:  pixels -> rHEALPix cells (zonal statistics).
cells_to_raster:  paint a (small, broadcast) cell table onto pixels.

All lon/lat arithmetic is integer-exact ((2k+1) * 2^-m) so an external
SQL oracle computes bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import rhp_encode
from ..kernel.constants import WGS84_003, DggsConfig


def raster_grid(
    spark: SparkSession,
    width: int = 720,
    height: int = 360,
    partitions: int | None = None,
) -> DataFrame:
    """Global pixel grid (pixel_id, row, col, lon, lat, value) with
    pixel size (360/width) degrees; lon/lat are pixel centers.

    value is a deterministic synthetic band ((pixel_id*9973) % 1000)/10
    so tests and oracles agree exactly; real rasters would join their
    band columns on pixel_id."""
    half = 180.0 / width  # half pixel in degrees (exact double for
    # widths like 144/720 whose half-pixel is a dyadic-scaled decimal)
    px = spark.range(0, width * height, numPartitions=partitions).select(
        F.col("id").alias("pixel_id"),
        (F.col("id") / width).cast("long").alias("row"),
        (F.col("id") % width).alias("col"),
    )
    return px.select(
        "pixel_id",
        "row",
        "col",
        (F.lit(-180.0) + (F.col("col") * 2 + 1) * F.lit(half)).alias("lon"),
        (F.lit(90.0) - (F.col("row") * 2 + 1) * F.lit(half)).alias("lat"),
        (((F.col("pixel_id") * 9973) % 1000) / F.lit(10.0)).alias("value"),
    )


def raster_to_cells(
    raster: DataFrame,
    res: int,
    cfg: DggsConfig = WGS84_003,
    value_col: str = "value",
) -> DataFrame:
    """Zonal statistics: encode each pixel center, aggregate the band
    per cell (count / sum / mean). Partial map-side combine keeps the
    shuffle at |cells|, not |pixels|."""
    enc = raster.withColumn(
        "cell_id", rhp_encode(F.col("lon"), F.col("lat"), res, cfg)
    )
    return (
        enc.where(F.col("cell_id").isNotNull())
        .groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).alias("n_pixels"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
            F.round(F.avg(value_col), 6).alias("mean_value"),
        )
    )


def cells_to_raster(
    raster: DataFrame,
    cells: DataFrame,
    res: int,
    cfg: DggsConfig = WGS84_003,
    cell_col: str = "cell_id",
) -> DataFrame:
    """Vector -> raster: paint a cell table onto the pixel grid. The
    cell table is small next to the grid (tiles vs pixels) — broadcast
    equi-join on the pixel's encoded cell id; pixels outside every cell
    are dropped (sparse raster)."""
    enc = raster.withColumn(
        cell_col, rhp_encode(F.col("lon"), F.col("lat"), res, cfg)
    )
    return enc.join(F.broadcast(cells), cell_col)
