"""End-to-end pages pipeline: extract -> encode -> spatial join ->
aggregate, with lineage metrics and snapshot checkpointing.

This is the north-star job shape (BASELINE.json): batch-encode page
geotags into rHEALPix cells at the index resolution, roll up /
containment-join against coarse tiles (broadcast), aggregate per tile
with explicit skew handling, resumable via snapshot manifests."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.udfs import rhp_encode
from .kernel.constants import WGS84_003, DggsConfig
from .operators.joins import cell_agg, containment_join
from .operators.tiling import grid
from .sources.pages import extract_geotags


def encode_pages(
    pages: DataFrame, resolution: int = 9, cfg: DggsConfig = WGS84_003
) -> DataFrame:
    """pages -> (url, warc_ts, text, lang, lon, lat, cell_id).

    Column-pruned: the binary html column is read only by the
    extraction projection and dropped before the shuffle; `text`
    passes through byte-identical."""
    tagged = extract_geotags(pages)
    # Null-filter BEFORE the UDF: filtering on the UDF output would
    # make Catalyst instantiate a second ArrowEvalPython for the
    # filter and re-run the encode per consumer. Filter on lon only —
    # lat and lon are extracted from the same meta tag, so they are
    # null together — keeping the inlined extraction to one evaluation
    # in the filter; a lat-only null would just encode to null.
    return tagged.where(F.col("lon").isNotNull()).withColumn(
        "cell_id", rhp_encode(F.col("lon"), F.col("lat"), resolution, cfg)
    )


def pages_per_tile(
    pages: DataFrame,
    resolution: int = 9,
    tile_res: int = 2,
    cfg: DggsConfig = WGS84_003,
    n_salt: int = 0,
) -> DataFrame:
    """Per-coarse-tile page count + distinct-language count.

    Hierarchy containment is the substring rollup (no join needed when
    tiles are the full grid); with n_salt > 0 the count aggregation is
    two-phase salted for hot urban cells."""
    # encode_pages already filtered null geotags; geodetic encode is
    # total, so no UDF-output filter (it would re-instantiate the UDF).
    enc = encode_pages(pages, resolution, cfg)
    keyed = enc.withColumn("tile_id", F.substring("cell_id", 1, tile_res + 1))
    if n_salt > 0:
        counts = cell_agg(
            keyed.select("tile_id"), "tile_id", {"n_pages": F.count(F.lit(1))}, n_salt
        )
        langs = keyed.groupBy("tile_id").agg(
            F.approx_count_distinct("lang").alias("n_langs")
        )
        return counts.join(langs, "tile_id")
    return keyed.groupBy("tile_id").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.approx_count_distinct("lang").alias("n_langs"),
    )


def pages_tile_join(
    pages: DataFrame,
    tiles: DataFrame,
    resolution: int = 9,
    cfg: DggsConfig = WGS84_003,
) -> DataFrame:
    """Containment join of encoded pages against an explicit
    (possibly mixed-resolution) tile table; coarse tiles broadcast."""
    enc = encode_pages(pages, resolution, cfg)
    return containment_join(enc, tiles)


def points_grid_rollup(
    spark: SparkSession,
    points: DataFrame,
    resolution: int = 9,
    tile_res: int = 2,
    cfg: DggsConfig = WGS84_003,
) -> DataFrame:
    """full_grid_rollup starting from an already-extracted points table
    (pid, lon, lat, lang) — the engine-stage job used by the scaling
    protocol (scan + encode + rollup + broadcast grid join, no html
    decode).

    Scale path: the encode UDF emits the packed int64 level-order key
    (8 bytes through Arrow and the shuffle instead of a suid string);
    the hierarchy rollup is integer division; the tile suid string only
    materializes on the 486-row tile side."""
    from .functions.udfs import rhp_encode_index, rhp_index_parent

    enc = points.withColumn(
        "cell_idx", rhp_encode_index(F.col("lon"), F.col("lat"), resolution, cfg)
    )
    counts = enc.groupBy(
        rhp_index_parent(F.col("cell_idx"), resolution, tile_res, cfg).alias("tile_idx")
    ).agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.approx_count_distinct("lang").alias("n_langs"),
    )
    tiles = (
        grid(spark, tile_res, cfg)
        .withColumnRenamed("cell_id", "tile_id")
        .withColumnRenamed("cell_idx", "tile_idx")
    )
    return (
        tiles.join(counts, "tile_idx", "left")
        .fillna({"n_pages": 0, "n_langs": 0})
        .select("tile_id", "tile_idx", "n_pages", "n_langs")
    )


def full_grid_rollup(
    spark: SparkSession,
    pages: DataFrame,
    resolution: int = 9,
    tile_res: int = 1,
    cfg: DggsConfig = WGS84_003,
) -> DataFrame:
    """Left join of the complete tile grid against page counts —
    includes empty tiles (grid generated distributed via spark.range)."""
    tiles = grid(spark, tile_res, cfg).withColumnRenamed("cell_id", "tile_id")
    counts = pages_per_tile(pages, resolution, tile_res, cfg)
    return tiles.join(counts, "tile_id", "left").fillna(
        {"n_pages": 0, "n_langs": 0}
    )
