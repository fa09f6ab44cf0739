"""Structured Streaming: per-cell tumbling-window page counts.

The reference has no streaming surface (SURVEY.md section 2.7); this is
the engine-level operator for continuously arriving pages: watermark on
warc_ts for bounded state, tumbling window + cell aggregation. The
transformation is source-agnostic — tests drive it with a file source
and Trigger.AvailableNow; production would use Kafka/warc feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import rhp_encode
from ..kernel.constants import WGS84_003, DggsConfig
from ..sources.pages import extract_geotags


def streaming_cell_counts(
    pages_stream: DataFrame,
    resolution: int = 9,
    rollup_res: int = 2,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    cfg: DggsConfig = WGS84_003,
) -> DataFrame:
    """pages stream -> watermarked tumbling-window per-tile counts.

    Late rows beyond the watermark are dropped (state stays bounded);
    output mode 'append' emits each (window, tile) exactly once after
    the watermark passes."""
    tagged = extract_geotags(pages_stream)
    encoded = tagged.where(F.col("lon").isNotNull()).withColumn(
        "cell_id", rhp_encode(F.col("lon"), F.col("lat"), resolution, cfg)
    )
    return (
        encoded.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            F.substring("cell_id", 1, rollup_res + 1).alias("tile_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.approx_count_distinct("lang").alias("n_langs"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "tile_id",
            "n_pages",
            "n_langs",
        )
    )


def run_available_now(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    sink_table: str = "stream_cell_counts",
    **kwargs,
) -> None:
    """Drive the streaming rollup over a file source until exhausted
    (Trigger.AvailableNow) into an in-memory sink — the test/bench
    harness path; swap source/sink for production feeds."""
    static = spark.read.parquet(source_dir)
    stream = spark.readStream.schema(static.schema).parquet(source_dir)
    out = streaming_cell_counts(stream, **kwargs)
    q = (
        out.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_zone_assignment(
    points_stream: DataFrame,
    zone: DataFrame,
    resolution: int = 9,
    cfg: DggsConfig = WGS84_003,
) -> DataFrame:
    """Continuously arriving points -> res-`resolution` encode ->
    stream-static containment join against a (small) multi-resolution
    zone table (zone_from_poly_df / polyfill_df output, `tile_id`
    column) -> one assignment row per (point, containing zone cell).

    Stateless per micro-batch: the static zone side is broadcast into
    every batch and the mixed-resolution join uses the single-scan
    prefix-explode plan (operators/joins.containment_join), so the
    stream side is never shuffled — the shape that holds when the
    stream is a firehose and the zone table is the small side."""
    from ..operators.joins import containment_join

    enc = points_stream.withColumn(
        "cell_id", rhp_encode(F.col("lon"), F.col("lat"), resolution, cfg)
    )
    return containment_join(enc, zone, tile_cell="tile_id")
