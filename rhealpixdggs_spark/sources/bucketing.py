"""Bucketed table layout for shuffle-free co-located joins.

The north-star workload repeatedly joins and aggregates huge tables on
the same cell key (per-URL tile assignments joined to tile metadata,
rollups re-joined to the grid, day-over-day dedup of the same
bucketed corpus). Spark's bucketing is the mechanism that makes those
REPEATED operations shuffle-free: write both sides bucketed (and
sorted) by the packed int64 tile index once, and every subsequent
equi-join or groupBy on that key reads the co-located buckets directly
— the physical plan has NO Exchange on either side, so a 100 TB x
100 TB join moves zero bytes across the cluster beyond the scan
itself.

At 1000-executor scale pick n_buckets as a multiple of the executor
count (e.g. 4096 for ~4 buckets/executor wave); bucket pruning
(`spark.sql.sources.bucketing.enabled`, on by default) also turns
point lookups on the bucket key into single-bucket scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "tile_idx",
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a parquet table bucketed (and sorted) by
    `bucket_col`. Joins/aggregations between tables bucketed with the
    SAME column and bucket count plan without any Exchange; the sort
    makes the merge side of a sort-merge join zero-sort too."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*(sort_cols or [bucket_col]))
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata (plain
    spark.read.parquet on the files would lose it)."""
    return spark.table(table)
