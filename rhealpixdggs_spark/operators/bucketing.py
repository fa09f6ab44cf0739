"""Bucketed-table helpers: co-located joins on cell keys.

At 100 TB, repeated joins/aggregations on cell_idx should not reshuffle
the pages table every query. Writing the encoded table bucketed by the
cell key (Hive bucketing via saveAsTable) lets sort-merge joins and
groupBys reuse the on-disk partitioning — Catalyst elides the Exchange
when both sides are bucketed on the join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "cell_idx",
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist df bucketed (and sorted) by the cell key. Buckets make
    subsequent equi-joins/aggs on bucket_col shuffle-free; the sort
    makes them merge-ready without a per-task sort."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str = "cell_idx",
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the same key/bucket count: planned
    as SortMergeJoin with NO Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
