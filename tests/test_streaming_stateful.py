"""Stateful streaming operators: first-seen dedup and running counts
across micro-batches."""

import pytest
from pyspark.sql import functions as F

from rhealpixdggs_spark.functions.text import fingerprint
from rhealpixdggs_spark.sources.pages import synthesize_pages


@pytest.fixture(scope="module")
def two_batch_source(spark, tmp_path_factory):
    """Two parquet files arriving as separate micro-batches, with
    duplicate texts within and across batches."""
    d = tmp_path_factory.mktemp("stream_src")
    pages = synthesize_pages(spark, 400).select("url", "lang", "text")
    keyed = pages.withColumn("fp", fingerprint(F.col("text")))
    b1 = keyed.limit(250)
    b2 = keyed  # superset: every b1 key repeats in batch 2
    b1.coalesce(1).write.parquet(str(d / "b1"))
    b2.coalesce(1).write.parquet(str(d / "b2"))
    return str(d), keyed


def _run_stream(spark, src_glob, transform, sink, ckpt, mode):
    static = spark.read.parquet(src_glob)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_glob)
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_first_seen_dedup(spark, two_batch_source, tmp_path):
    from rhealpixdggs_spark.streaming.stateful import streaming_first_seen_dedup

    src, keyed = two_batch_source
    _run_stream(
        spark,
        f"{src}/*/",
        lambda s: streaming_first_seen_dedup(s, "fp", ("url", "lang")),
        "t_dedup",
        str(tmp_path / "ck1"),
        "append",
    )
    got = spark.sql("select fp, count(*) c from t_dedup group by fp")
    # Every key exactly once, and every distinct key present.
    assert got.where(F.col("c") > 1).isEmpty()
    n_keys = keyed.select("fp").distinct().count()
    assert got.count() == n_keys


def test_running_counts(spark, two_batch_source, tmp_path):
    from rhealpixdggs_spark.streaming.stateful import streaming_cell_running_counts

    src, keyed = two_batch_source
    _run_stream(
        spark,
        f"{src}/*/",
        lambda s: streaming_cell_running_counts(s.withColumn("tile_id", F.col("lang")), "tile_id"),
        "t_counts",
        str(tmp_path / "ck2"),
        "update",
    )
    # The LAST emitted total per key equals the batch total count.
    final = spark.sql(
        "select tile_id, max(total_pages) n from t_counts group by tile_id"
    )
    # The stream replays BOTH files (250-row prefix + full 400).
    all_rows = spark.read.parquet(f"{src}/*/")
    exp = all_rows.groupBy(F.col("lang").alias("tile_id")).count()
    diff = final.join(exp, "tile_id").where(F.col("n") != F.col("count"))
    assert diff.isEmpty()


def test_streaming_zone_assignment(spark, tmp_path):
    """Stream-static zone assignment: two micro-batches of points
    joined against a static multi-resolution zone produce exactly the
    rows the batch containment join produces on the full input."""
    from rhealpixdggs_spark.operators.joins import containment_join
    from rhealpixdggs_spark.operators.tiling import zone_from_poly_df
    from rhealpixdggs_spark.streaming.pipeline import (
        streaming_zone_assignment,
    )
    from rhealpixdggs_spark.functions.udfs import rhp_encode

    euro = [(-10.0, 36.0), (25.0, 34.0), (30.0, 58.0), (-8.0, 60.0)]
    zone = zone_from_poly_df(spark, [(euro, [])], res_limit=2).select(
        F.col("cell_id").alias("tile_id")
    )
    zone = zone.localCheckpoint(eager=True)  # static small side

    pts = spark.range(0, 300).select(
        F.col("id").alias("pid"),
        (F.col("id") % 40 - 10.0).alias("lon"),
        (F.col("id") % 25 + 34.0).alias("lat"),
    )
    src = tmp_path / "zsrc"
    pts.where("pid < 150").coalesce(1).write.parquet(str(src / "b1"))
    pts.where("pid >= 150").coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(pts.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        streaming_zone_assignment(stream, zone, resolution=5)
        .writeStream.format("memory")
        .queryName("zone_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        (r.pid, r.tile_id)
        for r in spark.table("zone_sink").select("pid", "tile_id").collect()
    )
    enc = pts.withColumn(
        "cell_id", rhp_encode(F.col("lon"), F.col("lat"), 5)
    )
    exp = sorted(
        (r.pid, r.tile_id)
        for r in containment_join(enc, zone, tile_cell="tile_id")
        .select("pid", "tile_id")
        .collect()
    )
    assert got == exp and len(got) > 0
