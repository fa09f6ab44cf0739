"""Pure-JVM column encode vs the Arrow/NumPy kernel: same cells on a
large deterministic point sweep (both suid and packed forms), NULL
propagation, and a plan with no Python evaluator."""

import numpy as np
from pyspark.sql import functions as F

from rhealpixdggs_spark.functions.column_encode import with_rhp_cell, with_rhp_index
from rhealpixdggs_spark.functions.udfs import rhp_encode, rhp_encode_index


def _sweep(spark, n):
    return spark.range(n).select(
        ((F.col("id") * 9973 % 360000) / 1000.0 - 180.0).alias("lon"),
        ((F.col("id") * 7919 % 178000) / 1000.0 - 89.0).alias("lat"),
    )


def test_matches_arrow_kernel_bulk(spark):
    n = 1_000_000
    d = _sweep(spark, n)
    d = with_rhp_cell(d, F.col("lon"), F.col("lat"), 9, "a")
    d = with_rhp_index(d, F.col("lon"), F.col("lat"), 9, "ia")
    d = d.withColumn("b", rhp_encode(F.col("lon"), F.col("lat"), 9))
    d = d.withColumn("ib", rhp_encode_index(F.col("lon"), F.col("lat"), 9))
    bad = d.where(
        (F.col("a") != F.col("b"))
        | (F.col("ia") != F.col("ib"))
        | (F.col("a").isNull() != F.col("b").isNull())
        | (F.col("ia").isNull() != F.col("ib").isNull())
    ).count()
    assert bad == 0


def test_resolutions_and_poles(spark):
    pts = [
        (0.0, 0.0), (-180.0, 0.0), (179.999, -89.999), (10.0, 89.9),
        (-45.0, -89.9), (0.0, 41.87), (0.0, 41.88), (100.0, -41.88),
    ]
    df = spark.createDataFrame(pts, ["lon", "lat"])
    for res in (0, 1, 5, 15):
        d = with_rhp_cell(df, F.col("lon"), F.col("lat"), res, "a")
        d = d.withColumn("b", rhp_encode(F.col("lon"), F.col("lat"), res))
        rows = d.collect()
        assert all(r.a == r.b for r in rows), (res, rows)


def test_null_propagates(spark):
    df = spark.createDataFrame(
        [(None, 10.0), (10.0, None), (10.0, 20.0)], ["lon", "lat"]
    )
    d = with_rhp_index(df, F.col("lon"), F.col("lat"), 9, "ci")
    d = with_rhp_cell(d, F.col("lon"), F.col("lat"), 9, "c")
    rows = d.collect()
    assert rows[0].ci is None and rows[0].c is None
    assert rows[1].ci is None and rows[1].c is None
    assert rows[2].ci is not None and rows[2].c is not None


def test_plan_is_pure_jvm(spark):
    d = with_rhp_index(_sweep(spark, 100), F.col("lon"), F.col("lat"), 9, "ci")
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "*(1)" in plan  # whole-stage codegen
