"""rhealpixdggs_spark — a from-scratch PySpark-native rHEALPix DGGS
spatial-join + tiling engine.

Re-derives the math of the reference library
``manaakiwhenua/rhealpixdggs-py`` (studied read-only at
``/root/reference``) as vectorized NumPy kernels wrapped in Arrow
pandas UDFs, and exposes the cell algebra as DataFrame columns, joins
and aggregations designed for 100 TB-scale Spark clusters.

Layout:
    kernel/     pure NumPy, no Spark imports (projection + cell math)
    functions/  pandas_udf wrappers + text/similarity column helpers
    operators/  DataFrame->DataFrame planners (joins, dedup, kNN, agg)
    sources/    synthetic pages table, snapshot manifests (checkpoint)
    streaming/  structured-streaming per-cell rollups
"""

__version__ = "0.1.0"
