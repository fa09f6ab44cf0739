"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline (single scan +
window); the scale path buckets vectors with signed random projections
(LSH) so the candidate join is an equi-join on bucket id, then exact
re-rank inside buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def dot_expr(a: Column, b: Column) -> Column:
    """Dot product of two array columns via zip_with + aggregate
    (JVM-side, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk_brute(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_vec: str = "q_embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries, one scan of the vector
    table, per-query window. Deterministic tie-break on id."""
    joined = vectors.crossJoin(F.broadcast(queries))
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        joined.withColumn(
            "cos", F.round(cosine_expr(F.col(vec_col), F.col(query_vec)), 6)
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "cos", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def rp_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: one bit per hyperplane."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(dot_expr(vec, arr) > 0, F.lit(1 << i)).otherwise(0)
    return bucket


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_vec: str = "q_embedding",
    query_id: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: equi-join on the random-projection bucket,
    exact cosine re-rank inside the bucket. At scale the vectors table
    is written bucketed by `bucket` so this join is shuffle-free; the
    recall/cost trade is n_planes (2^n buckets)."""
    planes = _hyperplanes(dim, n_planes, seed)
    v = vectors.withColumn("bucket", rp_bucket_expr(F.col(vec_col), planes))
    q = queries.withColumn("bucket", rp_bucket_expr(F.col(query_vec), planes))
    joined = v.join(F.broadcast(q), "bucket")
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        joined.withColumn(
            "cos", F.round(cosine_expr(F.col(vec_col), F.col(query_vec)), 6)
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "cos", "rank")
    )
