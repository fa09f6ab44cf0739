"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline (single scan +
window); the scale paths bucket vectors so the candidate join is an
equi-join on a bucket id followed by an exact re-rank inside buckets:

- LSH: signed random projections, 2^n_planes buckets, no training.
- IVF: a k-centroid coarse quantizer; each vector lives in the cell
  of its nearest centroid, queries probe the `nprobe` nearest cells.
  `ivf_train` runs Lloyd iterations as DataFrame aggregations; a
  fixed seeded codebook (`ivf_codebook`) is the zero-training
  variant whose literals an external SQL oracle can reproduce.

Both scale paths keep the candidate-generation math JVM-side
(zip_with/aggregate dot products over literal arrays — no UDF), so
bucketing fuses into the scan's codegen stage.
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


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the 4x scan-reduction
    scale path for ANN over 100 TB embedding tables: scale =
    max|x| / 127, q_i = round(x_i / scale) in [-127, 127] (the zero
    vector quantizes to zeros with scale 0). Pure column expressions
    (aggregate max-abs + transform round), so quantization fuses into
    the writing scan; downstream cosine needs NO scales at all — the
    per-vector scalar cancels in the normalized dot product, leaving
    exact INTEGER dot products + one double division per pair.
    Output: (id, qvec array<int>, scale double)."""
    v = F.col(vec_col)
    maxabs = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    scale = maxabs / F.lit(127.0)
    q = F.transform(
        v,
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(F.round(x.cast("double") / scale, 0).cast("int")),
    )
    return df.select(
        F.col(id_col), q.alias("qvec"), scale.alias("scale")
    )


def cosine_topk_quantized(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_vec: str = "q_embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Brute-force cosine top-k over int8-QUANTIZED vectors
    (quantize_embeddings both sides): integer dot products via
    zip_with/aggregate (exact, engine-independent), one double
    division per pair — the 4x-less-bytes variant of
    cosine_topk_brute. Ranking differs from the float path only by
    quantization error (<= ~1/127 per component). A zero vector on
    either side (all-zero qvec by quantize_embeddings design) gets a
    DEFINED cos of 0.0 — guarded on both the Spark expression and
    the SQL oracle twin, since NULL/NaN division behavior is
    engine-version-dependent and would rank nondeterministically."""
    qv = quantize_embeddings(vectors, vec_col, id_col)
    qq = quantize_embeddings(queries, query_vec, query_id).select(
        F.col(query_id), F.col("qvec").alias("q_qvec")
    )
    joined = qv.crossJoin(F.broadcast(qq))

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    denom = F.sqrt(idot(F.col("qvec"), F.col("qvec")).cast("double")) * F.sqrt(
        idot(F.col("q_qvec"), F.col("q_qvec")).cast("double")
    )
    cos = F.when(denom == 0.0, F.lit(0.0)).otherwise(
        idot(F.col("qvec"), F.col("q_qvec")).cast("double") / denom
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        joined.withColumn("cos", F.round(cos, 6))
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


def ivf_codebook(dim: int, k: int, seed: int = 7) -> list[list[float]]:
    """Deterministic unit-norm coarse-quantizer codebook. Serves as
    the Lloyd initializer AND as the zero-training IVF variant whose
    centroid literals a SQL twin can embed verbatim."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((k, dim))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    return c.tolist()


def _lit_arr(values: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in values])


def ivf_dots_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """Array of <vec, centroid_i> dot products (JVM-side)."""
    return F.array(*[dot_expr(vec, _lit_arr(c)) for c in centroids])


def ivf_assign_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """0-based id of the max-dot-product centroid; ties break to the
    lowest id (array_position returns the first occurrence)."""
    dots = ivf_dots_expr(vec, centroids)
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def ivf_probes_expr(vec: Column, centroids: list[list[float]], nprobe: int) -> Column:
    """The `nprobe` centroid ids nearest to `vec`, by dot product
    descending with id-ascending tie-break — struct array_sort on
    (-dot, id), no UDF."""
    dots = ivf_dots_expr(vec, centroids)
    ranked = F.array_sort(
        F.transform(
            F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
            lambda i: F.struct(
                (-F.element_at(dots, i + 1)).alias("nd"), i.cast("int").alias("ix")
            ),
        )
    )
    return F.transform(F.slice(ranked, 1, nprobe), lambda s: s["ix"])


def ivf_train(
    df: DataFrame,
    k: int,
    iters: int = 5,
    vec_col: str = "embedding",
    seed: int = 7,
) -> list[list[float]]:
    """Lloyd refinement of the seeded codebook, expressed as Spark
    aggregations: assign (JVM argmin) -> posexplode -> per-(cluster,
    dimension) mean. The only driver materialization per iteration is
    the k x dim centroid table itself (a few KB — the model, not the
    data), so the loop scales to any corpus size. Empty clusters keep
    their previous centroid."""
    first = df.select(vec_col).first()
    dim = len(first[0])
    cents = ivf_codebook(dim, k, seed)
    v = df.select(F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"))
    for _ in range(iters):
        assigned = v.withColumn("c", ivf_assign_expr(F.col("v"), cents))
        means = (
            assigned.select("c", F.posexplode("v").alias("pos", "x"))
            .groupBy("c", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = [list(c) for c in cents]
        for row in means:
            new[row["c"]][row["pos"]] = row["m"]
        cents = new
    return cents


def ivf_train_exact(
    df: DataFrame,
    dim: int,
    k: int,
    iters: int = 2,
    vec_col: str = "embedding",
    seed: int = 7,
    scale_bits: int = 20,
) -> tuple[list[list[float]], DataFrame]:
    """Bit-REPRODUCIBLE Lloyd training: quantize each vector to
    int64 at 2^scale_bits, accumulate per-(cluster, dimension) SUMS
    as integers — exact and ORDER-INDEPENDENT, unlike float avg whose
    partial-aggregation order varies run to run and engine to engine
    — and form each mean with one double division
    sum / (n * 2^scale_bits). Every float the loop touches is either
    an exactly-representable quantized double (x = q / 2^scale_bits,
    a power-of-2 scaling) or that single division, so the trained
    centroids and the final assignment are bit-identical across
    engines (the DuckDB oracle unrolls the same iterations in SQL).
    Quantization at 20 bits costs ~1e-6 per coordinate — noise
    relative to k-means convergence; it buys deterministic
    distributed training (retrainable audit trails, reproducible
    partition layouts for ivf_write_partitioned).

    Per iteration: one JVM argmax assignment pass + one integer-sum
    aggregation whose driver materialization is the k x dim stats
    table (model-sized). Empty clusters keep their previous centroid.
    Returns (centroids, assignment DataFrame (id columns of `df`,
    cluster))."""
    s = float(1 << scale_bits)
    cents = ivf_codebook(dim, k, seed)
    q = df.withColumn(
        "_q",
        F.transform(
            F.col(vec_col), lambda x: F.round(x.cast("double") * s).cast("long")
        ),
    ).withColumn("_v", F.transform("_q", lambda x: x.cast("double") / s))
    for _ in range(iters):
        assigned = q.withColumn("_c", ivf_assign_expr(F.col("_v"), cents))
        stats = (
            assigned.select("_c", F.posexplode("_q").alias("_pos", "_x"))
            .groupBy("_c", "_pos")
            .agg(F.sum("_x").alias("_sl"), F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        new = [list(c) for c in cents]
        for row in stats:
            new[row["_c"]][row["_pos"]] = row["_sl"] / (row["_n"] * s)
        cents = new
    out = q.withColumn("cluster", ivf_assign_expr(F.col("_v"), cents)).drop(
        "_q", "_v"
    )
    return cents, out


def cosine_topk_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: list[list[float]],
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_vec: str = "q_embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Approximate top-k via IVF: vectors equi-join queries on the
    coarse-quantizer cell (each query probes its `nprobe` nearest
    cells), exact cosine re-rank inside the probed cells. At scale
    the vectors table is written partitioned/bucketed by `cluster`,
    making the candidate join shuffle-free and letting Spark prune
    unprobed cells at the scan; recall/cost trades on (k_centroids,
    nprobe)."""
    v = vectors.withColumn("cluster", ivf_assign_expr(F.col(vec_col), centroids))
    q = queries.withColumn(
        "cluster", F.explode(ivf_probes_expr(F.col(query_vec), centroids, nprobe))
    )
    joined = v.join(F.broadcast(q), "cluster")
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        joined.withColumn(
            "cos", F.round(cosine_expr(F.col(vec_col), F.col(query_vec)), 6)
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "cos", "rank")
    )


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


def ivf_write_partitioned(
    vectors: DataFrame,
    path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Materialize the IVF index layout: the vectors table written
    partitioned by coarse-quantizer cell. Queries that probe a few
    cells then read only those directories — the pruning happens at
    the file index, before any row is scanned. This is the 100-TB
    shape: the one-time layout write costs a single shuffle-free
    pass (cluster is derived, not shuffled on) and every subsequent
    query is I/O-proportional to nprobe/k_centroids."""
    vectors.withColumn(
        "cluster", ivf_assign_expr(F.col(vec_col), centroids)
    ).write.partitionBy("cluster").mode(mode).parquet(path)


def cosine_topk_ivf_pruned(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int,
    centroids: list[list[float]],
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_vec: str = "q_embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """cosine_topk_ivf against an ivf_write_partitioned layout. The
    probed cell ids are computed from the (small, broadcastable)
    query side and pushed into the scan as a partition filter, so
    unprobed cells are never read. Returns the same columns /
    semantics as cosine_topk_ivf."""
    q = queries.withColumn(
        "cluster", F.explode(ivf_probes_expr(F.col(query_vec), centroids, nprobe))
    )
    # The query side is small by contract (it is broadcast below);
    # collecting its probed-cell set is a driver-side constant the
    # optimizer turns into a partition filter — not a data collect.
    probed = sorted({r["cluster"] for r in q.select("cluster").distinct().collect()})
    v = spark.read.parquet(index_path).where(F.col("cluster").isin(probed))
    joined = v.join(F.broadcast(q), "cluster")
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        joined.withColumn(
            "cos", F.round(cosine_expr(F.col(vec_col), F.col(query_vec)), 6)
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "cos", "rank")
    )
