"""Count-min sketch: mergeable constant-size frequency summaries.

The heavy-hitter / frequency-estimation primitive for streams and
corpora whose distinct-key space does not fit anywhere: the sketch is
a depth x width counter grid (depth independent hash rows), updates
are `grid[r][h_r(x)] += 1`, and the estimate for x is
`min_r grid[r][h_r(x)]` — an OVERcount-only bound (Cormode & Muthu,
"An improved data stream summary: the count-min sketch", 2005).

Spark shape: the grid is a DataFrame of (row, bucket, cnt) — depth x
width rows TOTAL, regardless of input size. Building it is one
map-side explode (each token emits `depth` (row, bucket) pairs) into
a partially-aggregating groupBy whose shuffle carries at most
depth x width groups per map task — the sketch merges by ADDITION,
so partial aggregation IS the merge, the same property that makes
sketches unionable across days/sources/streams. Estimation joins the
(tiny) query set against the grid on (row, bucket) and takes the min
across rows.

Determinism: counters are exact integers (order-independent sums) and
the bucket hashes are keyed, seeded column hashes — with
hash_fn='md5' the DuckDB oracle recomputes the identical grid and the
identical estimates; xxhash64 is the JVM scale default. No RNG, no
floats anywhere.

Sizing at 100 TB: width trades memory for error (estimate overshoots
by <= e * N / width with probability 1 - exp(-depth) per query, N =
total count); a 4 x 65536 grid of int64 is 2 MB and absorbs any
corpus. The shuffle is the constant-size grid, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rhealpixdggs_spark.operators.dedup import _hash64


def _bucket(col, row: int, width: int, hash_fn: str):
    """Keyed bucket hash: row index is part of the hashed key, so the
    depth rows are independent functions of the same value."""
    return F.pmod(
        _hash64(F.concat(F.lit(f"{row}:"), col.cast("string")), hash_fn),
        F.lit(width),
    ).cast("int")


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Build the (row, bucket, cnt) grid over one column's values.
    One explode (x depth) + one partially-aggregating groupBy; the
    exchange moves at most depth x width groups per map task."""
    pairs = df.select(
        F.posexplode(
            F.array(
                *[_bucket(F.col(col), r, width, hash_fn) for r in range(depth)]
            )
        ).alias("row", "bucket")
    )
    return pairs.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union-merge grids built with the same (depth, width, hash_fn):
    counters add. This is how per-day / per-source / per-stream
    sketches combine without touching the raw data again."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Point-frequency estimates for each distinct value in `queries`:
    min over the grid rows (0 where a bucket row is absent — an empty
    counter). Output: (col, est). The join's left side is the query
    set x depth — model-sized, broadcastable by AQE when small."""
    probes = queries.select(col).distinct()
    probes = probes.select(
        col,
        F.posexplode(
            F.array(
                *[_bucket(F.col(col), r, width, hash_fn) for r in range(depth)]
            )
        ).alias("row", "bucket"),
    )
    hit = probes.join(sketch, ["row", "bucket"], "left").select(
        col, F.coalesce(F.col("cnt"), F.lit(0)).alias("_c")
    )
    return hit.groupBy(col).agg(F.min("_c").alias("est"))


def cms_sql_parts(depth: int, width: int) -> dict:
    """DuckDB fragments mirroring _bucket with the portable md5 hash:
    parts['bucket'](value_sql, row_sql) -> bucket expression."""

    def bucket(value_sql: str, row_sql: str) -> str:
        key = f"CAST({row_sql} AS VARCHAR) || ':' || CAST({value_sql} AS VARCHAR)"
        h = f"CAST('0x' || substr(md5({key}), 1, 15) AS BIGINT)"
        return f"CAST({h} % {width} AS INT)"

    return {"bucket": bucket, "depth": depth, "width": width}
