"""Temporal joins over event streams.

The as-of join ("for each left row, the most recent right row at or
before its timestamp, per key") is the attribution / state-lookup
primitive a training-data event pipeline needs constantly and Spark
lacks natively. The implementation is the union + carry-forward
window trick: tag both inputs, union them, and run ONE window pass
per key ordered by (ts, side) with `last(..., ignorenulls=True)` to
carry each right-side payload column forward onto the left rows.

Plan shape, chosen for 100 TB: a single wide Exchange keyed by the
join key (both inputs shuffle once into the same hash partitioning),
one Sort, one Window, one Filter — no range-explode, no per-key
driver loop, no broadcast requirement on either side. Skewed keys
hit the same window-partition skew as any per-key window; salt the
key upstream if one entity dominates.

Semantics match DuckDB's `ASOF LEFT JOIN ... ON l.key = r.key AND
l.ts >= r.ts` (ties included: a right row AT the left timestamp is
visible, because side 0 sorts before side 1 at equal ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    tolerance=None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every `left` row, joined to the latest `right`
    row with ``right.on <= left.on`` and the same `by` key (LEFT
    semantics — unmatched left rows keep NULL right columns).

    on        : ordering column name, present in both inputs
                (timestamp or numeric).
    by        : equality key column name, present in both inputs.
    right_cols: right payload columns to carry (default: every right
                column except `on`/`by`). The matched right ordering
                value itself is always carried as ``{on}{suffix}``.
    tolerance : optional max distance `left.on - right.on` (a Column
                -compatible literal, e.g. F.expr("INTERVAL 1 HOUR")
                or a number for numeric `on`). Matches older than the
                tolerance are nulled out, as in pandas merge_asof.
    suffix    : rename applied to carried right columns that collide
                with a left column name.

    If `right` can hold several rows at the same (by, on), the one
    with the highest sort order among the tagged payload (last in
    (ts, side) order) wins — pre-aggregate `right` to one row per
    (by, on) when that choice must be explicit, as the oracle-checked
    contract query does.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, by)]
    carried = {c: c + suffix if c in left.columns else c for c in right_cols}
    ts_out = on + suffix

    r = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_side"),
        F.col(on).alias(ts_out),
        *[F.col(c).alias(carried[c]) for c in right_cols],
        *[F.lit(None).alias("_l_" + c) for c in left.columns],
    )
    l = left.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[on].dataType).alias(ts_out),
        *[F.lit(None).cast(right.schema[c].dataType).alias(carried[c]) for c in right_cols],
        *[F.col(c).alias("_l_" + c) for c in left.columns],
    )

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = r.unionByName(l)
    for c in [ts_out, *carried.values()]:
        tagged = tagged.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = tagged.where(F.col("_side") == 1)
    if tolerance is not None:
        stale = F.col(on) - F.col(ts_out) > tolerance
        for c in [*carried.values(), ts_out]:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
    return out.select(
        *[F.col("_l_" + c).alias(c) for c in left.columns if c != by],
        F.col(by),
        F.col(ts_out),
        *[F.col(c) for c in carried.values()],
    )


def _bucket_expr(col: Column, dtype, width) -> Column:
    """floor(position / width) bucket id. For timestamps `width` is in
    whole seconds (the id is computed from microseconds since epoch so
    sub-second event spacing still buckets correctly); for numeric
    `on` columns it is in the column's own units."""
    s = str(dtype).lower()
    if "timestamp" in s:
        us = F.expr(
            f"timestampdiff(MICROSECOND, "
            f"CAST('1970-01-01 00:00:00' AS {dtype.simpleString()}), "
            f"{col._jc.toString()})"
        )
        return F.floor(us / F.lit(float(width) * 1_000_000)).cast("long")
    return F.floor(col.cast("double") / F.lit(float(width))).cast("long")


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    bucket_width,
    right_cols: list[str] | None = None,
    tolerance=None,
    suffix: str = "_r",
) -> DataFrame:
    """Scale variant of :func:`asof_join` with BOUNDED window
    partitions: rows are windowed per (key, time-bucket) instead of
    per key, so one dominant entity no longer concentrates its entire
    history in a single window partition (the mega-key problem the
    plain path's docstring warns about).

    Mechanics — the standard two-level carry:

    1. bucket = floor(on / bucket_width) on both inputs.
    2. Per (key, bucket), reduce the right side to its LAST row
       (max(struct(on, payload)) — a partial-aggregating groupBy, tiny
       output: one row per key x active bucket).
    3. Seed pass: a second as-of at BUCKET granularity — for every
       (key, bucket) the left touches, find the last-right-row of the
       nearest EARLIER bucket (window over the per-bucket reduction;
       cardinality keys x buckets, orders of magnitude below row
       count).
    4. Final window per (key, bucket) over [seed rows + own-bucket
       right rows + left rows]; carry forward exactly as the plain
       path. A seed's `on` is strictly below the bucket start, so it
       sorts first; right rows AT a left timestamp remain visible.

    Results are identical to the plain path whenever `right` has at
    most one row per (by, on) (the same uniqueness the plain path's
    docstring asks for); with duplicates the two paths may pick
    different rows of the tie. Cost: three extra small shuffles (the
    per-bucket reduction, the left-bucket set, the seed window) —
    the price of bounded memory; pick `bucket_width` so a typical
    key x bucket holds thousands of rows, not billions.

    `tolerance` works unchanged: the carried ts is the matched row's
    real timestamp, wherever it came from.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, by)]
    carried = {c: c + suffix if c in left.columns else c for c in right_cols}
    ts_out = on + suffix
    on_type = right.schema[on].dataType

    bkt = "_asof_bkt"
    r2 = right.select(
        by, on, *right_cols, _bucket_expr(F.col(on), on_type, bucket_width).alias(bkt)
    )
    l2 = left.select(
        "*", _bucket_expr(F.col(on), on_type, bucket_width).alias(bkt)
    )

    # (2) last right row per (key, bucket) — struct max keeps the row
    # with the greatest `on` (payload fields only break exact-ts ties).
    lastr = r2.groupBy(by, bkt).agg(
        F.max(F.struct(F.col(on), *[F.col(c) for c in right_cols])).alias("_row")
    )

    # (3) bucket-granularity as-of: left-bucket markers sort BEFORE
    # same-bucket right reductions (side 0 < 1), so a marker's
    # carry-forward sees only strictly-earlier buckets.
    lb = l2.select(by, bkt).distinct().withColumn("_mside", F.lit(0))
    rb = lastr.withColumn("_mside", F.lit(1))
    mini = lb.unionByName(rb.select(by, bkt, "_mside", "_row"), allowMissingColumns=True)
    mw = (
        Window.partitionBy(by)
        .orderBy(F.col(bkt).asc(), F.col("_mside").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seeds = (
        mini.withColumn("_seed", F.last("_row", ignorenulls=True).over(mw))
        .where((F.col("_mside") == 0) & F.col("_seed").isNotNull())
        .select(
            by,
            bkt,
            F.col("_seed")[on].alias(on),
            *[F.col("_seed")[c].alias(c) for c in right_cols],
        )
    )

    # (4) final bounded window per (key, bucket).
    def _rside(df):
        return df.select(
            F.col(by),
            F.col(bkt),
            F.col(on),
            F.lit(0).alias("_side"),
            F.col(on).alias(ts_out),
            *[F.col(c).alias(carried[c]) for c in right_cols],
            *[F.lit(None).alias("_l_" + c) for c in left.columns],
        )

    lrows = l2.select(
        F.col(by),
        F.col(bkt),
        F.col(on),
        F.lit(1).alias("_side"),
        F.lit(None).cast(on_type).alias(ts_out),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(carried[c])
            for c in right_cols
        ],
        *[F.col(c).alias("_l_" + c) for c in left.columns],
    )
    tagged = _rside(r2).unionByName(_rside(seeds)).unionByName(lrows)
    w = (
        Window.partitionBy(by, bkt)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in [ts_out, *carried.values()]:
        tagged = tagged.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = tagged.where(F.col("_side") == 1)
    if tolerance is not None:
        stale = F.col(on) - F.col(ts_out) > tolerance
        for c in [*carried.values(), ts_out]:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
    return out.select(
        *[F.col("_l_" + c).alias(c) for c in left.columns if c != by],
        F.col(by),
        F.col(ts_out),
        *[F.col(c) for c in carried.values()],
    )
