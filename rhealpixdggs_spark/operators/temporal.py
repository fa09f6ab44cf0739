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
