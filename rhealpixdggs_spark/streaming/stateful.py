"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming surface; these are the engine-level
stateful operators a continuously-ingesting training-data pipeline
needs (SURVEY.md section 2.7): exact first-seen dedup across
micro-batches and per-tile running counters, with explicit per-key
state instead of unbounded watermark-window state.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_first_seen_dedup(
    stream: DataFrame,
    key_col: str = "fp",
    keep_cols: tuple[str, ...] = ("url", "lang"),
) -> DataFrame:
    """Emit only the first row ever seen per key across the whole
    stream (exact streaming dedup). State per key is a single boolean —
    bounded by distinct-key count, not window length.

    Rows within one micro-batch dedupe to the batch's first row; later
    batches emit nothing for known keys."""
    out_type = T.StructType(
        [T.StructField(key_col, T.StringType())]
        + [T.StructField(c, T.StringType()) for c in keep_cols]
    )
    state_type = T.StructType([T.StructField("seen", T.BooleanType())])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]][[key_col, *keep_cols]]
        if first is not None:
            state.update((True,))
            yield first

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_type, state_type, "append", GroupStateTimeout.NoTimeout
        )
    )


def streaming_cell_running_counts(
    stream: DataFrame,
    cell_col: str = "tile_id",
) -> DataFrame:
    """Per-cell cumulative page count emitted after every micro-batch
    touching the cell — an 'update'-mode running counter with explicit
    integer state (what a per-tile freshness dashboard consumes)."""
    out_type = T.StructType(
        [
            T.StructField(cell_col, T.StringType()),
            T.StructField("total_pages", T.LongType()),
        ]
    )
    state_type = T.StructType([T.StructField("n", T.LongType())])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        batch = 0
        for pdf in pdfs:
            batch += len(pdf)
        if batch:
            n += batch
            state.update((n,))
            yield pd.DataFrame({cell_col: [key[0]], "total_pages": [n]})

    return (
        stream.groupBy(cell_col)
        .applyInPandasWithState(
            fn, out_type, state_type, "update", GroupStateTimeout.NoTimeout
        )
    )
