"""Corpus-level rollups for web-scale document tables.

Per-source (host-like key) quality/size statistics — the report a
crawl-curation pipeline runs before deciding which hosts to keep,
re-crawl, or down-weight. All pure pyspark.sql.functions; every
measure is either an integer sum/count or a min/max of an
already-rounded value, so results are bit-deterministic under any
partitioning (no float-sum ordering effects) and verifiable
value-for-value against the ANSI-SQL oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score, token_count
from .dedup import _hash64

# quality_score is rounded to 6 decimals; scaling by 1e6 and rounding
# to a long makes per-document quality an exact integer, so the
# cross-partition sum (and therefore the mean) is order-independent.
_Q_SCALE = 1_000_000


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    hash_fn: str = "xxhash64",
    salt: str = "sample",
    denom: int = 1_000_000,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling by key hash — the
    data-mixing step of a training-corpus pipeline (e.g. keep 80% of
    en, 10% of boilerplate-heavy strata). A row survives iff
    ``hash(salt|key) mod denom < round(rate*denom)``, so the sample is
    reproducible under any partitioning, stable across reruns and
    cluster sizes, and needs NO shuffle — a pure map-side filter with
    full predicate fusion even at 1e12 rows. Rates are converted to
    integer thresholds driver-side, so neither engine does a
    float-to-int cast at compare time. ``hash_fn='md5'`` selects the
    ANSI-portable hash the DuckDB oracle re-computes value-for-value;
    xxhash64 stays the scale default."""
    thresholds = {k: int(round(v * denom)) for k, v in rates.items()}
    default_thr = F.lit(int(round(default_rate * denom)))
    if thresholds:
        mapping = F.create_map(
            *[x for k, v in thresholds.items() for x in (F.lit(k), F.lit(v))]
        )
        thr = F.coalesce(mapping[F.col(strata_col)], default_thr)
    else:
        thr = default_thr
    h = _hash64(
        F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string")), hash_fn
    )
    return df.where(F.pmod(h, F.lit(denom)) < thr)


def chunk_documents(
    df: DataFrame,
    width: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Shard documents into fixed-width token chunks with overlap —
    the step that turns a curated corpus into training samples.
    Chunks start at token offsets 0, stride, 2*stride, ... while the
    offset is inside the document; the final chunks may be shorter
    than ``width``. Empty documents yield no chunks.

    Scale shape: one generate/explode over a sequence column — a pure
    map-side row expansion (no shuffle, no Python); the ~width/stride
    output amplification is the intended training-sample overlap.
    Returns (id, chunk_id, n_tokens, chunk_text).
    """
    if not (0 < stride <= width):
        raise ValueError(f"need 0 < stride <= width, got {stride}/{width}")
    toks = F.split(F.trim(F.col(text_col)), "\\s+")
    n = token_count(F.col(text_col))
    starts = F.when(n == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), n - 1, F.lit(stride))
    )
    base = df.select(
        F.col(id_col), toks.alias("_toks"), n.alias("_n"), starts.alias("_s")
    )
    start = F.explode(F.col("_s")).alias("start")
    exploded = base.select(id_col, "_toks", "_n", start)
    return exploded.select(
        F.col(id_col),
        (F.col("start") / stride).cast("long").alias("chunk_id"),
        F.least(F.lit(width), F.col("_n") - F.col("start")).alias("n_tokens"),
        F.concat_ws(
            " ", F.slice(F.col("_toks"), F.col("start") + 1, width)
        ).alias("chunk_text"),
    )


def source_rollup(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source corpus statistics: document count, total tokens,
    language spread, and exact min/mean/max heuristic quality.

    Scale shape: ONE hash aggregation with map-side partials. At 1e12
    pages over a bounded host universe the shuffle carries only one
    partial row per (task, source) — skewed hosts are harmless because
    partials collapse per-partition before the exchange; the distinct
    language count rides the same shuffle as an approximate-free
    two-level agg (exact, since (source, lang) cardinality is tiny).
    """
    q6 = F.round(quality_score(F.col(text_col)) * _Q_SCALE).cast("long")
    per_doc = df.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        token_count(F.col(text_col)).alias("ntok"),
        q6.alias("q6"),
    )
    # exact distinct-lang count without a second shuffle over the raw
    # table: first collapse to (source, lang) partials, then count.
    by_lang = per_doc.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ntok").cast("long").alias("tok"),
        F.sum("q6").alias("sq6"),
        F.min("q6").alias("minq6"),
        F.max("q6").alias("maxq6"),
    )
    rolled = by_lang.groupBy("source").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("tok").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_langs"),
        F.sum("sq6").alias("sq6"),
        F.min("minq6").alias("minq6"),
        F.max("maxq6").alias("maxq6"),
    )
    return rolled.select(
        "source",
        "n_docs",
        "total_tokens",
        "n_langs",
        (F.round(F.col("minq6") / _Q_SCALE, 6) + F.lit(0.0)).alias("min_quality"),
        (
            F.round(F.col("sq6") / F.col("n_docs") / _Q_SCALE, 6) + F.lit(0.0)
        ).alias("avg_quality"),
        (F.round(F.col("maxq6") / _Q_SCALE, 6) + F.lit(0.0)).alias("max_quality"),
    )


def sampled_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    log2_rate: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """Deterministic approximate COUNT(DISTINCT value) per group via
    threshold hashing — the fixed-theta theta-sketch / KMV idea: a
    value is SAMPLED iff hash(value) % 2^log2_rate == 0 (a property of
    the VALUE, so every occurrence everywhere samples identically —
    deterministic, no RNG, mergeable by construction), and the
    estimate is (exact distinct count of sampled values) * 2^log2_rate
    with relative error ~ 1/sqrt(n_sampled).

    Why not approx_count_distinct: Spark's HLL++ sketch is not
    reproducible across engines, so it cannot be oracle-gated; this
    estimator is bit-deterministic (hash_fn='md5' has an exact DuckDB
    twin; 'xxhash64' is the scale default) and its 100-TB plan is
    BETTER than a full distinct: the pre-aggregation filter drops
    1 - 2^-log2_rate of the rows BEFORE the shuffle, so the exchange
    carries only the sample. Output: group_cols + (est_distinct,
    n_sampled)."""
    h = _hash64(F.col(value_col), hash_fn)
    sampled = df.where(h % (1 << log2_rate) == 0)
    return sampled.groupBy(*group_cols).agg(
        (F.countDistinct(value_col) * (1 << log2_rate))
        .cast("long")
        .alias("est_distinct"),
        F.countDistinct(value_col).cast("long").alias("n_sampled"),
    )
