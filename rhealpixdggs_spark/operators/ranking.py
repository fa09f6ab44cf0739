"""BM25 lexical ranking over web-scale document tables.

The retrieval step of a crawl-curation / RAG-indexing pipeline: score
every document against a (small) set of keyword queries with BM25
(Robertson/Spärck Jones; the Lucene-style positive idf variant
``ln(1 + (N - df + 0.5)/(df + 0.5))``) and keep the top-k documents
per query. The reference repo has no text-retrieval surface — this is
an engine-level operator (SURVEY.md §2.7 family), designed
Spark-first:

- the query-term table is broadcast and applied as a ``left_semi``
  join on the exploded token stream BEFORE any aggregation, so only
  postings for query terms ever shuffle — at 10^12 documents the
  shuffled volume is O(matching postings), not O(corpus tokens);
- document length is a pure column expression (no explode needed);
- corpus stats (N, total token count) reduce to ONE row and re-enter
  as a broadcast nested-loop join of a 1-row side (a literal-feed,
  not a data-scale cartesian);
- avgdl is derived as exact-integer ``sum(dl)/N`` — never a running
  float mean — so both engines divide the same two integers and the
  per-posting weight is a bit-identical IEEE expression tree;
- per-(query, doc) scores sum at most ``len(terms)`` positive weights
  and are rounded to 6 decimals BEFORE ranking, so association order
  cannot flip a rank on either side; ties break on doc id.

Everything is JVM column math — no Python UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = ["bm25_topk", "cell_term_profile"]


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_col: str = "query_id",
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """Top-k documents per query by BM25.

    ``docs``: the corpus (``id_col``, ``text_col``). ``queries``: a
    SMALL table (``query_col``, ``term_col``) — one row per query
    term; it is broadcast twice (semi-join prune + query attach).
    Returns (query_id, doc_id, score, n_terms_hit, rank) with
    ``rank <= k``; ``score`` is rounded to 6 decimals and ``rank``
    breaks score ties on ascending doc id, so the result is
    deterministic under any partitioning.

    Scale shape: one shuffle on (doc, term) postings restricted to
    query terms, one tiny df-per-term aggregate, one shuffle on
    (query, doc) partials, then a TWO-PHASE top-k (per-bucket partial
    window at defaultParallelism, final window over <= k * n_buckets
    survivors per query) so few-query/huge-corpus workloads never
    funnel the scored corpus through #queries partitions. Skewed
    stop-word-like query terms fan out across partitions in the
    posting aggregate's partial (map-side combine) phase.
    """
    qterms = queries.select(query_col, term_col)
    # One regex split per document: _dl derives from the same _toks
    # array (token_count(text) would re-split). Semantics identical to
    # functions.text.token_count incl. the empty-text -> 0 case.
    d = docs.select(
        F.col(id_col).alias("_doc"),
        F.col(text_col).alias("_text"),
        tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "_doc",
        F.when(F.length(F.trim("_text")) == 0, F.lit(0))
        .otherwise(F.size("_toks"))
        .alias("_dl"),
        "_toks",
    )

    # N and sum(dl) in one pass; avgdl stays an exact integer ratio.
    stats = d.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.sum("_dl").alias("_sum_dl"),
    )

    # Postings restricted to query terms BEFORE the (doc, term) agg.
    # Cached (lazily): the broadcast materialization of df_t below is
    # its own Spark job, so without the cache the corpus-wide
    # tokenize+explode+aggregate would run TWICE per query — measured
    # at ~2x the whole operator's cost on a 500k-doc corpus
    # (BENCH/retrieval_scale.json). The cached set is the PRUNED
    # posting list (query terms only), not the corpus.
    tf = (
        d.select("_doc", "_dl", F.explode("_toks").alias("_term"))
        .join(
            F.broadcast(qterms.select(F.col(term_col).alias("_term")).distinct()),
            "_term",
            "left_semi",
        )
        .groupBy("_doc", "_dl", "_term")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .cache()
    )

    # Document frequency per query term: at most |distinct terms| rows
    # (tf is already one row per (doc, term), so a plain count is the
    # distinct-doc count without an Expand pass).
    df_t = tf.groupBy("_term").agg(F.count(F.lit(1)).alias("_df"))

    n = F.col("_n_docs").cast("double")
    avgdl = F.col("_sum_dl").cast("double") / F.col("_n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (n - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    w = idf * (
        F.col("_tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("_tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / avgdl)
        )
    )

    scored = (
        tf.join(F.broadcast(df_t), "_term")
        .crossJoin(F.broadcast(stats))
        .withColumn("_w", w)
        .join(
            F.broadcast(qterms.withColumnRenamed(term_col, "_term")),
            "_term",
        )
        .groupBy(query_col, "_doc")
        .agg(
            F.round(F.sum("_w"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )

    # Two-phase top-k: a single per-query window has parallelism =
    # #queries — at web scale each query partition would hold the whole
    # scored corpus. Phase 1 keeps the top-k of each deterministic
    # doc-hash bucket (parallelism = defaultParallelism), phase 2 ranks
    # the surviving <= k * n_buckets rows per query. Every bucket
    # contributes its own best k, so the global top-k is a subset of
    # the survivors and the result is EXACTLY the single-window answer
    # for any bucket count (ties break on doc id in both phases).
    n_buckets = max(docs.sparkSession.sparkContext.defaultParallelism, 1)
    bucket = F.pmod(F.xxhash64(F.col("_doc")), F.lit(n_buckets))
    w1 = Window.partitionBy(query_col, "_bkt").orderBy(
        F.col("score").desc(), F.col("_doc").asc()
    )
    survivors = (
        scored.withColumn("_bkt", bucket)
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_bkt", "_r1")
    )
    rank_w = Window.partitionBy(query_col).orderBy(
        F.col("score").desc(), F.col("_doc").asc()
    )
    return (
        survivors.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= k)
        .select(
            query_col,
            F.col("_doc").alias(id_col),
            "score",
            "n_terms_hit",
            "rank",
        )
    )


def cell_term_profile(
    df: DataFrame,
    *,
    cell_col: str = "tile_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k distinctive terms per DGGS cell — the graft's two halves
    (rHEALPix tiling x web text) in one aggregate: treat each cell as
    one "document" whose text is every page geotagged inside it, and
    rank that cell's terms by tf x BM25-style idf
    ``tf * ln(1 + ((n_cells - df) + 0.5)/(df + 0.5))`` where ``df`` is
    the number of DISTINCT cells containing the term. The reference
    repo has no text surface; this is an engine-level operator
    (SURVEY.md §2.7 family) for "what is written about each place"
    crawl analyses.

    ``df`` must expose (``cell_col``, ``text_col``) — one row per
    page, already encoded (e.g. ``rhp_encode`` prefix). Returns
    (cell, rank, term, tf, df_cells, score) with ``rank <= k``;
    ``score`` rounds to 6 decimals BEFORE ranking and ties break on
    ascending term, so the result is deterministic under any
    partitioning and bit-reproducible against the SQL twin.

    Scale shape: one shuffle for the (cell, term) count with map-side
    combine (the exploded token stream never shuffles raw — partial
    counts do), one vocabulary-sized (term -> df) aggregate REUSED
    from that output, joined back on term WITHOUT a broadcast hint —
    at web scale the vocabulary exceeds broadcast size, so the plan
    must stay a shuffle join (AQE upgrades it to broadcast when small);
    the 1-row n_cells side is a literal-feed crossJoin. The final
    window partitions by CELL — millions of partitions at scale, no
    few-partition funnel (unlike bm25_topk's few-queries case, no
    two-phase pass is needed)."""
    toks = df.select(
        F.col(cell_col).alias("_cell"),
        F.explode(tokens(F.col(text_col))).alias("_term"),
    ).where(F.length("_term") > 0)
    tf = toks.groupBy("_cell", "_term").agg(F.count(F.lit(1)).alias("tf"))
    # df = distinct-cell count per term: tf is already one row per
    # (cell, term), so a plain count avoids an Expand pass.
    dft = tf.groupBy("_term").agg(F.count(F.lit(1)).alias("df_cells"))
    ncells = tf.select("_cell").distinct().agg(
        F.count(F.lit(1)).alias("_n_cells")
    )
    idf = F.log(
        F.lit(1.0)
        + ((F.col("_n_cells").cast("double") - F.col("df_cells")) + F.lit(0.5))
        / (F.col("df_cells") + F.lit(0.5))
    )
    scored = (
        tf.join(dft, "_term")
        .crossJoin(F.broadcast(ncells))
        .withColumn("score", F.round(F.col("tf") * idf, 6))
    )
    w = Window.partitionBy("_cell").orderBy(
        F.col("score").desc(), F.col("_term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("_cell").alias(cell_col),
            "rank",
            F.col("_term").alias("term"),
            "tf",
            "df_cells",
            "score",
        )
    )
