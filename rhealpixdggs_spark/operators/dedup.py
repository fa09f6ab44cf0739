"""Deduplication operators for web-scale document tables.

Exact (hash-groupBy), n-gram Jaccard, MinHash+LSH banding, SimHash —
each as a DataFrame planner built on JVM-side expressions. Python
never touches a row; signatures and buckets are computed with
explode/groupBy/bitwise column math so the shuffle keys (band hashes,
simhash prefixes) are what Spark partitions on at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..functions.text import fingerprint, token_spans, tokens, word_ngrams

# Mersenne prime modulus for the minhash family h_i(x) = (a_i*x+b_i) % P.
# 2^31-1 keeps a*h below 2^62 so ANSI int64 arithmetic cannot overflow.
_MINHASH_P = (1 << 31) - 1


def md5_hash64(col) -> F.Column:
    """Portable 60-bit hash: top 15 hex chars of md5, parsed base-16.

    Bit-identical in any ANSI engine — DuckDB computes the same value as
    ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`` — which is what the
    driver's SQL oracles use to value-check minhash/simhash signatures.
    Slower than xxhash64 (md5 + string conv), so it is only the oracle
    hash; the default scale path stays xxhash64.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _hash64(col, hash_fn: str) -> F.Column:
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "md5":
        return md5_hash64(col)
    raise ValueError(f"unknown hash_fn {hash_fn!r} (use 'xxhash64' or 'md5')")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", keep: str = "min"
) -> DataFrame:
    """Keep one representative per byte-identical text (md5 key).
    Returns the survivors with a dup_count column. Two-stage agg —
    partial map-side combine on the hash — no row comparison."""
    keyed = df.withColumn("_fp", fingerprint(F.col(text_col)))
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    winners = keyed.groupBy("_fp").agg(
        agg.alias(id_col), F.count(F.lit(1)).alias("dup_count")
    )
    return (
        keyed.drop("dup_count")
        .join(winners.select("_fp", id_col, "dup_count"), ["_fp", id_col])
        .drop("_fp")
    )


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical documents (size >= 2): fingerprint,
    group size, member ids."""
    return (
        df.withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.sort_array(F.collect_list(id_col)).alias("members"),
        )
        .where(F.col("dup_count") >= 2)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All-pairs word-n-gram Jaccard above threshold.

    Exact but O(n^2) in candidate pairs — intended for verification and
    for re-ranking candidates out of minhash_lsh_candidates at scale.
    The distinct-ngram arrays are precomputed once per side.
    """
    grams = df.select(
        F.col(id_col), F.array_distinct(word_ngrams(F.col(text_col), n)).alias("g")
    )
    a = grams.select(F.col(id_col).alias("id_a"), F.col("g").alias("g_a"))
    b = grams.select(F.col(id_col).alias("id_b"), F.col("g").alias("g_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.size(F.array_union("g_a", "g_b"))
    return (
        pairs.withColumn("jaccard", F.round(inter / union, 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 64,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per document: shingle -> 64-bit hash -> family
    of (a*h+b) % P minima, all as column expressions (explode + groupBy
    min, map-side partial agg). hash_fn='md5' picks the portable hash
    the SQL oracle can recompute."""
    import random

    rnd = random.Random(seed)
    coeffs = [(rnd.randrange(1, _MINHASH_P), rnd.randrange(0, _MINHASH_P)) for _ in range(num_hashes)]
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), shingle_n))).alias("_s"),
    ).withColumn("_h", F.pmod(_hash64(F.col("_s"), hash_fn), F.lit(_MINHASH_P)))
    mins = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(_MINHASH_P)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return sh.groupBy(id_col).agg(*mins)


def minhash_lsh_candidates(
    df: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding: hash each band
    of the signature, self-join on (band, band_hash). The join key is
    the band hash — the classic shuffle-friendly near-dup plan."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, num_hashes, shingle_n, text_col, id_col, seed, hash_fn)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        if hash_fn == "md5":
            bh = md5_hash64(F.concat_ws("|", *[c.cast("string") for c in cols]))
        else:
            bh = F.xxhash64(*cols)
        band_cols.append(F.struct(F.lit(b).alias("band"), bh.alias("bh")))
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a = buckets.select(F.col(id_col).alias("id_a"), "band", "bh")
    b2 = buckets.select(F.col(id_col).alias("id_b"), "band", "bh")
    return (
        a.join(b2, ["band", "bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash(
    df: DataFrame,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash per document: per-token 64-bit hash, sum of +/-1 votes
    per bit, sign -> bit. 'bits' bitwise aggregates, all JVM-side."""
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("_t")
    ).withColumn("_h", _hash64(F.col("_t"), hash_fn))
    votes = [
        F.sum(
            F.when(F.col("_h").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
        ).alias(f"v_{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(F.col(f"v_{i}") > 0, F.lit(1 << i)).otherwise(0)
    return agg.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    bits: int = 32,
    blocks: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash: block the signature into `blocks`
    chunks (pigeonhole: any pair within max_hamming < blocks shares at
    least one exact block), equi-join per block, verify Hamming
    distance with bit_count."""
    sig = simhash(df, bits, text_col, id_col, hash_fn)
    width = bits // blocks
    mask = (1 << width) - 1
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright("simhash", i * width).bitwiseAND(F.lit(mask)).alias("bv"),
            )
            for i in range(blocks)
        ]
    )
    keyed = sig.select(id_col, "simhash", F.explode(chunks).alias("c")).select(
        id_col, "simhash", F.col("c.blk").alias("blk"), F.col("c.bv").alias("bv")
    )
    a = keyed.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "blk", "bv")
    b = keyed.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "blk", "bv")
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["blk", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_near_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, EXACT ALL-PAIRS — a
    verification / small-table tool (the non-equi `id_a < id_b` join
    is a nested loop at scale). The 100-TB pair-enumeration path is
    :func:`embedding_near_pairs_lsh` (banded random-projection
    buckets, equi-join shuffle keys)."""
    from .similarity import cosine_expr

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos", F.round(cosine_expr(F.col("v_a"), F.col("v_b")), 6))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def embedding_near_pairs_lsh(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_bits: int = 16,
    bands: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIR ENUMERATION at scale
    (VERDICT r4 item 1): signed-random-projection band keys ->
    band-hash equi-join -> within-bucket candidate pairs -> exact
    cosine re-rank, the same banding plan as
    :func:`minhash_lsh_candidates` — every join in the plan is an
    equi-join (shuffle keys `(band, key)` then `id`), NO nested-loop
    / cartesian stage anywhere, so the plan survives 100 TB.

    Banding math: `n_bits` seeded hyperplanes (the shared
    `similarity._hyperplanes` family) are split into `bands` bands of
    r = n_bits/bands sign bits. Two vectors at angle theta share one
    bit with p = 1 - theta/pi, a band with p^r, and at least one band
    with 1 - (1-p^r)^bands: for cos >= 0.95 (theta <= 18deg, p ~ .90)
    the 16/4 defaults give ~98.6% recall per pair; exact-direction
    duplicates (cos 1.0) share every band and are never missed.

    Cost shape: the bucket self-join carries only (id, band, key) —
    8-byte keys, vectors stay home; candidates join back to the
    vectors by id for the exact re-rank, so vector bytes are shuffled
    only for candidate ids, proportional to matches not to rows.
    Output: (id_a, id_b, cos) — a SUBSET of embedding_near_pairs
    (candidates only), identical on exact duplicates."""
    from .similarity import _hyperplanes, cosine_expr, rp_bucket_expr

    assert n_bits % bands == 0, "n_bits must split evenly into bands"
    r = n_bits // bands
    planes = _hyperplanes(dim, n_bits, seed)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            rp_bucket_expr(
                F.col(vec_col), planes[b * r : (b + 1) * r]
            ).alias("key"),
        )
        for b in range(bands)
    ]
    buckets = emb.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))
    a = buckets.select(F.col(id_col).alias("id_a"), "band", "key")
    b2 = buckets.select(F.col(id_col).alias("id_b"), "band", "key")
    cand = (
        a.join(b2, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", F.round(cosine_expr(F.col("v_a"), F.col("v_b")), 6))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def semantic_dedup(
    emb: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with a coarse quantizer,
    then inside each cluster prune every vector whose cosine to ANY
    higher-ranked cluster member reaches `threshold`. Rank within a
    cluster is (cosine-to-centroid ASC, id ASC) — the member farthest
    from the centroid is kept first, matching the paper's
    keep-low-centroid-similarity policy; exact scaled duplicates tie
    on centroid cosine and break to the lower id.

    Plan shape, chosen for 100 TB: assignment is the JVM argmax over
    broadcast centroid literals (similarity.ivf_assign_expr — the
    same coarse quantizer as IVF search, so one codebook serves both
    retrieval and dedup); the only shuffle keys are `cluster` (rank
    window + candidate self-join) and `id` (vector re-attach). The
    within-cluster pair stage is an EQUI-join on cluster — quadratic
    only in cluster size, which the operator of a 100-TB corpus
    bounds by scaling k with N (SemDeDup uses k ~ sqrt(N); Lloyd
    training via similarity.ivf_train). No nested-loop / cartesian
    stage anywhere (plan-pinned in tests/test_plan_shapes.py).

    Returns one row per input vector:
    (id, cluster, ccos, c_rank, max_prior_cos, keep) where
    `max_prior_cos` is NULL for each cluster's rank-1 member and
    `keep = max_prior_cos is null or max_prior_cos < threshold`.
    """
    from .similarity import cosine_expr, ivf_assign_expr, norm_expr, _lit_arr

    v = emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn("cluster", ivf_assign_expr(F.col("v"), centroids))
    # cosine to the assigned centroid: pick the assigned centroid's
    # dot/norm out of literal arrays (no second pass, no UDF)
    dots = F.array(*[cosine_expr(F.col("v"), _lit_arr(c)) for c in centroids])
    v = v.withColumn("ccos", F.element_at(dots, F.col("cluster") + 1))
    w = Window.partitionBy("cluster").orderBy(F.asc("ccos"), F.asc("id"))
    ranked = v.withColumn("c_rank", F.row_number().over(w))
    a = ranked.select("id", "cluster", F.col("c_rank").alias("rank_a"), "v")
    b = ranked.select(
        F.col("id").alias("id_b"),
        "cluster",
        F.col("c_rank").alias("rank_b"),
        F.col("v").alias("v_b"),
    )
    prior = (
        a.join(b, "cluster")
        .where(F.col("rank_b") < F.col("rank_a"))
        .groupBy("id")
        .agg(F.max(cosine_expr(F.col("v"), F.col("v_b"))).alias("mpc"))
    )
    out = ranked.join(prior, "id", "left")
    return out.select(
        "id",
        "cluster",
        F.round("ccos", 6).alias("ccos"),
        "c_rank",
        F.round("mpc", 6).alias("max_prior_cos"),
        (F.col("mpc").isNull() | (F.col("mpc") < threshold)).alias("keep"),
    )


def duplicated_spans(
    df: DataFrame,
    width: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    shuffle_key: str = "text",
    max_ids: int | None = None,
) -> DataFrame:
    """Cross-document duplicated-span catalog — the exact-substring
    dedup pattern (find every width-token window that occurs verbatim
    in >= min_docs distinct documents; excising those windows is how
    training corpora drop boilerplate and syndicated text).

    Plan shape, chosen for 100 TB: tokenize -> one-pass zip_with
    sliding windows (linear in tokens; no quadratic slicing) ->
    explode -> per-(span, doc) partial count (map-side combine folds
    within-doc repeats BEFORE the wide shuffle) -> hash-agg on the
    span alone. Both exchanges are keyed by the span (uniformly
    distributed; no skew), and the wide one carries at most one row
    per (distinct span, doc) — not one per occurrence. The catalog
    joins back to the corpus on ``span_fp`` for excision.

    shuffle_key='text' groups on the span text itself (oracle-exact,
    SQL-reproducible). shuffle_key='xxhash64' is the scale variant:
    both aggregations key on the 8-byte xxhash64 of the span instead
    of the ~width*6-byte text, shrinking shuffle keys and hash-table
    probes; the span text rides along as a min() payload. Identical
    output barring xxhash64 collisions.

    max_ids bounds the doc_ids member list to the sorted prefix. At
    corpus scale a boilerplate span can occur in millions of documents
    — an unbounded collect_list is a per-group OOM. The cap is
    enforced BEFORE collection (window row_number over the same span
    key — no extra exchange; counts come from window aggregates over
    the uncapped partition), so per-group state is O(max_ids); full
    membership stays recoverable by joining back on span_fp.

    Output: span_fp (portable md5 key), span, n_docs, n_occ (total
    occurrences incl. within-doc repeats), doc_ids (sorted, joined).
    """
    from ..functions.text import token_spans

    spans = df.select(
        F.col(id_col), F.explode(token_spans(F.col(text_col), width)).alias("span")
    )
    if shuffle_key == "xxhash64":
        keyed = spans.select(F.xxhash64("span").alias("_k"), "span", id_col)
        occ = keyed.groupBy("_k", id_col).agg(
            F.count(F.lit(1)).alias("occ"), F.min("span").alias("span")
        )
        key = "_k"
        span_agg = [F.min("span").alias("span")]
    elif shuffle_key == "text":
        occ = spans.groupBy("span", id_col).agg(F.count(F.lit(1)).alias("occ"))
        key = "span"
        span_agg = []
    else:
        raise ValueError(
            f"unknown shuffle_key {shuffle_key!r} (use 'text' or 'xxhash64')"
        )
    if max_ids is None:
        count_aggs = [
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("occ").cast("long").alias("n_occ"),
        ]
    else:
        # counts from window aggregates over the UNCAPPED span group,
        # then keep only the first max_ids member rows for collection.
        w = Window.partitionBy(key)
        occ = (
            occ.withColumn("_nd", F.count(F.lit(1)).over(w))
            .withColumn("_no", F.sum("occ").over(w))
            .withColumn("_rn", F.row_number().over(w.orderBy(id_col)))
            .where(F.col("_rn") <= max_ids)
        )
        count_aggs = [
            F.min("_nd").alias("n_docs"),
            F.min("_no").cast("long").alias("n_occ"),
        ]
    return (
        occ.groupBy(key)
        .agg(
            *span_agg,
            *count_aggs,
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(id_col)),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("doc_ids"),
        )
        .where(F.col("n_docs") >= min_docs)
        .select(
            F.md5("span").alias("span_fp"), "span", "n_docs", "n_occ", "doc_ids"
        )
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Connected components over the candidate-pair graph — the step
    that turns LSH/simhash pair lists into dedup clusters so a
    pipeline can keep ONE document per component.

    Iterative min-label propagation: every vertex starts labeled with
    its own id; each round every vertex takes the minimum of its own
    and its neighbors' labels; fixpoint = each vertex holds the
    minimum id reachable in its component. Converges in O(graph
    diameter) rounds — near-dup clusters are dense (diameter 2-4), so
    a handful of rounds suffice even at 1e12 documents. Each round is
    one equi-join on the destination id plus one min-aggregation, both
    shuffling on the vertex id; ``localCheckpoint`` every few rounds
    bounds plan lineage exactly like the adaptive kNN loop (see
    joins.knn_join_rings_adaptive for the executor-loss trade-off and
    the reliable-checkpoint alternative).

    Returns (id, component); vertices appear iff they occur in a pair
    (singleton documents are their own implicit component).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for i in range(max_iter):
        nbr = edges.join(labels, edges["dst"] == labels["id"]).select(
            edges["src"].alias("id"), "label"
        )
        new_labels = (
            labels.union(nbr).groupBy("id").agg(F.min("label").alias("label"))
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def near_dedup_filter(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Drop every near-duplicate except its cluster's canonical
    (minimum-id) document: connected components over the candidate
    pairs, then a left_anti join of the corpus against the
    non-canonical member ids. The anti join broadcasts when the drop
    list is small (the common case: dup clusters are a few percent of
    the corpus) and shuffles on id otherwise — either way the full
    corpus passes through exactly once."""
    cc = connected_components(pairs, id_a=id_a, id_b=id_b, max_iter=max_iter)
    drop = cc.where(F.col("id") != F.col("label")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")


def contamination_report(
    train: DataFrame,
    evals: DataFrame,
    width: int = 8,
    train_text: str = "text",
    eval_text: str = "text",
    train_id: str = "doc_id",
    eval_id: str = "eval_id",
) -> DataFrame:
    """Eval-set decontamination audit: for each evaluation document,
    the fraction of its width-token spans that occur verbatim anywhere
    in the training corpus, and how many distinct training documents
    share at least one span. Running this (and excising hits) before
    training is how corpora avoid benchmark leakage.

    Plan shape: both sides tokenize to DISTINCT per-doc spans
    (map-side, linear zip_with windows), then one equi-join keyed on
    the span — uniformly distributed, no skew — and a per-eval-doc
    count-distinct aggregation. The train side never aggregates
    globally: at 1e12 training docs the join streams span partitions.
    Eval documents shorter than ``width`` tokens have no spans and
    yield no row.
    """
    tspans = train.select(
        F.col(train_id).alias("tid"),
        F.explode(
            F.array_distinct(token_spans(F.col(train_text), width))
        ).alias("span"),
    )
    espans = evals.select(
        F.col(eval_id),
        F.explode(
            F.array_distinct(token_spans(F.col(eval_text), width))
        ).alias("span"),
    )
    totals = espans.groupBy(eval_id).agg(F.count(F.lit(1)).alias("n_spans"))
    hits = (
        espans.join(tspans, "span")
        .groupBy(eval_id)
        .agg(
            F.countDistinct("span").alias("n_contaminated"),
            F.countDistinct("tid").alias("n_train_docs"),
        )
    )
    joined = totals.join(hits, eval_id, "left").na.fill(
        0, ["n_contaminated", "n_train_docs"]
    )
    return joined.select(
        eval_id,
        "n_spans",
        "n_contaminated",
        (
            F.round(F.col("n_contaminated") / F.col("n_spans"), 6) + F.lit(0.0)
        ).alias("contamination"),
        "n_train_docs",
    )
