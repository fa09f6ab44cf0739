"""Text-analysis column expressions for large-scale training-data
pipelines: token counting, quality scoring, language ID, document
fingerprinting.

All pure pyspark.sql.functions (JVM, whole-stage codegen) — no Python
in the hot path. Each has an ANSI-SQL twin in __spark_entry__.py's
oracle set so DuckDB can verify it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword lists for the language heuristic.
STOPWORDS_EN = ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"]
STOPWORDS_DE = ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"]
STOPWORDS_FR = ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"]
STOPWORDS_ES = ["el", "la", "los", "y", "es", "un", "una", "en", "para", "que"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(text), "\\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: split on word/number/punct boundaries
    (a cheap stand-in for a BPE tokenizer's piece count)."""
    parts = F.split(text, r"(?<=[a-z0-9])(?=[A-Z])|\s+|(?=[^A-Za-z0-9\s])")
    return F.size(F.filter(parts, lambda p: F.length(p) > 0))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        F.length(stripped) / F.length(text)
    )


def _stopword_hits(text: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(F.lower(text)), lambda t: F.array_contains(arr, t)))


def stopword_ratio(text: Column, words: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English) stopwords."""
    hits = _stopword_hits(text, words or STOPWORDS_EN)
    n = token_count(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n)


def quality_score(text: Column) -> Column:
    """Deterministic heuristic quality score in [0, 1]: rewards
    mid-length documents and prose-like punctuation/stopword rates."""
    n = token_count(text)
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4)
    stop_score = F.least(stopword_ratio(text) * 5, F.lit(1.0))
    return F.round((len_score * 0.4 + punct_pen * 0.3 + stop_score * 0.3), 6)


def lang_id(text: Column) -> Column:
    """n-gram-free language heuristic: highest stopword-hit count among
    {en, de, fr, es}, ties broken in that fixed order; 'und'
    (undetermined) when nothing hits."""
    en = _stopword_hits(text, STOPWORDS_EN)
    de = _stopword_hits(text, STOPWORDS_DE)
    fr = _stopword_hits(text, STOPWORDS_FR)
    es = _stopword_hits(text, STOPWORDS_ES)
    best = F.greatest(en, de, fr, es)
    return (
        F.when(best == 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(de == best, F.lit("de"))
        .when(fr == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint (md5 hex) — the exact-dedup
    key; identical builtin exists in DuckDB for the oracle."""
    return F.md5(text)


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Array of word n-grams (space-joined) for Jaccard similarity.

    Built with zip_with over shifted views of the token array (one pass,
    linear allocation) instead of per-index slice+concat (quadratic);
    zip_with truncates to the shorter side, yielding exactly
    size-n+1 grams. Documents shorter than n collapse to one gram."""
    toks = tokens(F.lower(text))
    grams = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.size(toks) - k)
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    # zip_with pads the shorter side with nulls; trim to size-n+1.
    grams = F.slice(grams, 1, F.size(toks) - (n - 1))
    return F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(grams)


# PII scrub patterns (C4-style). Written to the common subset of Java
# regex (Spark) and RE2 (DuckDB oracle): character classes + bounded
# quantifiers only, no lookaround, so both engines match identically.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def redact_pii(text: Column) -> Column:
    """Replace emails, phone-like digit runs, and IPv4 literals with
    typed placeholder tokens — the standard scrub step before a web
    corpus becomes training data. Pure JVM regexp_replace chain (one
    codegen stage, no Python); emails are rewritten first so their
    digits can't be re-matched as phone numbers."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column) -> Column:
    """Struct of per-type PII match counts in the original text
    (n_email, n_phone, n_ipv4) — the audit metric a scrub job logs
    per partition. Counted on the raw text, sequentially-scrubbed the
    same way redact_pii rewrites, so counts and redaction agree."""
    fields = []
    cur = text
    for name, pat, repl in PII_PATTERNS:
        fields.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))).alias(
                f"n_{name}"
            )
        )
        cur = F.regexp_replace(cur, pat, repl)
    return F.struct(*fields)


def ngram_repetition(text: Column, n: int = 2) -> Column:
    """Gopher-style repetition-quality signals over word n-grams,
    returned as one struct (Rae et al. 2021, "Scaling Language Models",
    table A1 repetition filters):

    - ``top_frac``: characters covered by the single most-repeated
      n-gram (occurrences x gram length) over total n-gram characters.
    - ``dup_frac``: characters covered by all n-grams that occur more
      than once, over total n-gram characters.

    The maximum is taken over coverage (cnt*len), so no lexical
    tie-break is needed and the result is partition-order independent.
    Pure JVM expressions — no shuffle, no Python. Implementation is a
    SINGLE run-length aggregate over the sorted gram array: Spark
    evaluates higher-order lambdas interpreted with no common-subtree
    caching, so the naive transform(distinct, g -> filter(grams, ...))
    shape re-evaluates the whole n-gram chain once per distinct gram
    (~50x slower, measured); one sort + one linear scan avoids that."""
    grams = F.array_sort(word_ngrams(text, n))
    zero_l = F.lit(0).cast("long")
    zero = F.struct(
        F.lit("").alias("prev"),
        zero_l.alias("cnt"),
        zero_l.alias("top"),
        zero_l.alias("dup"),
        zero_l.alias("total"),
    )

    def _flushed(acc):
        """top/dup with the currently-open run folded in."""
        cover = acc["cnt"] * F.length(acc["prev"]).cast("long")
        top = F.greatest(acc["top"], cover)
        dup = acc["dup"] + F.when(acc["cnt"] > 1, cover).otherwise(zero_l)
        return top, dup

    def merge(acc, x):
        cont = (acc["cnt"] > 0) & (acc["prev"] == x)
        top, dup = _flushed(acc)
        return F.struct(
            x.alias("prev"),
            F.when(cont, acc["cnt"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("cnt"),
            F.when(cont, acc["top"]).otherwise(top).alias("top"),
            F.when(cont, acc["dup"]).otherwise(dup).alias("dup"),
            (acc["total"] + F.length(x)).cast("long").alias("total"),
        )

    def finish(acc):
        top, dup = _flushed(acc)
        total = acc["total"]

        def frac(num: Column) -> Column:
            return F.when(total == 0, F.lit(0.0)).otherwise(
                F.round(num / total, 6) + F.lit(0.0)
            )

        return F.struct(
            frac(top).alias("top_frac"), frac(dup).alias("dup_frac")
        )

    return F.aggregate(grams, zero, merge, finish)


def token_spans(text: Column, width: int) -> Column:
    """All width-token sliding spans of a document (stride 1), space-
    joined, lowercase. Unlike word_ngrams there is no short-document
    fallback: documents with fewer than ``width`` tokens yield an empty
    array — exact-substring dedup never matches on partial windows."""
    toks = tokens(F.lower(text))
    spans = toks
    for k in range(1, width):
        shifted = F.slice(toks, k + 1, F.size(toks) - k)
        spans = F.zip_with(spans, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    spans = F.slice(spans, 1, F.size(toks) - (width - 1))
    return F.when(
        F.size(toks) < width, F.array().cast("array<string>")
    ).otherwise(spans)


def classifier_weights(dim: int = 256, seed: int = 13) -> list[float]:
    """Deterministic stand-in weight vector for the hashed linear
    classifier — in production this is the trained model (a fastText
    / CCNet-style quality or language filter reduces to exactly this
    serving shape); the engine contract only needs the weights to be
    reproducible literals both engines can embed."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).tolist()


def hashed_linear_score(
    text: Column, weights: list[float], hash_fn: str = "md5"
) -> Column:
    """Serve a linear bag-of-hashed-ngrams text classifier (the
    fastText architecture that backs CCNet / RefinedWeb quality and
    language filters) as PURE column expressions: lowercase tokens +
    word bigrams -> portable 60-bit hash -> bucket = hash % len(
    weights) -> score = mean of the bucket weights. Everything stays
    in whole-stage codegen (transform/aggregate over the token array,
    weights as a literal array — model-sized, like the IVF codebook),
    so scoring 100 TB is one map-only pass fused into the scan; no
    UDF, no Python, no shuffle.

    The raw mean score is returned instead of its sigmoid: sigmoid is
    monotone (thresholding is equivalent) and exp() is libm-dependent,
    while +,*,/ make the score bit-reproducible for the DuckDB twin.
    hash_fn='md5' is the portable oracle hash (md5 top-15-hex, the
    dedup.md5_hash64 construction); 'xxhash64' is the scale default.
    Empty documents score 0.0."""
    d = len(weights)
    toks = tokens(F.lower(F.trim(text)))
    bigrams = F.when(
        F.size(toks) < 2, F.array().cast("array<string>")
    ).otherwise(
        F.slice(
            F.zip_with(
                toks,
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
            1,
            F.size(toks) - 1,
        )
    )
    feats = F.concat(toks, bigrams)
    if hash_fn == "md5":
        def h(c):
            return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    elif hash_fn == "xxhash64":
        h = F.xxhash64
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    w = F.array(*[F.lit(float(x)) for x in weights])
    ws = F.transform(
        feats,
        lambda f: F.element_at(w, F.pmod(h(f), F.lit(d)).cast("int") + 1),
    )
    total = F.aggregate(ws, F.lit(0.0), lambda acc, v: acc + v)
    n = F.size(feats)
    return F.when(
        F.length(F.trim(text)) == 0, F.lit(0.0)
    ).otherwise(total / n)
