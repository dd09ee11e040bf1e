"""Text-analysis operators for training-data pipelines (graft
first-class components): language ID, quality scoring, token counting,
document fingerprinting. All pure column expressions — JVM-side,
SQL-replayable, no Python.

The `documents` table shape: (doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small, fixed stopword inventories — a deterministic n-gram/stopword
# heuristic, not a model (the container has no langid libs; the
# heuristic is the documented operator contract).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sich"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
    "es": ("el", "la", "los", "que", "y", "es", "una", "por", "con", "para"),
}

_TOKEN_SPLIT = r"[^a-zA-Z0-9']+"


def tokens(text: Column) -> Column:
    """Lowercased word tokens (whitespace+punct split, drops empties)."""
    return F.filter(
        F.split(F.lower(text), _TOKEN_SPLIT), lambda t: F.length(t) > 0
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-flavoured proxy: word pieces of <=4 chars — ceil(len/4)
    summed over word tokens. Deterministic, SQL-replayable."""
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long"),
    )


def stopword_count(text: Column, lang: str) -> Column:
    words = LANG_STOPWORDS[lang]
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words)))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax stopword hits across the
    inventories, 'und' (undetermined) when no stopwords hit."""
    counts = [(lang, stopword_count(text, lang)) for lang in LANG_STOPWORDS]
    best = F.greatest(*[c for _, c in counts])
    expr = F.lit("und")
    # iterate reversed so earlier languages win ties (en > de > fr > es)
    for lang, c in reversed(counts):
        expr = F.when((best > 0) & (c == best), F.lit(lang)).otherwise(expr)
    return expr


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword ratio features, rounded to 6 dp
    so cross-engine float hashing is stable."""
    n = F.length(text).cast("double")
    alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", "")).cast("double")
    digit = F.length(F.regexp_replace(text, r"[^0-9]", "")).cast("double")
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).cast("double")
    toks = token_count(text).cast("double")
    stop_en = stopword_count(text, "en").cast("double")
    safe_n = F.when(n > 0, n).otherwise(F.lit(1.0))
    safe_toks = F.when(toks > 0, toks).otherwise(F.lit(1.0))
    return {
        "n_chars": n.cast("long"),
        "n_tokens": toks.cast("long"),
        "alpha_ratio": F.round(alpha / safe_n, 6),
        "digit_ratio": F.round(digit / safe_n, 6),
        "punct_ratio": F.round(punct / safe_n, 6),
        "stopword_ratio": F.round(stop_en / safe_toks, 6),
        "mean_token_len": F.round(alpha / safe_toks, 6),
    }


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,100] (integer — hash-stable):
    rewards alpha content and English stopword presence, penalises
    digit/punct noise and degenerate token lengths."""
    f = quality_features(text)
    raw = (
        F.lit(40.0) * f["alpha_ratio"]
        + F.lit(30.0) * F.least(f["stopword_ratio"] * 2, F.lit(1.0))
        + F.lit(15.0) * F.when(f["mean_token_len"].between(3.0, 9.0), 1.0).otherwise(0.0)
        + F.lit(15.0) * (1.0 - F.least(f["digit_ratio"] * 5, F.lit(1.0)))
    )
    return F.round(raw).cast("int")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalised, lowercased
    text — the exact-dedup key. (A rolling/winnowing variant lives in
    dedup.simhash for near-dup.)"""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def analyze_documents(documents: DataFrame) -> DataFrame:
    t = F.col("text")
    feats = quality_features(t)
    return documents.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        lang_id(t).alias("lang_guess"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fp"),
        *[c.alias(k) for k, c in feats.items() if k not in ("n_chars", "n_tokens")],
    )


def word_ngrams(text: Column, n: int = 2) -> Column:
    """All word n-grams in order (duplicates kept — counting needs
    occurrences, unlike dedup's distinct shingles). Built as arrays_zip
    of n shifted slices: the naive transform(sequence(...), slice)
    form re-evaluates the whole tokenise pipeline per element (see
    dedup.shingles)."""
    toks = tokens(text)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    parts = [F.slice(toks, i + 1, m) for i in range(n)]
    zipped = F.arrays_zip(*parts)
    return F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
    )


def ngram_counts(
    documents: DataFrame, n: int = 2, min_count: int = 2, text_col: str = "text"
) -> DataFrame:
    """Corpus n-gram occurrence counts (LM training-data prep).

    Plan: explode n-grams -> groupBy(ngram) count. The aggregation
    partially combines map-side, so the shuffle carries one row per
    (partition, distinct ngram) — the right shape for a 10^12-doc
    corpus; min_count prunes the long tail AFTER the agg (it cannot be
    pushed below it). Output: (ngram, n).
    """
    return (
        documents.select(F.explode(word_ngrams(F.col(text_col), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )


def tfidf_top_terms(
    documents: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    tf = term count within the doc; idf = ln((N+1)/(df+1)) + 1
    (smoothed); score rounded to 6 dp BEFORE ranking so cross-engine
    ties break identically (then by term asc).

    Plan: one explode -> groupBy(doc, term) for tf (map-side combine);
    df by a second agg over the tf table (no re-scan of the corpus);
    N via a broadcast scalar; rank window partitioned by doc.
    Output: (doc_id, term, rank, score_ppm).
    """
    from pyspark.sql import Window

    tf = (
        documents.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "term",
            F.col("rank").cast("int").alias("rank"),
            F.round(F.col("score") * 1e6).cast("long").alias("score_ppm"),
        )
    )
