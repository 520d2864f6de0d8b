"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, fingerprinting.

No reference counterpart (OpenMatch assumes pre-filtered corpora); these are
the document-quality ops a web-scale pipeline runs between crawl and index.
All-but-fingerprint are pure column expressions (whole-stage codegen, SQL
cross-checkable); the winnowing fingerprint is a vectorized pandas UDF.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from openmatch_spark.analysis import tokenize_col

# Tiny per-language stopword profiles (heuristic n-gram/stopword language ID).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "a"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "pour", "une", "que"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "en", "un", "por"],
}


def token_count_col(text: Column, analyzer: str = "simple") -> Column:
    return F.size(tokenize_col(text, analyzer))


def token_counts(corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_unique_tokens, n_chars)."""
    toks = tokenize_col(F.col(text_col), "simple")
    return corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


def _stopword_ratio(toks: Column, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(words, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def language_id(corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, confidence): stopword-profile language ID.

    Greatest stopword-hit ratio wins; ties and all-zero -> 'und'. Pure column
    algebra (no UDF), identical semantics in the DuckDB oracle.
    """
    toks = tokenize_col(F.col(text_col), "simple")
    d = corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        *[_stopword_ratio(toks, lang).alias(f"r_{lang}") for lang in STOPWORDS],
    )
    best = F.greatest(*[F.col(f"r_{lang}") for lang in STOPWORDS])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in STOPWORDS:  # first-match order is fixed dict order
        pred = pred.when(F.col(f"r_{lang}") == best, F.lit(lang))
    return d.select(
        "doc_id",
        pred.alias("pred_lang"),
        F.round(best, 6).alias("confidence"),
    )


def quality_scores(corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, mean_token_len, punct_ratio, stopword_ratio,
    unique_ratio, quality): composite [0,1] heuristic quality score.

    Components mirror common web-text filters (C4/Gopher-style): doc length,
    alphabetic density, stopword presence, vocabulary diversity.
    """
    toks = tokenize_col(F.col(text_col), "simple")
    d = corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).alias("_text"),
        toks.alias("_toks"),
    ).select(
        "doc_id",
        F.size("_toks").alias("n_tokens"),
        (
            F.length(F.concat_ws("", "_toks")) / F.greatest(F.size("_toks"), F.lit(1))
        ).alias("mean_token_len"),
        (
            (F.length("_text") - F.length(F.regexp_replace("_text", r"[^A-Za-z0-9 ]", "")))
            / F.greatest(F.length("_text"), F.lit(1))
        ).alias("punct_ratio"),
        _stopword_ratio(F.col("_toks"), "en").alias("stopword_ratio"),
        (
            F.size(F.array_distinct("_toks")) / F.greatest(F.size("_toks"), F.lit(1))
        ).alias("unique_ratio"),
    )
    quality = (
        F.least(F.col("n_tokens") / 50.0, F.lit(1.0)) * 0.25
        + (1.0 - F.least(F.col("punct_ratio") * 4.0, F.lit(1.0))) * 0.25
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.25
        + F.col("unique_ratio") * 0.25
    )
    return d.select(
        "doc_id",
        "n_tokens",
        F.round("mean_token_len", 6).alias("mean_token_len"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("unique_ratio", 6).alias("unique_ratio"),
        F.round(quality, 6).alias("quality"),
    )


@pandas_udf(ArrayType(LongType()))
def winnow_fingerprint_udf(terms: pd.Series) -> pd.Series:
    """Winnowing document fingerprint (Schleimer et al. 2003): rolling hashes
    of 5-gram shingles, window-4 minima, distinct sorted selection."""
    import hashlib

    K, W = 5, 4

    def one(tl):
        if tl is None or len(tl) < K:
            return []
        hs = [
            int.from_bytes(
                hashlib.md5(" ".join(tl[i : i + K]).encode()).digest()[:8], "big"
            )
            >> 1  # keep positive in int64
            for i in range(len(tl) - K + 1)
        ]
        picks = set()
        for i in range(max(len(hs) - W + 1, 1)):
            win = hs[i : i + W]
            picks.add(min(win))
        return sorted(picks)

    return pd.Series([one(t) for t in terms])


def fingerprints(corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 analyzer: str = "simple") -> DataFrame:
    """(doc_id, fingerprint array<long>) winnowing sketches."""
    return corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        winnow_fingerprint_udf(tokenize_col(F.col(text_col), analyzer)).alias("fingerprint"),
    )
