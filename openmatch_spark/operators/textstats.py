"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, fingerprinting.

No reference counterpart (OpenMatch assumes pre-filtered corpora); these are
the document-quality ops a web-scale pipeline runs between crawl and index.
Everything here — fingerprinting included — is pure column expressions
(whole-stage codegen, SQL cross-checkable); no Python in any hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

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


def pred_lang_col(text: Column) -> Column:
    """Per-row language verdict as ONE Column expression (same semantics as
    language_id). Exists so compositions like curate_corpus can attach the
    verdict in a projection — no join, no shuffle, one codegen pass."""
    toks = tokenize_col(text, "simple")
    ratios = {lang: _stopword_ratio(toks, lang) for lang in STOPWORDS}
    best = F.greatest(*ratios.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang, r in ratios.items():  # first-match order is fixed dict order
        pred = pred.when(r == best, F.lit(lang))
    return pred


def quality_col(text: Column) -> Column:
    """The composite quality score as ONE Column expression — identical
    formula (and final 6-decimal rounding) to quality_scores."""
    toks = tokenize_col(text, "simple")
    n_tokens = F.size(toks)
    punct = (
        F.length(text) - F.length(F.regexp_replace(text, r"[^A-Za-z0-9 ]", ""))
    ) / F.greatest(F.length(text), F.lit(1))
    stop = _stopword_ratio(toks, "en")
    uniq = F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1))
    q = (
        F.least(n_tokens / 50.0, F.lit(1.0)) * 0.25
        + (1.0 - F.least(punct * 4.0, F.lit(1.0))) * 0.25
        + F.least(stop * 5.0, F.lit(1.0)) * 0.25
        + uniq * 0.25
    )
    return F.round(q, 6)


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


def _md5_prefix64(col: Column, shifted: bool = True) -> Column:
    """First 8 bytes of md5(col) as a big-endian integer, computed JVM-side
    from the hex digest via two 32-bit halves (a single conv() of 16 hex
    chars overflows signed int64). With shifted=True returns value >> 1
    (always positive in int64): v = hi*2^32 + lo, so v >> 1 == hi*2^31 +
    (lo >> 1) exactly. md5-based so the DuckDB oracle replicates it
    bit-for-bit (functions/hashing.py rationale).

    Collision note: the >>1 halves the space to 63 bits — for winnowing,
    P(any collision among g distinct grams) ~ g^2/2^64; even a 10^9-gram
    corpus stays ~5%-per-corpus for COSMETIC effects only (a fingerprint
    collision can merge two sketch entries, never corrupt ranking).
    Identical grams (adversarial boilerplate) hash identically by design —
    the winnow picks collapse to one hash; tests/test_round3.py pins that
    behavior against a pure-python oracle."""
    hx = F.md5(col)
    hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    if shifted:
        return hi * F.lit(2147483648) + F.shiftright(lo, 1)
    return hi, lo


def winnow_fingerprints(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    analyzer: str = "simple", k: int = 5, w: int = 4,
) -> DataFrame:
    """(doc_id, fp_hash) winnowing fingerprints (Schleimer et al. 2003),
    exploded one row per selected hash — pure JVM column algebra.

    k-gram md5 hashes (>>1, positive int64), then the minimum of every
    w-hash sliding window, distinct per doc. The window min runs as a
    rank-window over (doc_id, pos) — one shuffle keyed by doc_id; no Python
    in the path (the r1 per-row md5-loop pandas UDF is gone)."""
    toks = tokenize_col(F.col(text_col), analyzer)
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = corpus.select(
        F.col(id_col).cast("string").alias("doc_id"), grams.alias("grams")
    ).select(
        "doc_id",
        F.size("grams").alias("n_grams"),
        F.posexplode("grams").alias("pos", "gram"),
    )
    hashed = g.select(
        "doc_id", "n_grams", "pos", _md5_prefix64(F.col("gram")).alias("h")
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    # window STARTS are 0..max(n_grams-w, 0): every full window, plus one
    # clipped window covering everything when a doc has fewer than w grams
    return (
        hashed.withColumn("minh", F.min("h").over(win))
        .where(F.col("pos") <= F.greatest(F.col("n_grams") - w, F.lit(0)))
        .select("doc_id", F.col("minh").alias("fp_hash"))
        .distinct()
    )


def fingerprints(corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 analyzer: str = "simple", k: int = 5, w: int = 4) -> DataFrame:
    """(doc_id, fingerprint array<long>) winnowing sketches — array form of
    winnow_fingerprints; docs too short for any k-gram get an empty array."""
    picks = winnow_fingerprints(corpus, id_col, text_col, analyzer, k=k, w=w)
    agg = picks.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("fp_hash")).alias("fingerprint")
    )
    ids = corpus.select(F.col(id_col).cast("string").alias("doc_id"))
    return ids.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("fingerprint", F.array().cast("array<long>")).alias("fingerprint"),
    )
