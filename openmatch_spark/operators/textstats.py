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


# GPT-2-style pre-tokenizer, RE2-safe (no lookahead, ASCII classes so Java
# regex and DuckDB's RE2 segment identically): contractions, space-prefixed
# letter runs, digit runs, symbol runs. A cheap LLM-token-budget ESTIMATE —
# the segment count a BPE vocab would further split subword-wise — not a
# real merged-vocab tokenization (no model files in a pipeline hot path).
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_token_count_col(text: Column) -> Column:
    """Count of BPE-ish pre-tokenizer segments — pure JVM regexp, codegen."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def token_counts(corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_unique_tokens, n_bpe_tokens, n_chars):
    whitespace/punct word tokens plus the BPE-ish segment estimate."""
    toks = tokenize_col(F.col(text_col), "simple")
    return corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        bpe_token_count_col(F.col(text_col)).alias("n_bpe_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style document-quality gates (Rae et al. 2021 §A1.1, public
    heuristics) as pure column algebra — per-rule booleans plus an overall
    `gopher_pass`, one codegen pass over the scan, no UDF, every rule
    replicated in the DuckDB oracle:

      word count in [min_words, max_words]; mean word length in [3, 10];
      symbol-to-word ratio ('#' chars + '...' occurrences) <= 0.1; <= 90%
      of lines bullet-led; <= 30% of lines ellipsis-terminated; >= 80% of
      words contain an alphabetic char; >= 2 distinct Gopher stopwords.

    NULL text is treated as empty: without the coalesce, F.size over the
    null word array returns -1 (legacy sizeOfNull), so n_words would carry
    a -1 sentinel into downstream cutoff policies even though the boolean
    gates fail-safe (ADVICE r3).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(text, r"\s+"), lambda w: F.length(w) > 0)
    lines = F.split(text, "\n")
    n_words = F.size(words)
    denom_w = F.greatest(n_words, F.lit(1))
    mean_wlen = (
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)) / denom_w
    )
    n_hash = F.length(text) - F.length(F.translate(text, "#", ""))
    n_ellipsis = (
        F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))
    ) / 3
    symbol_ratio = (n_hash + n_ellipsis) / denom_w
    denom_l = F.greatest(F.size(lines), F.lit(1))
    bullet_ratio = (
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[•\-\*]"))) / denom_l
    )
    ellipsis_ratio = (
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"\.\.\.$"))) / denom_l
    )
    alpha_ratio = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / denom_w
    )
    stops = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stop_hits = F.size(
        F.array_intersect(F.array_distinct(F.transform(words, F.lower)), stops)
    )

    d = corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        stop_hits.cast("long").alias("stopword_hits"),
    )
    ok = {
        "ok_word_count": (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words),
        "ok_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "ok_symbol_ratio": F.col("symbol_ratio") <= max_symbol_ratio,
        "ok_bullet_ratio": F.col("bullet_ratio") <= max_bullet_ratio,
        "ok_ellipsis_ratio": F.col("ellipsis_ratio") <= max_ellipsis_ratio,
        "ok_alpha_words": F.col("alpha_word_ratio") >= min_alpha_word_ratio,
        "ok_stopwords": F.col("stopword_hits") >= min_stopword_hits,
    }
    for name, cond in ok.items():
        d = d.withColumn(name, F.coalesce(cond, F.lit(False)).cast("int"))
    gopher = None
    for name in ok:
        c = F.col(name) == 1
        gopher = c if gopher is None else (gopher & c)
    return d.withColumn("gopher_pass", gopher.cast("int"))


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


# conservative ASCII PII patterns, chosen to behave IDENTICALLY under Java
# regex (Spark) and RE2 (the DuckDB oracle): no lookaround, no unicode
# classes. The standard fast first-pass scrub (C4/Dolma-style) a
# pretraining pipeline runs ahead of any learned NER pass — NOT a
# compliance tool.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    # international-format only (+CC ...): bare national numbers are too
    # false-positive-prone for a regex pass
    "phone": r"\+\d{1,3}[ \-]?\(?\d{1,4}\)?(?:[ \-]?\d{2,4}){2,3}",
}


def redact_pii_col(text: Column, kinds: tuple[str, ...] = ("email", "ipv4", "phone")) -> Column:
    """Replace each PII match with a typed placeholder (<EMAIL>/<IP>/
    <PHONE>) — one codegen pass of chained global regexp_replace. Order is
    fixed (email, ipv4, phone) so outputs are deterministic regardless of
    the kinds tuple's order."""
    placeholders = {"email": "<EMAIL>", "ipv4": "<IP>", "phone": "<PHONE>"}
    out = text
    for kind in ("email", "ipv4", "phone"):
        if kind in kinds:
            out = F.regexp_replace(out, PII_PATTERNS[kind], placeholders[kind])
    return out


def pii_counts(corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, redacted): per-doc PII audit +
    the scrubbed text, for drop-vs-redact policy decisions downstream."""
    t = F.col(text_col)
    return corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PATTERNS["email"]), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PATTERNS["ipv4"]), 0)).cast("long").alias("n_ipv4"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PATTERNS["phone"]), 0)).cast("long").alias("n_phones"),
        redact_pii_col(t).alias("redacted"),
    )


def _top_gram_struct(toks: Column, n: int) -> Column:
    """struct(gram, cnt): the most frequent word n-gram, ties resolving to
    the lexicographically smallest — computed WITHOUT a shuffle.

    Max n-gram multiplicity == the longest equal run in the SORTED gram
    array, so one array_sort + one F.aggregate fold (acc carries prev/run/
    best/best-gram) replaces the r3 explode → groupBy(doc_id, gram) →
    window plan, which shuffled every bigram of the corpus once. Runs
    appear in ascending gram order, and the fold only replaces the champion
    on a STRICTLY longer run — identical tie-break to the old window's
    ORDER BY cnt DESC, gram ASC (equivalence pinned by pytest)."""
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sg = F.array_sort(grams)
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit("").alias("bestg"),
    )

    def step(acc, x):
        # tokens are non-empty, so no real gram equals zero's "" sentinel
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(run > acc["best"], run).otherwise(acc["best"]).alias("best"),
            F.when(run > acc["best"], x).otherwise(acc["bestg"]).alias("bestg"),
        )

    fin = F.aggregate(sg, zero, step)
    return F.struct(
        fin["bestg"].alias("gram"), fin["best"].cast("long").alias("cnt")
    )


def _dup_gram_chars(toks: Column, n: int) -> Column:
    """Character mass of duplicated word n-grams: sum over grams occurring
    MORE than once of count x gram length — the standard overlap-agnostic
    form of Rae et al. §A1.1's duplicated-n-gram character fraction
    numerator. Same sorted-array fold trick as _top_gram_struct (zero
    shuffles): when a run reaches 2 the first occurrence's chars are
    back-paid, every further occurrence adds its own."""
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sg = F.array_sort(grams)
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("chars")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        add = (
            F.when(run == 2, F.length(x) * 2)
            .when(run > 2, F.length(x))
            .otherwise(F.lit(0))
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), (acc["chars"] + add).alias("chars")
        )

    return F.aggregate(sg, zero, step)["chars"]


def _dup_segment_cols(segments: Column, prefix: str) -> list[Column]:
    """(n_<prefix>s, dup_<prefix>_ratio, dup_<prefix>_char_ratio) over a
    trimmed non-empty segment array (lines or paragraphs)."""
    n = F.size(segments)
    total_chars = F.aggregate(segments, F.lit(0), lambda acc, s: acc + F.length(s))
    uniq_chars = F.aggregate(
        F.array_distinct(segments), F.lit(0), lambda acc, s: acc + F.length(s)
    )
    return [
        n.cast("long").alias(f"n_{prefix}s"),
        # (n - distinct)/max(n,1), not 1 - distinct/max(n,1): a doc with
        # ZERO segments must read 0.0 (nothing is duplicated), not 1.0 —
        # a Gopher-style "drop if > 0.30" cutoff would otherwise discard
        # every empty doc as maximally repetitive
        F.round(
            (n - F.size(F.array_distinct(segments)))
            / F.greatest(n, F.lit(1)).cast("double"),
            6,
        ).alias(f"dup_{prefix}_ratio"),
        F.round(
            (total_chars - uniq_chars)
            / F.greatest(total_chars, F.lit(1)).cast("double"),
            6,
        ).alias(f"dup_{prefix}_char_ratio"),
    ]


def repetition_signals(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_ns: tuple[int, ...] = (2, 3, 4),
    dup_ngram_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1 repetition
    removal — public heuristics), the full family: per doc

      n_lines, dup_line_ratio, dup_line_char_ratio,
      n_paras, dup_para_ratio, dup_para_char_ratio,
      top_bigram, top_bigram_count, top_bigram_char_ratio,
      top_3gram, top_3gram_count, top_3gram_char_ratio,
      top_4gram, top_4gram_count, top_4gram_char_ratio,
      dup_5gram_char_ratio ... dup_10gram_char_ratio.

    Raw signals, not verdicts — cutoff policy belongs to the caller
    (Gopher gates e.g. dup-line 0.30, dup-paragraph 0.30, top-2-gram char
    fraction 0.20, top-3-gram 0.18, top-4-gram 0.16, dup-5-gram 0.15
    down to dup-10-gram 0.10).

    Definitions (mirrored exactly by the DuckDB oracle):
      * lines = non-empty trimmed '\\n' segments; paragraphs = non-empty
        trimmed segments between blank lines ('\\n{2,}'); dup ratios =
        occurrences beyond each segment's first, by count and by chars.
      * top n-gram = the most frequent word n-gram (ties: smallest); char
        ratio = count * len(gram) / len(text).
      * dup n-gram char ratio = sum over grams occurring >1 time of
        count * len(gram), over len(text) — the overlap-agnostic form of
        the paper's duplicated-n-gram character fraction.

    The ENTIRE family is one projection — array algebra inside the scan's
    codegen pass, zero exchanges (plan-shape pinned in tests/test_plans.py;
    the r3 version shuffled every bigram once). NULL text is treated as
    empty (0 counts) — F.size over a null array would otherwise emit a -1
    sentinel (ADVICE r3).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(
        F.transform(F.split(text, "\n"), F.trim), lambda s: F.length(s) > 0
    )
    paras = F.filter(
        F.transform(F.split(text, r"\n{2,}"), F.trim), lambda s: F.length(s) > 0
    )
    toks = tokenize_col(text, "simple")
    text_chars = F.greatest(F.length(text), F.lit(1)).cast("double")

    # two stacked projections (still zero exchanges): the inner one
    # materializes each n-gram fold ONCE as a struct column so the three
    # derived columns per n don't triplicate the aggregate expression
    inner = corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        *_dup_segment_cols(lines, "line"),
        *_dup_segment_cols(paras, "para"),
        text_chars.alias("_tc"),
        *[_top_gram_struct(toks, n).alias(f"_tg_{n}") for n in ngram_ns],
        *[_dup_gram_chars(toks, n).alias(f"_dg_{n}") for n in dup_ngram_ns],
    )
    cols = [
        "doc_id",
        "n_lines", "dup_line_ratio", "dup_line_char_ratio",
        "n_paras", "dup_para_ratio", "dup_para_char_ratio",
    ]
    for n in ngram_ns:
        name = "bigram" if n == 2 else f"{n}gram"
        tg = F.col(f"_tg_{n}")
        cols += [
            tg["gram"].alias(f"top_{name}"),
            tg["cnt"].alias(f"top_{name}_count"),
            F.round(
                tg["cnt"] * F.length(tg["gram"]) / F.col("_tc"), 6
            ).alias(f"top_{name}_char_ratio"),
        ]
    for n in dup_ngram_ns:
        cols.append(
            F.round(F.col(f"_dg_{n}") / F.col("_tc"), 6).alias(
                f"dup_{n}gram_char_ratio"
            )
        )
    return inner.select(*cols)
