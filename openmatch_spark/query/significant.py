"""Per-document term vectors and significant-terms aggregation — the ES
`_termvectors` API and `significant_terms` bucket aggregation. Reference
counterpart: none in-repo (the reference's only term-level statistics
live in the external BM25 stage); these are the diagnostic surfaces a
search engine exposes over the same tokenization the index uses.

term_vectors: per (doc, term) — tf, first position, df and an idf-style
corpus rarity — what ES returns with `term_statistics=true`.

significant_terms: for each query, the terms OVER-REPRESENTED in its hit
set relative to the corpus background ("what is this result set about").
Score is the classic foreground/background lift
    score(t) = (fg_df(t) / fg_docs) / (bg_df(t) / bg_docs)
(ES offers several heuristics; lift — its "percentage" heuristic — is the
one that is exactly replicable in plain SQL, so the oracle can check it
bit-for-bit). Terms must appear in >= min_doc_count foreground docs;
top-n per query by (score DESC, term ASC).

Scale shape: term_vectors is one explode + two partial-agg shuffles (the
same Zipf-safe (term, doc) pre-aggregate as stats.term_stats).
significant_terms never re-scans the corpus for the foreground: the hit
set is (queries × k)-bounded, so its doc texts hydrate through one
broadcast join; the background df comes from the same term_stats table
the index already maintains.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.analysis import tokenize_col


def term_vectors(
    docs: DataFrame,
    analyzer: str = "simple",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, first_pos, df) — per-document term statistics
    over the analyzer's token stream; first_pos is 1-based (ES reports
    0-based token positions, but 1-based matches this engine's positional
    sidecar convention)."""
    toks = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        tokenize_col(F.col(text_col), analyzer).alias("t"),
    )
    per_doc = (
        toks.select("doc_id", F.posexplode("t").alias("pos", "term"))
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            (F.min("pos") + 1).cast("int").alias("first_pos"),
        )
    )
    df_tbl = per_doc.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    return per_doc.join(df_tbl, "term").select(
        "doc_id", "term", "tf", "first_pos", "df"
    )


SIGNIFICANCE_HEURISTICS = (
    "lift", "jlh", "chi_square", "mutual_information", "percentage"
)


def _significance_score(bg_docs: float, heuristic: str):
    """Score expression over (fg_df, bg_df, fg_docs) columns — the ES
    significance heuristics, from their published formulas. Contingency
    cells (background_is_superset, ES default):
        f11 = fg_df            f10 = bg_df − fg_df
        f01 = fg_docs − fg_df  f00 = bg_docs − bg_df − f01
    Degenerate denominators (term in every doc, foreground == corpus)
    yield NULL, which sorts after every real score."""
    fg_df = F.col("fg_df").cast("double")
    bg_df = F.col("bg_df").cast("double")
    fg_n = F.col("fg_docs").cast("double")
    bg_n = F.lit(float(bg_docs))
    fgr = fg_df / fg_n
    bgr = bg_df / bg_n
    if heuristic == "lift":
        return fgr / bgr
    if heuristic == "percentage":
        return fg_df / bg_df
    if heuristic == "jlh":
        # absolute change × relative change (ES's default heuristic)
        return (fgr - bgr) * (fgr / bgr)
    f11 = fg_df
    f10 = bg_df - fg_df
    f01 = fg_n - fg_df
    f00 = bg_n - bg_df - f01
    if heuristic == "chi_square":
        num = (f11 + f10 + f01 + f00) * F.pow(f11 * f00 - f10 * f01, F.lit(2.0))
        den = (f11 + f10) * (f01 + f00) * (f11 + f01) * (f10 + f00)
        return F.when(den != 0.0, num / den)
    # mutual_information: Σ p(x,y)·log2(p(x,y)/(p(x)p(y))), 0·log 0 = 0
    nn = f11 + f10 + f01 + f00

    def mi_term(fxy, fx, fy):
        p = fxy / nn
        return F.when(
            (fxy > 0) & (fx > 0) & (fy > 0),
            p * F.log2(p / ((fx / nn) * (fy / nn))),
        ).otherwise(F.lit(0.0))

    return (
        mi_term(f11, f11 + f10, f11 + f01)
        + mi_term(f10, f11 + f10, f10 + f00)
        + mi_term(f01, f01 + f00, f11 + f01)
        + mi_term(f00, f01 + f00, f10 + f00)
    )


def significant_terms(
    run: DataFrame,
    docs: DataFrame,
    analyzer: str = "simple",
    n: int = 10,
    min_doc_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    heuristic: str = "lift",
) -> DataFrame:
    """(query_id, term, fg_df, bg_df, score, rank) — top-n significant
    terms per query by a selectable significance heuristic over
    foreground (hit set) vs background (whole corpus) doc frequencies:
    'lift' (fg rate / bg rate — the original surface, default), or the
    ES/Lucene heuristics 'jlh', 'chi_square', 'mutual_information',
    'percentage' (see _significance_score for the formulas).

    run: (query_id, doc_id) — the hit set (typically a top-k run's id
    pairs). docs: the corpus the run was drawn from; the background is
    computed over ALL of it, the foreground only over hit docs."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    if heuristic not in SIGNIFICANCE_HEURISTICS:
        raise ValueError(
            f"heuristic must be one of {SIGNIFICANCE_HEURISTICS}, got {heuristic!r}"
        )
    hit_ids = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    ).distinct()
    doc_terms = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.explode(F.array_distinct(tokenize_col(F.col(text_col), analyzer))).alias(
            "term"
        ),
    )
    bg_docs = docs.select(F.col(id_col)).distinct().count()
    bg = doc_terms.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("bg_df"))
    fg_sizes = hit_ids.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("fg_docs")
    )
    fg = (
        doc_terms.join(F.broadcast(hit_ids), "doc_id")
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("fg_df"))
        .where(F.col("fg_df") >= min_doc_count)
    )
    scored = (
        fg.join(bg, "term")
        .join(F.broadcast(fg_sizes), "query_id")
        .select(
            "query_id",
            "term",
            "fg_df",
            "bg_df",
            "fg_docs",
        )
        .withColumn("score", _significance_score(bg_docs, heuristic))
        .drop("fg_docs")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
        .select("query_id", "term", "fg_df", "bg_df", "score", "rank")
    )


def significant_text(
    run: DataFrame,
    docs: DataFrame,
    analyzer: str = "simple",
    n: int = 10,
    min_doc_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    heuristic: str = "lift",
    filter_duplicate_text: bool = False,
    dup_window: int = 6,
) -> DataFrame:
    """ES significant_text aggregation: significant_terms re-analyzing
    the hit documents' free text, with the aggregation's defining option
    — filter_duplicate_text. When set, duplicate `dup_window`-token
    sequences within EACH query's hit set (cross-doc AND in-doc — ES's
    DeDuplicatingTokenFilter semantics, which drops any sequence already
    seen while processing the aggregation's docs) are removed before
    foreground counting, only the set-global first occurrence keeping
    its tokens — so boilerplate shared by many hits (navigation chrome,
    quoted replies, licence blocks) cannot masquerade as significant.
    Background statistics stay corpus-wide over the RAW text (ES: the
    background comes from preexisting index statistics).
    filter_duplicate_text=False degenerates to significant_terms exactly.

    Plan: the dedup pass and foreground tokenize run over the hit set
    only — (queries × k)-bounded, hydrated through one broadcast join —
    while the background df is the same corpus aggregate
    significant_terms uses. Output (query_id, term, fg_df, bg_df, score,
    rank), identical schema."""
    if not filter_duplicate_text:
        return significant_terms(
            run, docs, analyzer=analyzer, n=n, min_doc_count=min_doc_count,
            id_col=id_col, text_col=text_col, heuristic=heuristic,
        )
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    if heuristic not in SIGNIFICANCE_HEURISTICS:
        raise ValueError(
            f"heuristic must be one of {SIGNIFICANCE_HEURISTICS}, got {heuristic!r}"
        )
    from openmatch_spark.operators.exact_spans import remove_duplicate_spans

    hit_ids = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    ).distinct()
    hit_txt = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).alias("_text"),
    ).join(F.broadcast(hit_ids), "doc_id")
    cleaned = remove_duplicate_spans(
        hit_txt,
        k=dup_window,
        text_col="_text",
        doc_id_col="doc_id",
        min_dup_docs=2,
        within_doc=True,
        group_col="query_id",
    )
    fg = (
        cleaned.select(
            "query_id",
            "doc_id",
            F.explode(
                F.array_distinct(tokenize_col(F.col("_text"), analyzer))
            ).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("fg_df"))
        .where(F.col("fg_df") >= min_doc_count)
    )
    doc_terms = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.explode(F.array_distinct(tokenize_col(F.col(text_col), analyzer))).alias(
            "term"
        ),
    )
    bg_docs = docs.select(F.col(id_col)).distinct().count()
    bg = doc_terms.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("bg_df")
    )
    fg_sizes = hit_ids.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("fg_docs")
    )
    scored = (
        fg.join(bg, "term")
        .join(F.broadcast(fg_sizes), "query_id")
        .withColumn("score", _significance_score(bg_docs, heuristic))
        .drop("fg_docs")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
        .select("query_id", "term", "fg_df", "bg_df", "score", "rank")
    )


def doc_keywords(
    docs: DataFrame,
    n: int = 5,
    analyzer: str = "simple",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """(doc_id, term, tf, df, score, rank) — per-document keyword
    extraction: top-n terms by tf·idf (idf = ln(N/df), the classic
    Salton weighting — MoreLikeThis's 'interesting terms' surface exposed
    standalone, for topic tagging / corpus labeling). Score is rounded
    before ranking and ties break by term, so the pick is reproducible.

    Same plan as term_vectors plus one count and one per-doc window —
    the tf and df tables it needs are the ones term_vectors already
    aggregates."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    tv = term_vectors(docs, analyzer=analyzer, id_col=id_col, text_col=text_col)
    n_docs = float(docs.select(F.col(id_col)).distinct().count())
    scored = tv.select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.lit(n_docs) / F.col("df")), round_to
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )
