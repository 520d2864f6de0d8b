"""Term prefix suggestion (autocomplete) over the index dictionary.

For each prefix, the top-k vocabulary terms by document frequency — the
suggester every search box needs, answered entirely from the dictionary
table (never the postings). Prefixes arrive as literals, so each scan
carries a StringStartsWith pushed filter (parquet row-group min/max stats
skip non-matching groups); the per-prefix top-k is a window over the
already-filtered slice. The loop is over PREFIXES (a handful), not data —
each iteration contributes one branch to a single unioned plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.index.load import BM25Index


def suggest_terms(index: BM25Index, prefixes: list[str], k: int = 10) -> DataFrame:
    """(prefix, term, df, rank): top-k terms per prefix by df DESC, term ASC.

    Empty/None prefixes are rejected — an empty prefix would rank the whole
    vocabulary, which is a corpus-stats query (term_stats), not a suggest."""
    if not prefixes or any(not p for p in prefixes):
        raise ValueError("prefixes must be non-empty strings")
    out = None
    for p in sorted(set(prefixes)):
        sliced = (
            index.dictionary.where(F.col("term").startswith(p))
            .select(
                F.lit(p).alias("prefix"),
                "term",
                F.col("df").cast("long").alias("df"),
            )
        )
        out = sliced if out is None else out.unionByName(sliced)
    w = Window.partitionBy("prefix").orderBy(F.desc("df"), F.asc("term"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("prefix", "term", "df", "rank")
    )


def suggest_completions(
    suggestions: DataFrame,
    prefixes: list[str],
    size: int = 5,
    fuzzy: bool = False,
    max_edits: int = 1,
    prefix_len: int = 1,
    suggestion_col: str = "suggestion",
    weight_col: str = "weight",
) -> DataFrame:
    """ES completion suggester: (prefix, suggestion, weight, rank) — top
    `size` stored suggestions per prefix by (weight DESC, suggestion ASC),
    ES's completion order (weight is the index-time ranking signal, NOT a
    relevance score). A repeated suggestion text keeps its max weight
    (ES skip_duplicates semantics — one entry per surface form).

    fuzzy=True is the suggester's fuzzy mode: the typed prefix may differ
    from the suggestion's leading characters by up to max_edits
    Levenshtein edits, but the first `prefix_len` characters must match
    exactly (ES fuzzy.prefix_length, default 1) — 'sark' still completes
    to 'spark...'. Exact-prefix matches always qualify regardless of
    gates.

    Plan: suggestion tables are vocabulary-scale, not corpus-scale; each
    prefix contributes one pruned scan branch (exact mode pushes
    StringStartsWith into the scan; fuzzy compares against a
    length-bounded substring, one projection) and the per-prefix top-k is
    a window over the filtered slice — the FST walk of ES's suggester
    traded for a column-pruned parallel scan."""
    if not prefixes or any(not p for p in prefixes):
        raise ValueError("prefixes must be non-empty strings")
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    if fuzzy and (max_edits < 0 or prefix_len < 0):
        raise ValueError("max_edits and prefix_len must be >= 0")
    base = suggestions.groupBy(
        F.col(suggestion_col).alias("suggestion")
    ).agg(F.max(F.col(weight_col).cast("double")).alias("weight"))
    out = None
    for p in sorted(set(prefixes)):
        if fuzzy:
            head = F.substring("suggestion", 1, len(p))
            cond = F.col("suggestion").startswith(p) | (
                (F.substring("suggestion", 1, prefix_len) == p[:prefix_len])
                & (F.levenshtein(head, F.lit(p)) <= max_edits)
            )
        else:
            cond = F.col("suggestion").startswith(p)
        sliced = base.where(cond).select(
            F.lit(p).alias("prefix"), "suggestion", "weight"
        )
        out = sliced if out is None else out.unionByName(sliced)
    w = Window.partitionBy("prefix").orderBy(
        F.desc("weight"), F.asc("suggestion")
    )
    return (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= size)
        .select("prefix", "suggestion", "weight", "rank")
    )
