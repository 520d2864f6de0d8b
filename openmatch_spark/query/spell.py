"""Did-you-mean spell suggestion from the index dictionary.

Lucene's DirectSpellChecker shape: candidate corrections come from the
live term dictionary itself (no separate spell index), gated by a first
-character prefix (edit-distance candidates almost never disagree on the
first letter, and the gate turns the dictionary scan into a pushed prefix
range), ranked by (edit distance ASC, df DESC, term ASC) — "closest, then
most popular" — a total order, so the suggestion is deterministic and
oracle-replicable.

A token is only "misspelled" if its own df is below `max_query_df`
(DirectSpellChecker's maxQueryFrequency): frequent terms are presumed
intended, rare-or-absent ones get suggestions. Scale shape: one dictionary
scan joined to the broadcast token list; candidates are bounded by the
prefix slice of the vocabulary, never by the corpus.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from openmatch_spark.index.load import BM25Index
from openmatch_spark.functions.localrel import inline_table


def suggest_spelling(
    index: BM25Index,
    queries: DataFrame,
    max_edits: int = 2,
    prefix_len: int = 1,
    max_query_df: int = 0,
    n_suggestions: int = 1,
) -> DataFrame:
    """Per misspelled query token, the top dictionary corrections.

    Returns (query_id, token, suggestion, edits, df, sug_rank), one row per
    kept suggestion; tokens with df > max_query_df (already-known words)
    and tokens with no candidate within max_edits emit nothing.
    """
    from openmatch_spark.analysis import tokenize_py

    spark = index.spark
    analyzer = index.stats["analyzer"]
    toks = set()
    qtoks = []
    for r in queries.select(
        F.col("query_id").cast("string").alias("query_id"), "text"
    ).collect():
        for tok in sorted(Counter(tokenize_py(r["text"], analyzer))):
            qtoks.append((r["query_id"], tok))
            toks.add(tok)
    if not toks:
        return spark.createDataFrame(
            [], "query_id string, token string, suggestion string, "
                "edits int, df bigint, sug_rank int"
        )
    qt = F.broadcast(inline_table(spark, [(t,) for t in sorted(toks)], "token string"))
    d = index.dictionary.select("term", "df")
    # df of the token as typed (0 if out of vocabulary)
    typed_df = qt.join(d, F.col("token") == F.col("term"), "left").select(
        "token", F.coalesce("df", F.lit(0)).alias("token_df")
    )
    misspelled = typed_df.where(F.col("token_df") <= F.lit(max_query_df))
    cand = d.join(
        F.broadcast(misspelled),
        (F.substring("term", 1, prefix_len) == F.substring("token", 1, prefix_len))
        & (F.col("term") != F.col("token"))
        & (F.length("term") >= F.length("token") - max_edits)
        & (F.length("term") <= F.length("token") + max_edits)
        & (F.levenshtein("term", "token") <= max_edits),
    ).withColumn("edits", F.levenshtein("term", "token").cast("int"))
    w = Window.partitionBy("token").orderBy(
        F.asc("edits"), F.desc("df"), F.asc("term")
    )
    kept = (
        cand.withColumn("sug_rank", F.row_number().over(w).cast("int"))
        .where(F.col("sug_rank") <= n_suggestions)
        .select(F.col("token"), F.col("term").alias("suggestion"), "edits", "df", "sug_rank")
    )
    qdf = F.broadcast(
        inline_table(spark, qtoks, "query_id string, token string")
    )
    return qdf.join(kept, "token").select(
        "query_id", "token", "suggestion", "edits", "df", "sug_rank"
    )


def correct_queries(
    index: BM25Index,
    queries: DataFrame,
    max_edits: int = 2,
    prefix_len: int = 1,
    max_query_df: int = 0,
) -> DataFrame:
    """Rewrite query texts with each misspelled token replaced by its top
    suggestion (unknown tokens with no candidate pass through unchanged).
    Returns (query_id, text, corrected) — feed `corrected` back to search().

    Rebuilds the text from analyzer tokens, so original casing/punctuation
    inside corrected queries is normalized — the standard did-you-mean
    contract (the suggestion string the user clicks is the analyzed form).
    """
    from openmatch_spark.analysis import tokenize_py

    analyzer = index.stats["analyzer"]
    sug = {
        (r["query_id"], r["token"]): r["suggestion"]
        for r in suggest_spelling(
            index, queries, max_edits=max_edits, prefix_len=prefix_len,
            max_query_df=max_query_df, n_suggestions=1,
        ).collect()
    }
    rows = []
    for r in queries.select(
        F.col("query_id").cast("string").alias("query_id"), "text"
    ).collect():
        toks = tokenize_py(r["text"], analyzer)
        rows.append(
            (r["query_id"], r["text"],
             " ".join(sug.get((r["query_id"], t), t) for t in toks))
        )
    return inline_table(index.spark, 
        rows, "query_id string, text string, corrected string"
    )
