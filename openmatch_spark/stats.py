"""Corpus statistics (SURVEY §2.4 A9): doclen, df, cf, avgdl, N.

The reference keeps no corpus statistics (it delegates BM25 to external
tools); these are the native-engine equivalents, computed as plain Spark
aggregations (partial+final hash agg, map-side combine for free).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def doc_stats(corpus: DataFrame) -> DataFrame:
    """(doc_id, doclen). corpus = (doc_id, terms, doclen) from extract_corpus."""
    return corpus.select("doc_id", "doclen")


def term_stats(corpus: DataFrame) -> DataFrame:
    """(term, df, cf): document frequency + collection frequency per term.

    explode -> two-level agg. The (term, doc_id) pre-aggregate spreads head
    terms across all doc partitions before the per-term rollup, so the final
    per-term agg receives at most one row per (term, doc) — the classic
    partial-aggregation defense against Zipfian skew.
    """
    tf = (
        corpus.select("doc_id", F.explode("terms").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )


def global_stats(corpus: DataFrame) -> dict:
    """{'n_docs': N, 'avgdl': float, 'total_terms': cf_total}."""
    row = corpus.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
        F.sum("doclen").alias("total_terms"),
    ).collect()[0]
    return {
        "n_docs": int(row["n_docs"]),
        "avgdl": float(row["avgdl"]) if row["avgdl"] is not None else 0.0,
        "total_terms": int(row["total_terms"]) if row["total_terms"] is not None else 0,
    }
