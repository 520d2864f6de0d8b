"""Learning-to-rank feature extraction — the training-data surface a
reranker pipeline needs (OpenMatch trains rerankers over exactly such
(query, doc, features) tables; classic LTR datasets — LETOR, MSLR — ship
the same shape).

One corpus tokenization feeds EVERY feature: tf/doclen/df/cf are computed
once, each candidate (query, doc) pair then gets its per-scorer sums in a
single aggregation — no per-feature corpus pass, no UDF. Candidates are
the BM25 top-k (the standard LTR candidate-generation contract: features
are only materialized for docs a first-stage retriever surfaced).

Features (all rounded for engine-reproducibility):
    bm25        Lucene-idf BM25 (k1, b) — also the candidate ranking
    qld_dir     Dirichlet query likelihood (mu), Lucene clamp
    qld_jm      Jelinek-Mercer query likelihood (lambda)
    n_matched   distinct query terms present in the doc
    matched_qtf fraction of the query's tokens (with multiplicity) matched
    sum_idf     Σ idf over matched distinct terms (query-difficulty signal)
    doclen      document length in tokens
    qlen        query length in tokens

Scale: identical plan family to the ad-hoc scorers — one tokenize pass,
Zipf-safe partial-agg term statistics, candidate-bounded feature rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.functions.bm25 import (
    B,
    K1,
    MU,
    bm25_weight_col,
    lucene_idf_col,
    qld_jm_weight_col,
    qld_weight_col,
)


def ltr_features(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    analyzer: str = "simple",
    k1: float = K1,
    b: float = B,
    mu: float = MU,
    lam: float = 0.1,
    round_to: int = 6,
) -> DataFrame:
    """(query_id, doc_id, rank, bm25, qld_dir, qld_jm, n_matched,
    matched_qtf, sum_idf, doclen, qlen) for the BM25 top-k candidates of
    each query. corpus: (doc_id, text); queries: (query_id, text)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from openmatch_spark.analysis import tokenize_col
    from openmatch_spark.query.bm25_df import corpus_tokens

    toks = corpus_tokens(corpus, analyzer)
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("doclen")
    )
    g = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
        F.sum("doclen").alias("total"),
    ).collect()[0]
    n_docs = float(g["n_docs"])
    avgdl = float(g["avgdl"]) if g["avgdl"] else 1.0
    total = float(g["total"]) if g["total"] else 1.0
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df"),
        F.sum("tf").alias("cf"),
    )
    qt = (
        queries.select(
            F.col("query_id").cast("string").alias("query_id"),
            F.explode(tokenize_col(F.col("text"), analyzer)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("qtf"))
    )
    qlen = qt.groupBy("query_id").agg(F.sum("qtf").cast("double").alias("qlen"))

    idf = lucene_idf_col(F.col("df"), n_docs)
    contrib = (
        tf.join(qt, "term")
        .join(dl, "doc_id")
        .join(stats, "term")
        .select(
            "query_id",
            "doc_id",
            "term",
            "qtf",
            "doclen",
            (F.col("qtf") * bm25_weight_col(
                F.col("tf"), idf, F.col("doclen"), avgdl, k1, b
            )).alias("_bm25"),
            (F.col("qtf") * qld_weight_col(
                F.col("tf"), F.col("cf"), F.col("doclen"), total, mu
            )).alias("_dir"),
            (F.col("qtf") * qld_jm_weight_col(
                F.col("tf"), F.col("cf"), F.col("doclen"), total, lam
            )).alias("_jm"),
            idf.alias("_idf"),
        )
    )
    feats = contrib.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("_bm25"), round_to).alias("bm25"),
        F.round(F.sum("_dir"), round_to).alias("qld_dir"),
        F.round(F.sum("_jm"), round_to).alias("qld_jm"),
        F.countDistinct("term").cast("int").alias("n_matched"),
        F.sum("qtf").alias("_mqtf"),
        F.round(F.max("doclen"), round_to).alias("doclen"),
    )
    # sum_idf over DISTINCT matched terms (the dup-safe way: idf is per
    # term, qtf-duplicated rows would double it — recompute from a
    # distinct projection)
    sum_idf = (
        contrib.select("query_id", "doc_id", "term", "_idf")
        .distinct()
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("_idf"), round_to).alias("sum_idf"))
    )
    out = (
        feats.join(sum_idf, ["query_id", "doc_id"])
        .join(qlen, "query_id")
        .select(
            "query_id",
            "doc_id",
            "bm25",
            "qld_dir",
            "qld_jm",
            "n_matched",
            F.round(F.col("_mqtf") / F.col("qlen"), round_to).alias(
                "matched_qtf"
            ),
            "sum_idf",
            "doclen",
            F.round("qlen", round_to).alias("qlen"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "doc_id", "rank", "bm25", "qld_dir", "qld_jm",
            "n_matched", "matched_qtf", "sum_idf", "doclen", "qlen",
        )
    )
