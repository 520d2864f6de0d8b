"""Query performance prediction — per-query difficulty signals, the
surface behind adaptive retrieval policies (re-run hard queries at higher
depth / with expansion, route easy ones to the cheap path). Reference
counterpart: none — the reference treats every query identically; QPP is
the control-plane statistic engines add on top.

Two published families, both pure column algebra:

* pre-retrieval (before any search): the query's term rarity profile —
  n in-vocabulary terms, mean/max Lucene idf (Scholer et al. / He & Ounis
  "avgIDF"/"maxIDF" predictors). A query of corpus-common terms is
  near-unrankable; one rare discriminative term predicts an easy query.
* post-retrieval: the score-distribution shape of the top-k run — mean,
  sample std, and their ratio (coefficient of variation), the
  NQC-family signal (Shtok et al. 2012: tight flat score curves predict
  poor effectiveness; a spiky head predicts a confident ranking).

Scale shape: the pre-retrieval leg is one vocabulary-pruned dictionary
lookup (the same bounded scan query planning already pays); the
post-retrieval leg is one groupBy over the (queries × k)-bounded run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from openmatch_spark.analysis import tokenize_col
from openmatch_spark.functions.bm25 import lucene_idf_col


def qpp_signals(
    docs: DataFrame,
    queries: DataFrame,
    run: DataFrame,
    analyzer: str = "simple",
    round_to: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, n_terms, mean_idf, max_idf, score_mean, score_std,
    score_cv) — pre- and post-retrieval difficulty signals per query.

    docs: the corpus (df/N computed over it with the same analyzer);
    queries: (query_id, text); run: (query_id, doc_id, score), already
    depth-cut to the k the NQC signal should describe. Queries whose every
    term is out-of-vocabulary report n_terms=0 with NULL idf signals;
    score_std/score_cv are NULL for single-hit runs (sample std undefined),
    never 0 — absence of evidence is not confidence."""
    doc_terms = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.explode(F.array_distinct(tokenize_col(F.col(text_col), analyzer))).alias(
            "term"
        ),
    )
    n_docs = float(docs.select(F.col(id_col)).distinct().count())
    dfreq = doc_terms.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    q = queries.select(
        F.col("query_id").cast("string").alias("query_id"), "text"
    )
    q_terms = q.select(
        "query_id",
        F.explode(F.array_distinct(tokenize_col(F.col("text"), analyzer))).alias(
            "term"
        ),
    )
    pre = (
        q_terms.join(dfreq, "term")  # in-vocabulary terms only
        .select("query_id", lucene_idf_col(F.col("df"), n_docs).alias("idf"))
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.round(F.avg("idf"), round_to).alias("mean_idf"),
            F.round(F.max("idf"), round_to).alias("max_idf"),
        )
    )
    post = (
        run.select(
            F.col("query_id").cast("string").alias("query_id"),
            F.col("score").cast("double").alias("score"),
        )
        .groupBy("query_id")
        .agg(
            F.round(F.avg("score"), round_to).alias("score_mean"),
            F.round(F.stddev_samp("score"), round_to).alias("score_std"),
            F.round(
                F.stddev_samp("score") / F.avg("score"), round_to
            ).alias("score_cv"),
        )
    )
    base = q.select("query_id").distinct()
    return (
        base.join(pre, "query_id", "left")
        .join(post, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_terms", F.lit(0)).cast("long").alias("n_terms"),
            "mean_idf",
            "max_idf",
            "score_mean",
            "score_std",
            "score_cv",
        )
    )
