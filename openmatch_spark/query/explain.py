"""Score explanation: the per-term BM25 breakdown behind each hit.

Lucene's IndexSearcher.explain() shape: for every (query, doc) in the
top-k, one row per matched term with the full factor decomposition
(qtf, tf, df, doclen, idf, tf normalization, weight) so a relevance
engineer can see WHY a document ranked where it did. The invariant — the
engine's reported score is exactly the sum of the explained weights — is
what the tests pin (against the packed-index kernels too).

Scale shape: the breakdown reuses the ad-hoc declarative plan's exploded
aggregates (query/bm25_df.py) and is computed ONLY for the top-k hits
(semi-joined before the wide factor join), so explain costs O(queries x k
x query_terms) on top of the run, not a corpus pass.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.analysis import tokenize_col
from openmatch_spark.functions.bm25 import B, K1


def explain_adhoc(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    analyzer: str = "simple",
    k1: float = K1,
    b: float = B,
    round_to: int | None = None,
) -> DataFrame:
    """Per-term explanation rows for the top-k run over (doc_id, text) x
    (query_id, text): (query_id, doc_id, rank, score, term, qtf, tf, df,
    doclen, idf, tf_norm, weight) — score == sum(weight) per (query, doc).
    """
    from openmatch_spark.query.bm25_df import corpus_tokens

    toks = corpus_tokens(corpus, analyzer).cache()
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("doclen")
    )
    g = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    qt = (
        queries.select(
            F.col("query_id").cast("string").alias("query_id"),
            F.explode(tokenize_col(F.col("text"), analyzer)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("qtf"))
    )
    parts = (
        tf.join(F.broadcast(qt), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(g))
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "tf_norm",
            F.col("tf")
            / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("doclen") / F.col("avgdl"))),
        )
        .withColumn("weight", F.col("qtf") * F.col("idf") * F.col("tf_norm"))
    )
    scored = parts.groupBy("query_id", "doc_id").agg(F.sum("weight").alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    topk = (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )
    out = parts.join(F.broadcast(topk), ["query_id", "doc_id"]).select(
        "query_id", "doc_id", "rank",
        *(F.round(c, round_to).alias(c) if round_to is not None else F.col(c)
          for c in ["score", ]),
        "term", "qtf", "tf", "df", "doclen",
        *(F.round(c, round_to).alias(c) if round_to is not None else F.col(c)
          for c in ["idf", "tf_norm", "weight"]),
    )
    return out
