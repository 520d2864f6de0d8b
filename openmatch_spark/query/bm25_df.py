"""Ad-hoc (index-free) BM25 scoring as a single declarative DataFrame plan.

Used for (a) one-shot scoring jobs where building a persistent index isn't
worth it, and (b) the driver's DuckDB cross-check (the whole plan is
SQL-expressible: explode -> aggregate -> join -> window). Stays entirely in
JVM whole-stage codegen when the "simple" analyzer is used.

Semantics are identical to the indexed path (functions/bm25.py): Lucene idf,
k1=0.9 b=0.4, qtf multiplier, rank by (score DESC, doc_id ASC).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.analysis import tokenize_col
from openmatch_spark.functions.bm25 import B, K1


def corpus_tokens(corpus: DataFrame, analyzer: str = "simple",
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term) one row per token occurrence."""
    return corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.explode(tokenize_col(F.col(text_col), analyzer)).alias("term"),
    )


def bm25_score_adhoc(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    analyzer: str = "simple",
    k1: float = K1,
    b: float = B,
    round_to: int | None = None,
) -> DataFrame:
    """Top-k run (query_id, doc_id, score, rank) without a prebuilt index.

    corpus: (doc_id, text); queries: (query_id, text).
    round_to: optionally round scores (used by the cross-engine value-hash
    check, where last-ulp summation-order differences must not flip the hash).
    """
    toks = corpus_tokens(corpus, analyzer).cache()
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).cast("double").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("double").alias("doclen"))
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

    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(g))
        .select(
            "query_id",
            "doc_id",
            (
                F.col("qtf")
                * F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * F.col("tf")
                / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("doclen") / F.col("avgdl")))
            ).alias("w"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
    if round_to is not None:
        # round AFTER ranking: both engines rank on their own raw float64
        # sums (identical to ~1e-12 rel), and the rounded output hashes equal
        out = out.withColumn("score", F.round("score", round_to))
    return out


def qld_score_adhoc(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    analyzer: str = "simple",
    mu: float = 1000.0,
    round_to: int | None = None,
) -> DataFrame:
    """Index-free Dirichlet query-likelihood top-k run — the declarative
    twin of build_index(scoring="qld") + search (functions/bm25.py
    qld_weight_col has the formula and the Lucene clamp contract). Kept as
    one SQL-expressible plan so the DuckDB oracle checks BOTH paths.

    Matched terms with a clamped (zero) weight contribute nothing and a doc
    matching only such terms is absent — identical to the indexed path,
    which drops zero-weight postings at build."""
    from openmatch_spark.functions.bm25 import qld_weight_col

    toks = corpus_tokens(corpus, analyzer).cache()
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("doclen")
    )
    total = toks.count() or 1
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))

    qt = (
        queries.select(
            F.col("query_id").cast("string").alias("query_id"),
            F.explode(tokenize_col(F.col("text"), analyzer)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("qtf"))
    )
    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(cf), "term")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("qtf")
                * qld_weight_col(
                    F.col("tf"), F.col("cf"), F.col("doclen"), float(total), mu
                )
            ).alias("w"),
        )
        .where(F.col("w") > 0.0)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
    if round_to is not None:
        out = out.withColumn("score", F.round("score", round_to))
    return out


def qld_jm_score_adhoc(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    analyzer: str = "simple",
    lam: float = 0.1,
    round_to: int | None = None,
) -> DataFrame:
    """Index-free Jelinek-Mercer query-likelihood top-k run (functions/
    bm25.py qld_jm_weight_col has the formula). Same plan shape as
    qld_score_adhoc; no clamp exists in the JM form, so every doc matching
    at least one query term ranks (all matched weights strictly positive)."""
    from openmatch_spark.functions.bm25 import qld_jm_weight_col

    toks = corpus_tokens(corpus, analyzer).cache()
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("doclen")
    )
    total = toks.count() or 1
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))

    qt = (
        queries.select(
            F.col("query_id").cast("string").alias("query_id"),
            F.explode(tokenize_col(F.col("text"), analyzer)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("qtf"))
    )
    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(cf), "term")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("qtf")
                * qld_jm_weight_col(
                    F.col("tf"), F.col("cf"), F.col("doclen"), float(total), lam
                )
            ).alias("w"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
    if round_to is not None:
        out = out.withColumn("score", F.round("score", round_to))
    return out
