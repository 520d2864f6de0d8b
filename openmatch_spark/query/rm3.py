"""RM3 pseudo-relevance-feedback query expansion (Lavrenko & Croft 2001
relevance models, interpolated as in Abdul-Jaleel et al. 2004 / Anserini's
Rm3Reranker defaults).

Pipeline (all pinned deterministic so a SQL oracle can replicate it):

  1. initial BM25 run -> top `fb_docs` docs per query
     (score DESC, doc_id ASC).
  2. relevance model: P(w|R) = Σ_d  s~(d) · tf(w,d)/|d|  over the feedback
     docs, with s~(d) = the doc's BM25 score normalized to sum 1 per query.
  3. keep the top `fb_terms` terms (weight DESC, term ASC), re-normalize
     their weights to sum 1.
  4. interpolate with the original query: w(t) = α·qtf(t)/Σqtf + (1-α)·rm(t).
  5. rescore: score(q,d) = Σ_t w(t) · BM25term(t,d), final top-k.

Float-determinism hinge: both selection stages rank on SUMS of float64
products whose accumulation order differs between engines, so relevance
weights are ROUNDED (9 dp) before the top-term cut and before rescoring —
after rounding, ties break on the pinned (weight DESC, term ASC) order
identically everywhere. Without the rounding, a last-ulp difference at the
fb_terms boundary silently swaps expansion terms between engines.

Spark shape: everything is DataFrame algebra over the one cached token
table — the feedback join is (run top-N) × tf keyed on doc_id, the
expansion-term cut is a per-query window, and the rescore reuses the same
tf/df/doclen frames; query-side frames stay broadcast-small (queries ×
fb_terms). An index-backed variant needs a forward index (doc -> terms),
which the inverted layout deliberately does not store; at scale RM3 runs
against the corpus table exactly like this, hydrating only the feedback
hit set (queries × fb_docs rows).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.analysis import tokenize_col
from openmatch_spark.functions.bm25 import B, K1


def rm3_rescore_adhoc(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    fb_docs: int = 10,
    fb_terms: int = 10,
    alpha: float = 0.5,
    analyzer: str = "simple",
    k1: float = K1,
    b: float = B,
    round_to: int | None = None,
) -> DataFrame:
    """RM3-expanded top-k run (query_id, doc_id, score, rank).

    corpus: (doc_id, text); queries: (query_id, text). A query with no
    in-vocabulary terms produces no rows (nothing to feed back from)."""
    toks = corpus.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(tokenize_col(F.col("text"), analyzer)).alias("term"),
    )
    # cached like bm25_score_adhoc's token table: every stage below re-reads
    # it (tf, dl, df, feedback join, rescore) — Spark's LRU owns eviction
    toks.cache()
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("doclen")
    )
    row = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
    ).collect()[0]
    n_docs, avgdl = float(row["n_docs"]), float(row["avgdl"] or 1.0)
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))

    idf = F.log(
        F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    bm25_term = (
        idf
        * F.col("tf")
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("doclen") / F.lit(avgdl))
        )
    )

    qt = (
        queries.select(
            F.col("query_id").cast("string").alias("query_id"),
            F.explode(tokenize_col(F.col("text"), analyzer)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("qtf"))
    )

    def weighted_run(weights: DataFrame, cut: int) -> DataFrame:
        """(query_id, term, w) -> top-`cut` run under Σ w·BM25term."""
        scored = (
            tf.join(F.broadcast(weights), "term")
            .join(dl, "doc_id")
            .join(
                F.broadcast(
                    df_.join(weights.select("term").distinct(), "term", "left_semi")
                ),
                "term",
            )
            .select("query_id", "doc_id", (F.col("w") * bm25_term).alias("part"))
            .groupBy("query_id", "doc_id")
            .agg(F.sum("part").alias("score"))
        )
        win = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            scored.withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= cut)
            .select("query_id", "doc_id", "score", "rank")
        )

    fb_run = weighted_run(
        qt.select("query_id", "term", F.col("qtf").alias("w")), fb_docs
    )

    # per-query normalized doc scores over the feedback set
    s_norm = fb_run.withColumn(
        "s", F.col("score") / F.sum("score").over(Window.partitionBy("query_id"))
    ).select("query_id", "doc_id", "s")

    # relevance model P(w|R): one (feedback-docs × their terms) join —
    # bounded by queries × fb_docs hydrated docs
    rm = (
        s_norm.join(tf, "doc_id")
        .join(dl, "doc_id")
        .select(
            "query_id",
            "term",
            (F.col("s") * F.col("tf") / F.col("doclen")).alias("part"),
        )
        .groupBy("query_id", "term")
        .agg(F.round(F.sum("part"), 9).alias("rmw"))
    )
    tw = Window.partitionBy("query_id").orderBy(F.desc("rmw"), F.asc("term"))
    top_terms = (
        rm.withColumn("_r", F.row_number().over(tw))
        .where(F.col("_r") <= fb_terms)
        .drop("_r")
    )
    top_norm = top_terms.withColumn(
        "rmn", F.col("rmw") / F.sum("rmw").over(Window.partitionBy("query_id"))
    ).select("query_id", "term", "rmn")

    q_norm = qt.withColumn(
        "qn", F.col("qtf") / F.sum("qtf").over(Window.partitionBy("query_id"))
    ).select("query_id", "term", "qn")
    final_w = (
        q_norm.join(top_norm, ["query_id", "term"], "full")
        .select(
            "query_id",
            "term",
            F.round(
                F.lit(alpha) * F.coalesce("qn", F.lit(0.0))
                + F.lit(1.0 - alpha) * F.coalesce("rmn", F.lit(0.0)),
                9,
            ).alias("w"),
        )
        .where(F.col("w") > 0)
    )
    out = weighted_run(final_w, k)
    if round_to is not None:
        out = out.withColumn("score", F.round("score", round_to))
    return out
