"""Disjunction-max multi-field search — Lucene's DisjunctionMaxQuery
semantics (the other classic multi-field combiner next to BM25F,
query/bm25f.py).

Where BM25F blends fields INSIDE one saturation (one pseudo-frequency,
one idf), dis-max scores each field as its OWN BM25 corpus — per-field
df, avgdl, and length norm — and combines per document as

    score(q, d) = max_f s_f(q, d) + tie_breaker * (Σ_f s_f(q, d) - max_f)

with tie_breaker in [0, 1]. tie_breaker=0 is the pure "best field wins"
semantic (a doc matching the query well in its title is not outranked by
a doc matching mediocrely in BOTH title and body); tie_breaker=1
degenerates to the naive per-field score sum. Lucene applies dis-max per
TERM across field subqueries and sums over terms — this module does the
same: the max/tiebreak fold runs per (query, doc, term) over the field
contributions, then terms sum, so a two-term query can take its terms
from different best fields (ref: Lucene DisjunctionMaxQuery docs;
Elasticsearch multi_match type=best_fields).

Spark shape: one explode per field unioned under a field tag, ONE
(doc, field, term) partial-aggregated tf shuffle, per-field df/avgdl as
broadcast-joined aggregates bounded by the query vocabulary, then the
per-term fold as greatest/sum column algebra — no UDF anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.analysis import tokenize_col
from openmatch_spark.functions.bm25 import B, K1


def _multi_match_topk(
    corpus_fields: DataFrame,
    queries: DataFrame,
    fields: list[str],
    tie_breaker: float,
    k: int,
    analyzer: str,
    k1: float,
    b: float,
    round_to: int | None,
    blended_df: bool = False,
    field_boosts: dict[str, float] | None = None,
) -> DataFrame:
    """Shared term-centric multi-field pipeline. blended_df=False is
    best_fields (per-field df -> dismax_score_adhoc); blended_df=True is
    cross_fields (idf from the max df across fields -> 
    cross_fields_score_adhoc). field_boosts multiply the per-field
    contribution BEFORE the per-term dis-max fold (ES ^boost)."""
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    fields = sorted(fields)
    boosts = {f: float((field_boosts or {}).get(f, 1.0)) for f in fields}
    if any(w <= 0 for w in boosts.values()):
        raise ValueError(f"field boosts must be > 0, got {boosts}")
    per_field = None
    lens = None
    for f in fields:
        part = corpus_fields.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.lit(f).alias("field"),
            F.explode(F.col(f)).alias("term"),
        )
        ln = corpus_fields.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.lit(f).alias("field"),
            F.size(F.col(f)).cast("double").alias("flen"),
        )
        per_field = part if per_field is None else per_field.unionByName(part)
        lens = ln if lens is None else lens.unionByName(ln)

    tf = per_field.groupBy("doc_id", "field", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    avg = lens.groupBy("field").agg(F.avg("flen").alias("avgflen"))
    n_docs = float(corpus_fields.count())

    qt = (
        queries.select(
            F.col("query_id").cast("string").alias("query_id"),
            F.explode(tokenize_col(F.col("text"), analyzer)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("qtf"))
    )
    # per-FIELD df, bounded by the queried vocabulary (semi-join before the
    # distinct keeps the broadcast O(query vocab × fields))
    df_ = (
        tf.join(F.broadcast(qt.select("term").distinct()), "term", "left_semi")
        .select("field", "term", "doc_id")
        .distinct()
        .groupBy("field", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
    )
    if blended_df:
        # BlendedTermQuery: every field scores the term with the SAME df —
        # the max across fields — so a rare-in-title term is not over-
        # rewarded just because titles are short (ES multi_match
        # type=cross_fields; Lucene BlendedTermQuery takes max docFreq)
        blend = df_.groupBy("term").agg(F.max("df").alias("df"))
        df_ = df_.select("field", "term").join(F.broadcast(blend), "term")

    # per-(query, doc, term, field) BM25 contribution in that field's universe
    contrib = (
        tf.join(F.broadcast(qt), "term")
        .join(lens, ["doc_id", "field"])
        .join(F.broadcast(avg), "field")
        .join(F.broadcast(df_), ["field", "term"])
        .select(
            "query_id",
            "doc_id",
            "term",
            (
                _boost_expr(boosts)
                * F.col("qtf")
                * F.log(
                    F.lit(1.0)
                    + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * F.col("tf")
                / (
                    F.col("tf")
                    + F.lit(float(k1))
                    * (
                        F.lit(1.0 - float(b))
                        + F.lit(float(b)) * F.col("flen") / F.col("avgflen")
                    )
                )
            ).alias("s"),
        )
    )
    # dis-max fold per (query, doc, TERM), then terms sum — Lucene's shape
    per_term = contrib.groupBy("query_id", "doc_id", "term").agg(
        (
            F.max("s")
            + F.lit(float(tie_breaker)) * (F.sum("s") - F.max("s"))
        ).alias("w")
    )
    scored = per_term.groupBy("query_id", "doc_id").agg(F.sum("w").alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
    if round_to is not None:
        out = out.withColumn("score", F.round("score", round_to))
    return out


def _boost_expr(boosts: dict[str, float]):
    """CASE over the field tag -> boost literal (1.0 boosts fold away in
    constant-folding, so the unboosted plan is unchanged)."""
    e = None
    for f, w in boosts.items():
        e = (F.when(F.col("field") == f, F.lit(w)) if e is None
             else e.when(F.col("field") == f, F.lit(w)))
    return e


def dismax_score_adhoc(
    corpus_fields: DataFrame,
    queries: DataFrame,
    fields: list[str],
    tie_breaker: float = 0.0,
    k: int = 10,
    analyzer: str = "simple",
    k1: float = K1,
    b: float = B,
    round_to: int | None = None,
    field_boosts: dict[str, float] | None = None,
) -> DataFrame:
    """Top-k dis-max run (query_id, doc_id, score, rank) — ES multi_match
    type=best_fields.

    corpus_fields: (doc_id, <field> array<string> ...) — one token-array
    column per field (pre-tokenized, same contract as bm25f_score_adhoc so
    engine and oracle share the exact field split). Each field is its own
    BM25 universe: df(t, f) counts docs whose FIELD f contains t, and the
    length norm uses that field's own avgdl. Docs with an empty field
    still count toward that field's avgdl (zero-length, same convention
    as BM25F's unbiased avgdl)."""
    return _multi_match_topk(
        corpus_fields, queries, fields, tie_breaker, k, analyzer, k1, b,
        round_to, blended_df=False, field_boosts=field_boosts,
    )


def cross_fields_score_adhoc(
    corpus_fields: DataFrame,
    queries: DataFrame,
    fields: list[str],
    tie_breaker: float = 0.0,
    k: int = 10,
    analyzer: str = "simple",
    k1: float = K1,
    b: float = B,
    round_to: int | None = None,
    field_boosts: dict[str, float] | None = None,
) -> DataFrame:
    """Top-k cross_fields run — ES multi_match type=cross_fields / Lucene
    BlendedTermQuery. The FOURTH multi-field semantic beside BM25F
    (weights inside saturation), combined_fields (one pseudo-field), and
    best_fields dis-max (per-field universes):

    term-centric with BLENDED statistics. Each query term is scored in
    every field with that field's own tf and length norm, but the idf uses
    ONE blended df — the max df across the fields — so "smith" in a
    first-name field is not treated as rare just because first names
    rarely say smith (the classic cross_fields motivation: a person name
    split over first_name/last_name fields). Per term the field
    contributions fold as dis-max (max + tie_breaker * rest), then terms
    sum. tie_breaker defaults to 0.0 (ES default for cross_fields).

    Spark shape: identical to dis-max (one (doc, field, term) tf shuffle,
    broadcast stats) plus one extra broadcast-sized max-df agg over the
    query vocabulary — the blending costs nothing at corpus scale."""
    return _multi_match_topk(
        corpus_fields, queries, fields, tie_breaker, k, analyzer, k1, b,
        round_to, blended_df=True, field_boosts=field_boosts,
    )
