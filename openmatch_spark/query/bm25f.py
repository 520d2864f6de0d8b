"""BM25F — fielded BM25 (Robertson & Zaragoza 2009 §3.3; Lucene's
BM25FQuery/CombinedFieldQuery semantics).

Fields are weighted INSIDE the saturation, not after: per-field term
frequencies are length-normalized per field, weight-summed into one
pseudo-frequency, and saturated once —

    tf~(t,d)  = Σ_f  w_f · tf_f(t,d) / (1 - b_f + b_f · len_f(d)/avglen_f)
    score(q,d) = Σ_t qtf(t) · idf(t) · tf~(t,d) / (k1 + tf~(t,d))

with Lucene idf over df = docs containing t in ANY field. This is why a
title hit outranks the same hit buried in a long body — and why summing
two independent per-field BM25 scores (the naive alternative) is wrong:
it saturates each field separately and double-counts idf.

Spark shape: one explode per field unioned with a field tag, a single
(doc, field, term) partial-aggregated tf shuffle, per-field lengths as
projections (F.size — empty fields keep their zero length, so avgdl is
unbiased), and broadcast joins for query terms / df / global stats. Pure
column algebra, no UDF.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.analysis import tokenize_col
from openmatch_spark.functions.bm25 import K1


def bm25f_score_adhoc(
    corpus_fields: DataFrame,
    queries: DataFrame,
    field_params: dict[str, tuple[float, float]],
    k: int = 10,
    analyzer: str = "simple",
    k1: float = K1,
    round_to: int | None = None,
) -> DataFrame:
    """Top-k fielded run (query_id, doc_id, score, rank).

    corpus_fields: (doc_id, <field> array<string> ...) — one token-array
    column per field (tokenize/slice upstream so engine and oracle share
    the exact field split). field_params: {field: (weight, b)}."""
    fields = sorted(field_params)
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

    w_expr = None
    b_expr = None
    for f in fields:
        wgt, b = field_params[f]
        if w_expr is None:
            w_expr = F.when(F.col("field") == f, F.lit(float(wgt)))
            b_expr = F.when(F.col("field") == f, F.lit(float(b)))
        else:
            w_expr = w_expr.when(F.col("field") == f, F.lit(float(wgt)))
            b_expr = b_expr.when(F.col("field") == f, F.lit(float(b)))

    tfn = (
        tf.join(lens, ["doc_id", "field"])
        .join(F.broadcast(avg), "field")
        .select(
            "doc_id",
            "term",
            (
                w_expr
                * F.col("tf")
                / (
                    F.lit(1.0)
                    - b_expr
                    + b_expr * F.col("flen") / F.col("avgflen")
                )
            ).alias("wtf"),
        )
        .groupBy("doc_id", "term")
        .agg(F.sum("wtf").alias("tfn"))
    )

    qt = (
        queries.select(
            F.col("query_id").cast("string").alias("query_id"),
            F.explode(tokenize_col(F.col("text"), analyzer)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("qtf"))
    )
    # df only for the QUERIED vocabulary: the semi-join keeps the broadcast
    # bounded by the query batch, never the corpus vocabulary
    df_ = (
        tf.join(F.broadcast(qt.select("term").distinct()), "term", "left_semi")
        .select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
    )
    scored = (
        tfn.join(F.broadcast(qt), "term")
        .join(F.broadcast(df_), "term")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("qtf")
                * F.log(
                    F.lit(1.0)
                    + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * F.col("tfn")
                / (F.col("tfn") + F.lit(float(k1)))
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


def combined_fields_score_adhoc(
    corpus_fields: DataFrame,
    queries: DataFrame,
    field_weights: dict[str, float],
    k: int = 10,
    analyzer: str = "simple",
    k1: float = K1,
    b: float = 0.75,
    round_to: int | None = None,
) -> DataFrame:
    """Top-k `combined_fields` run (query_id, doc_id, score, rank) — the
    third classic multi-field combiner next to BM25F (weights inside
    per-field saturation, above) and dis-max (per-field universes,
    query/dismax.py).

    Elasticsearch `combined_fields` / Lucene CombinedFieldQuery score the
    fields as if merged into ONE pseudo-field: term frequencies and
    lengths are weight-summed FIRST, then a single BM25 runs over the
    synthetic field —

        tf'(t,d)  = Σ_f w_f · tf_f(t,d)
        len'(d)   = Σ_f w_f · len_f(d)
        avgdl'    = avg_d len'(d)
        score(q,d)= Σ_t qtf · idf(t) · tf' / (tf' + k1·(1 - b + b·len'/avgdl'))

    with df(t) = docs containing t in ANY field (same any-field df as
    BM25F) and Lucene idf. Unlike BM25F there is no per-field b: length
    normalization happens once on the combined length, so a weight of 2
    on `title` doubles title tf AND title's share of the length norm —
    exactly the "one big field" semantic (ref: ES combined_fields docs;
    Lucene CombinedFieldQuery javadoc). Lucene requires w_f >= 1 so the
    pseudo-frequency never undercounts a real occurrence; enforced here.

    corpus_fields: (doc_id, <field> array<string> ...) — pre-tokenized
    per-field token arrays, same contract as bm25f_score_adhoc.

    Spark shape: one explode per field unioned under a field tag, ONE
    (doc, term) partial-aggregated weighted-tf shuffle, combined lengths
    as a projection-sum, df/avgdl/query terms broadcast — no UDF.
    """
    bad = {f: w for f, w in field_weights.items() if not float(w) >= 1.0}
    if bad:
        raise ValueError(
            f"combined_fields weights must be >= 1.0 (Lucene contract), got {bad}"
        )
    fields = sorted(field_weights)

    per_field = None
    for f in fields:
        part = corpus_fields.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.explode(F.col(f)).alias("term"),
            F.lit(float(field_weights[f])).alias("w"),
        )
        per_field = part if per_field is None else per_field.unionByName(part)

    # weighted pseudo-tf: one (doc, term) shuffle with map-side combine
    tfw = per_field.groupBy("doc_id", "term").agg(
        F.sum("w").alias("tfw"),
        # any-field df needs plain presence; counted below from this frame
    )
    # combined length is a pure projection — no shuffle
    len_expr = None
    for f in fields:
        term = F.lit(float(field_weights[f])) * F.size(F.col(f)).cast("double")
        len_expr = term if len_expr is None else len_expr + term
    lens = corpus_fields.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        len_expr.alias("dlen"),
    )
    stats = lens.agg(
        F.avg("dlen").alias("avgdl"), F.count(F.lit(1)).cast("double").alias("n_docs")
    ).collect()[0]
    avgdl, n_docs = float(stats["avgdl"]), float(stats["n_docs"])

    qt = (
        queries.select(
            F.col("query_id").cast("string").alias("query_id"),
            F.explode(tokenize_col(F.col("text"), analyzer)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("qtf"))
    )
    # any-field df bounded by the queried vocabulary (tfw already collapsed
    # fields, so distinct doc_id per term IS the any-field df)
    df_ = (
        tfw.join(F.broadcast(qt.select("term").distinct()), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
    )
    scored = (
        tfw.join(F.broadcast(qt), "term")
        .join(F.broadcast(df_), "term")
        .join(lens, "doc_id")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("qtf")
                * F.log(
                    F.lit(1.0)
                    + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * F.col("tfw")
                / (
                    F.col("tfw")
                    + F.lit(float(k1))
                    * (
                        F.lit(1.0 - float(b))
                        + F.lit(float(b)) * F.col("dlen") / F.lit(avgdl)
                    )
                )
            ).alias("s"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("s").alias("score"))
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
