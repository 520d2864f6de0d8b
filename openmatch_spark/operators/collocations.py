"""Collocation mining — corpus-level bigram association by pointwise
mutual information (Church & Hanks 1990): which word pairs co-occur far
more than chance ("hong kong", "machine learning"). The classic
text-analytics view over a web corpus; feeds phrase dictionaries,
"related searches", and index-time shingle selection. Reference
counterpart: none — the reference consumes tokenized text; collocation
statistics are corpus analytics this engine owns.

    pmi(v, w) = ln( p(vw) / (p(v) * p(w)) )
              = ln( (c2(vw) / B) / ((c1(v) / T) * (c1(w) / T)) )

with c1 = unigram counts over T tokens and c2 = adjacent-bigram counts
over B bigram slots. A min-count gate keeps the long tail of hapax
bigrams (which maximize raw PMI by construction) out of the ranking —
the standard fix, not a scale hack.

Determinism contract: PMI is ROUNDED (default 6 dp) before ranking and
ties break by the bigram string, so the top-n is reproducible across
engines and partitionings.

Scale shape: two Zipf-safe token/bigram count aggregates (identical plan
family to stats.term_stats and the LM trainer), one join of the
min-count-surviving bigrams against the unigram table, one global top-n
window over the gated set (bounded by distinct frequent bigrams — the
min_count gate applies BEFORE the window).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.analysis import tokenize_col


def pmi_collocations(
    docs: DataFrame,
    analyzer: str = "simple",
    n: int = 100,
    min_count: int = 5,
    round_to: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term_a, term_b, n_pair, pmi, rank) — top-n adjacent-bigram
    collocations by (rounded PMI DESC, pair ASC), pairs below min_count
    excluded before ranking."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        tokenize_col(F.col(text_col), analyzer).alias("t"),
    )
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("c1"))
    )
    totals = toks.agg(
        F.sum(F.size("t")).alias("t_tokens"),
        F.sum(F.greatest(F.size("t") - 1, F.lit(0))).alias("b_slots"),
    ).collect()[0]
    t_total = float(totals["t_tokens"] or 0)
    b_total = float(totals["b_slots"] or 0)
    if b_total <= 0:
        raise ValueError("corpus has no bigrams")
    sz = F.size("t")
    pairs = (
        toks.where(sz >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice("t", 1, sz - 1),
                    F.slice("t", 2, sz - 1),
                    lambda a, b: F.struct(a.alias("term_a"), b.alias("term_b")),
                )
            ).alias("p")
        )
        .select("p.term_a", "p.term_b")
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .where(F.col("n_pair") >= min_count)
    )
    scored = (
        pairs.join(uni.withColumnRenamed("w", "term_a").withColumnRenamed("c1", "ca"), "term_a")
        .join(uni.withColumnRenamed("w", "term_b").withColumnRenamed("c1", "cb"), "term_b")
        .select(
            "term_a",
            "term_b",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair").cast("double") / F.lit(b_total))
                    / ((F.col("ca") / F.lit(t_total)) * (F.col("cb") / F.lit(t_total)))
                ),
                round_to,
            ).alias("pmi"),
        )
    )
    w = Window.orderBy(F.desc("pmi"), F.asc("term_a"), F.asc("term_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
        .select("term_a", "term_b", "n_pair", "pmi", "rank")
    )
