"""Data-selection importance weights — the DSIR signal (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): score
every raw document by how much more likely its features are under a
TARGET distribution (clean/in-domain text) than under the RAW pool, then
sample/filter by that weight. This is the principled sibling of the
Gopher rule gates and the LM-perplexity score already in this engine —
the third classic pretraining-curation filter family.

    log_w(doc) = Σ_f  tf_f(doc) · ln( p_target(f) / p_raw(f) )

with unigram features and Laplace (+1) smoothing over the UNION
vocabulary so both distributions are everywhere-positive:

    p_D(f) = (count_D(f) + 1) / (total_D + |V|)

Deviation from the paper, documented: DSIR hashes n-gram features into a
fixed-width bucket vector so a single machine can hold the counts; a
distributed engine does not need that compression — the explicit
(term, count) tables ARE the model, exact rather than hash-collided, and
they partial-aggregate like any other term-count shuffle. (A bucketed
variant would only change WHERE collisions happen, not the plan shape.)

Scale shape: two token-count aggregates (target pool, raw pool — the
same Zipf-safe explode→partial-agg shape as stats.term_stats), one join
of per-doc term counts against the broadcast-or-shuffled log-ratio
table, one per-doc fold. Nothing driver-side except the two scalar
totals.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from openmatch_spark.analysis import tokenize_col


def _term_counts(df: DataFrame, analyzer: str, id_col: str, text_col: str):
    # two-to-three consumers per side (counts, total, per-doc tf): persist
    # so each pool is scanned+tokenized once (MEMORY_AND_DISK spill)
    toks = df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        tokenize_col(F.col(text_col), analyzer).alias("t"),
    ).persist()
    counts = (
        toks.select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    total = toks.select(F.sum(F.size("t")).alias("n")).collect()[0]["n"] or 0
    return toks, counts, float(total)


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    analyzer: str = "simple",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, log_weight, avg_log_weight) — per-raw-doc DSIR
    importance weight; avg_log_weight (= log_w / n_tokens) is the
    length-normalized variant to rank/threshold on so long docs don't
    dominate. Empty docs report log_weight 0 (a vacuous product).

    raw: the pool to score. target: exemplar in-domain docs (same
    columns). Both tokenized with ``analyzer``."""
    raw_toks, raw_counts, raw_total = _term_counts(raw, analyzer, id_col, text_col)
    _, tgt_counts, tgt_total = _term_counts(target, analyzer, id_col, text_col)
    if raw_total <= 0:
        raise ValueError("raw pool has no tokens")
    if tgt_total <= 0:
        raise ValueError("target corpus has no tokens")

    vocab = (
        raw_counts.select("term")
        .unionByName(tgt_counts.select("term"))
        .distinct()
    )
    v_size = float(vocab.count())
    ratios = (
        vocab.join(tgt_counts.withColumnRenamed("c", "_ct"), "term", "left")
        .join(raw_counts.withColumnRenamed("c", "_cr"), "term", "left")
        .select(
            "term",
            (
                F.log(
                    (F.coalesce(F.col("_ct"), F.lit(0.0)) + 1.0)
                    / F.lit(tgt_total + v_size)
                )
                - F.log(
                    (F.coalesce(F.col("_cr"), F.lit(0.0)) + 1.0)
                    / F.lit(raw_total + v_size)
                )
            ).alias("log_ratio"),
        )
    )
    doc_terms = (
        raw_toks.select("doc_id", F.explode("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    folded = (
        doc_terms.join(ratios, "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("log_ratio")).alias("log_weight"))
    )
    sizes = raw_toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
    return sizes.join(folded, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        F.when(
            F.col("n_tokens") > 0,
            F.coalesce("log_weight", F.lit(0.0)) / F.col("n_tokens"),
        ).alias("avg_log_weight"),
    )
