"""Deterministic domain-weighted mixture sampling for training-data builds.

LLM pretraining mixes are built by re-weighting source domains (The Pile,
DoReMi, Llama data cards all publish per-domain sampling weights): a domain
with weight w < 1 is downsampled to a w fraction, w > 1 is upsampled by
repeating docs (floor(w) full epochs plus a fractional epoch). The reference
repo has no mixture stage; this extends the engine's training-data-pipeline
family with that published recipe as pure column algebra.

Determinism / portability: the Bernoulli draw is the repo's standard
portable md5 uniform (functions/hashing.py) — identical in Spark, DuckDB
and Python, so the sample is reproducible across engines and runs, and a
doc's fate depends only on (seed, doc_id), never on partitioning. This is
the same fixed-seed policy as T4 seeded sampling (FIXTURES.md determinism
rules; the reference seeds from wall-clock instead,
scripts/msmarco/build_hn.py:42).

Scale shape: everything is a projection + filter (zero shuffles, zero UDFs);
upsample explosion emits rows in place. The per-domain report aggregates a
handful of columns to |domains| rows.
"""

from __future__ import annotations

from typing import Mapping

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from openmatch_spark.functions.hashing import md5_rank_col

__all__ = [
    "seeded_uniform_col",
    "mixture_sample",
    "mixture_report",
    "grouped_split",
    "cap_per_group",
    "random_sampler",
    "random_sampler_counts",
]


def seeded_uniform_col(*cols: Column | str, seed: int = 42) -> Column:
    """Portable deterministic U[0,1): first 8 md5 hex chars as uint32/2^32.

    One 8-hex-char ``conv`` fits a signed long exactly (max 2^32-1); the
    DuckDB replica is CAST('0x'||substr(md5(...),1,8) AS UBIGINT)/2^32.
    """
    return F.conv(F.substring(md5_rank_col(*cols, seed=seed), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)


def _weight_col(domain: Column, weights: Mapping[str, float], default_weight: float) -> Column:
    """CASE-WHEN chain (portable to the SQL oracle, unlike a map literal).
    Deterministic order: sorted by domain key."""
    w: Column = F.lit(float(default_weight))
    for k in sorted(weights, reverse=True):
        w = F.when(domain == k, F.lit(float(weights[k]))).otherwise(w)
    return w


def mixture_sample(
    corpus: DataFrame,
    weights: Mapping[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    default_weight: float = 0.0,
    explode_copies: bool = False,
) -> DataFrame:
    """Domain-weighted deterministic sample of ``corpus``.

    Each doc draws u = U[0,1) from (seed, doc_id) and receives
    ``n_copies = floor(w) + (u < frac(w))`` where w is its domain's weight:
    w=0.25 keeps a quarter of the domain, w=2.5 emits every doc twice plus a
    half-epoch of third copies. Docs with n_copies = 0 are dropped.

    Default: original columns + (sample_u, mix_weight, n_copies) — one row
    per kept doc, repeats expressed as a count (the compact form a writer
    can expand). With ``explode_copies=True``, one row per copy with a
    1-based ``copy_idx`` — the materialized training-shard form.
    """
    w = _weight_col(F.col(domain_col), weights, default_weight)
    u = seeded_uniform_col(F.col(id_col), seed=seed)
    n_copies = (
        F.floor(w).cast("long") + (u < (w - F.floor(w))).cast("long")
    )
    out = (
        corpus.withColumn("sample_u", F.round(u, 6))
        .withColumn("mix_weight", w)
        .withColumn("n_copies", n_copies)
        .where(F.col("n_copies") > 0)
    )
    if not explode_copies:
        return out
    return out.withColumn(
        "copy_idx",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))),
    )


def mixture_report(
    corpus: DataFrame,
    weights: Mapping[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    default_weight: float = 0.0,
) -> DataFrame:
    """Per-domain audit of a mixture: input vs sampled doc and analyzer-token
    counts, realized rate vs target weight. One row per input domain."""
    from openmatch_spark.operators.textstats import token_count_col

    w = _weight_col(F.col(domain_col), weights, default_weight)
    u = seeded_uniform_col(F.col(id_col), seed=seed)
    n_copies = F.floor(w).cast("long") + (u < (w - F.floor(w))).cast("long")
    toks = token_count_col(F.col(text_col)).cast("long")
    return (
        corpus.select(
            F.col(domain_col).alias("domain"),
            w.alias("mix_weight"),
            n_copies.alias("n_copies"),
            toks.alias("n_tokens"),
        )
        .groupBy("domain")
        .agg(
            F.first("mix_weight").alias("target_weight"),
            F.count(F.lit(1)).alias("docs_in"),
            F.sum("n_copies").alias("docs_out"),
            F.sum("n_tokens").alias("tokens_in"),
            F.sum(F.col("n_tokens") * F.col("n_copies")).alias("tokens_out"),
            F.round(
                F.sum("n_copies") / F.count(F.lit(1)).cast("double"), 6
            ).alias("realized_rate"),
        )
    )


def grouped_split(
    corpus: DataFrame,
    fractions: Mapping[str, float],
    group_col: str = "source",
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: every row whose ``group_col``
    value is equal lands in the SAME split, so near-duplicates that share a
    site/domain/url key can never straddle an eval boundary (the standard
    web-corpus split discipline — doc-level random splits leak boilerplate
    and templated pages across train/val).

    ``fractions`` maps split name -> fraction of the GROUP key space (not of
    rows — a heavy domain drags its whole mass into one split; that is the
    point). Interval order is the mapping's iteration order; fractions must
    be positive and sum to <= 1 + 1e-9. Groups drawing beyond the total get
    a NULL split (held out). The draw is the portable md5 uniform on the
    group value alone, so assignment is reproducible across engines and
    independent of partitioning; NULL group values all share one draw.

    Pure projection — zero shuffles, zero UDFs; appends ``split_col``.
    """
    if not fractions:
        raise ValueError("fractions must not be empty")
    fracs = {k: float(v) for k, v in fractions.items()}
    if any(v <= 0 for v in fracs.values()):
        raise ValueError(f"fractions must be positive: {fracs}")
    if sum(fracs.values()) > 1 + 1e-9:
        raise ValueError(f"fractions sum to > 1: {fracs}")

    u = seeded_uniform_col(F.col(group_col), seed=seed)
    cum = 0.0
    bounds = []
    for name, frac in fracs.items():
        cum += frac
        bounds.append((name, cum))
    # build the CASE chain inside-out so earlier intervals win
    split: Column = F.lit(None).cast("string")
    for name, upper in reversed(bounds):
        split = F.when(u < F.lit(upper), F.lit(name)).otherwise(split)
    return corpus.withColumn(split_col, split)


def temperature_weights(
    corpus: DataFrame,
    domain_col: str,
    alpha: float = 0.7,
    round_to: int = 6,
) -> DataFrame:
    """(domain, n_docs, p_raw, weight) — temperature-scaled mixture
    weights (Arivazhagan et al. 2019 / mT5's language sampling):
    weight_d ∝ p_d^alpha renormalized, so alpha < 1 upsamples the tail
    (alpha=1 keeps natural proportions, alpha→0 approaches uniform).
    Feed the result straight into mixture_sample as its weight table.

    NULL domains count as their own '(null)' bucket so no document
    silently leaves the distribution. The output is domain-table-sized;
    the two scalar totals it needs are driver-side by design."""
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    counts = (
        corpus.select(
            F.coalesce(F.col(domain_col).cast("string"), F.lit("(null)")).alias(
                "domain"
            )
        )
        .groupBy("domain")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    total = float(counts.agg(F.sum("n_docs")).collect()[0][0] or 0)
    if total <= 0:
        raise ValueError("corpus is empty")
    powed = counts.select(
        "domain", "n_docs",
        (F.col("n_docs") / F.lit(total)).alias("p_raw"),
        F.pow(F.col("n_docs") / F.lit(total), F.lit(alpha)).alias("_s"),
    )
    ssum = float(powed.agg(F.sum("_s")).collect()[0][0])
    return powed.select(
        "domain", "n_docs",
        F.round("p_raw", round_to).alias("p_raw"),
        F.round(F.col("_s") / F.lit(ssum), round_to).alias("weight"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    seed: int = 42,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Deterministic per-group cap — the RefinedWeb/CCNet-style "at most N
    pages per host/domain" curation rule: within each group value keep a
    seeded pseudo-random n rows (portable md5 draw over id_cols, so the
    SAME rows survive in Spark, DuckDB, and any rerun), annotated with
    sample_rank (1..n). NULL group values form their own group rather
    than escaping the cap.

    Plan: pure column algebra — one window over the group key (rank by
    the md5 draw with id tie-break), no UDF, no driver state. The window
    sorts each group's rows; a pathologically hot group costs
    O(group log group) in one task — for corpus-scale caps over hosts
    this is the standard shape (the draw is uniform, so the kept set is
    an unbiased subsample of the group).
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    u = seeded_uniform_col(*id_cols, seed=seed)
    w = Window.partitionBy(group_col).orderBy(
        F.asc("_u"), *[F.asc(c) for c in id_cols]
    )
    return (
        df.withColumn("_u", u)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n)
        .drop("_u")
    )


def random_sampler(
    df: DataFrame,
    probability: float,
    seed: int = 42,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """The sampling phase of ES's random_sampler aggregation: keep each
    row independently with `probability`, decided by the portable seeded
    md5 uniform over id_cols — so the SAME rows survive in Spark, DuckDB,
    and any rerun (ES's seed parameter exists for exactly this
    repeatability). Downstream aggregations run over the sample; pair
    with random_sampler_counts for ES's inverse-probability scaling.

    Plan: a pure projection predicate on the scan — zero shuffles, and
    the sample never concentrates (hash-uniform over ids), so at 100 TB
    this is the cheapest way to bound an exploratory aggregation."""
    if not 0.0 < probability <= 1.0:
        raise ValueError(f"probability must be in (0, 1], got {probability}")
    u = seeded_uniform_col(*id_cols, seed=seed)
    return df.where(u < F.lit(float(probability)))


def random_sampler_counts(
    df: DataFrame,
    attr_col: str,
    probability: float,
    seed: int = 42,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """ES random_sampler + terms sub-aggregation: value counts over the
    seeded sample, with doc counts scaled back by 1/probability to
    full-corpus estimates (exactly what ES reports — doc_count in a
    random_sampler subtree is the scaled estimate, not the raw sample
    tally). NULL attribute values bucket explicitly, mirroring
    facet_counts; n_docs_est is rounded to 6 dp for engine-reproducible
    comparison. One projection + one map-side-combined groupBy."""
    s = random_sampler(df, probability, seed=seed, id_cols=id_cols)
    return (
        s.groupBy(F.col(attr_col).alias("value"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_sampled"))
        .withColumn(
            "n_docs_est",
            F.round(F.col("n_sampled") / F.lit(float(probability)), 6),
        )
    )
