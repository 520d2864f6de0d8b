"""Rank fusion — combining retrieval runs (Cormack et al. 2009 RRF, the
standard hybrid sparse+dense combiner; Anserini/Pyserini `fuse`).

    RRF(d) = Σ_runs 1 / (k0 + rank_run(d))      (k0 = 60 by default)

Rank-based fusion is score-scale-free: BM25 scores and cosine similarities
never need calibrating against each other, which is exactly why RRF is the
default hybrid combiner. Docs missing from a run simply contribute nothing
for that run.

Spark shape: each run is cut to its own top-depth (rank column required),
unioned, then ONE groupBy over (query, doc) sums the reciprocal ranks —
bounded by Σ run sizes (queries × depth × runs), never corpus-sized.
Float determinism: IEEE addition is commutative, so with two runs the
per-doc sum is bit-identical under any accumulation order; beyond ~3 runs
ordering could matter at the last ulp, which only affects exact ties.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def reciprocal_rank_fusion(
    runs: list[DataFrame],
    k: int = 10,
    k0: int = 60,
    depth: int | None = None,
) -> DataFrame:
    """Fused top-k run (query_id, doc_id, score, rank) from N runs, each
    (query_id, doc_id, rank). depth caps how deep each input run counts
    (None = use every row the run carries)."""
    if not runs:
        raise ValueError("need at least one run to fuse")
    tagged = None
    for r in runs:
        part = r.select(
            F.col("query_id").cast("string").alias("query_id"),
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col("rank").cast("int").alias("rank"),
        )
        if depth is not None:
            part = part.where(F.col("rank") <= depth)
        tagged = part if tagged is None else tagged.unionByName(part)
    fused = tagged.groupBy("query_id", "doc_id").agg(
        F.sum(F.lit(1.0) / (F.lit(float(k0)) + F.col("rank"))).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def comb_fusion(
    runs: list[DataFrame],
    k: int = 10,
    method: str = "sum",
    depth: int | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """Score-based fusion — CombSUM / CombMNZ (Fox & Shaw 1994; Lee 1997),
    the classic complement to rank-based RRF when run scores ARE worth
    keeping: per-run per-query min-max normalization puts every run on
    [0, 1], then

        CombSUM(d) = Σ_runs norm_score_run(d)
        CombMNZ(d) = |{runs containing d}| × CombSUM(d)

    A doc absent from a run contributes 0 for that run (standard Comb*
    semantics). Degenerate normalization (a query whose run has one doc,
    or all-equal scores) maps to 1.0 — present-with-top-score, not 0/0.

    Determinism: callers should pass runs whose scores are already
    rounded (the house contract rounds at 6 dp); `round_to` then rounds
    the fused score BEFORE ranking, with doc_id as tie-break, so the
    ranking is reproducible across engines. IEEE addition over ≤2 runs is
    order-free; beyond that ties at the last ulp are absorbed by the
    rounding.

    Spark shape: each run is (queries × depth)-bounded; the min/max are
    per-query window functions over each run (no corpus scan), one union,
    ONE groupBy on (query, doc) — same bounded plan family as RRF.

    runs: each (query_id, doc_id, score[, rank]). depth (requires rank)
    caps how deep each run counts.
    """
    if not runs:
        raise ValueError("need at least one run to fuse")
    if method not in ("sum", "mnz"):
        raise ValueError(f"method must be 'sum' or 'mnz', got {method!r}")
    wq = Window.partitionBy("query_id")
    tagged = None
    for r in runs:
        cols = [
            F.col("query_id").cast("string").alias("query_id"),
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col("score").cast("double").alias("score"),
        ]
        if depth is not None:
            part = r.select(*cols, F.col("rank").cast("int").alias("rank"))
            part = part.where(F.col("rank") <= depth).drop("rank")
        else:
            part = r.select(*cols)
        mn = F.min("score").over(wq)
        mx = F.max("score").over(wq)
        part = part.select(
            "query_id",
            "doc_id",
            F.when(mx == mn, F.lit(1.0))
            .otherwise((F.col("score") - mn) / (mx - mn))
            .alias("ns"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    fused = tagged.groupBy("query_id", "doc_id").agg(
        F.sum("ns").alias("_s"),
        F.count(F.lit(1)).cast("double").alias("_m"),
    )
    score = F.col("_s") if method == "sum" else F.col("_m") * F.col("_s")
    if round_to is not None:
        score = F.round(score, round_to)
    fused = fused.select("query_id", "doc_id", score.alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def rescore_window(
    run: DataFrame,
    rescore: DataFrame,
    window_size: int,
    k: int = 10,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    round_to: int | None = 6,
) -> DataFrame:
    """The Elasticsearch `rescore` surface: re-rank only the top
    `window_size` docs of each query's first-pass run with a second
    scorer, leaving everything below the window in its original order
    (after the window). Final score inside the window =
    query_weight × first_score + rescore_weight × second_score; a window
    doc the rescorer doesn't match keeps query_weight × first_score
    (the rescore term contributes 0, ES's default score_mode=total).
    Docs below the window keep their original score untouched.

    run: (query_id, doc_id, score, rank); rescore: (query_id, doc_id,
    score) from any second scorer (QLD, BM25F, a cross-encoder run...).
    Returns (query_id, doc_id, score, rank, in_window). round_to rounds
    the combined score BEFORE ranking (engine-reproducible ties).

    Plan: the window join is bounded by queries × window_size (broadcast
    against the rescorer's run); the final order is ONE window function
    over segment/score sort keys — no corpus access at all.
    """
    if window_size <= 0:
        raise ValueError(f"window_size must be positive, got {window_size}")
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("score").cast("double").alias("score"),
        F.col("rank").cast("int").alias("rank"),
    )
    rs = rescore.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("score").cast("double").alias("_rs"),
    )
    win = base.where(F.col("rank") <= window_size).join(
        rs, ["query_id", "doc_id"], "left"
    )
    combined = (
        F.lit(float(query_weight)) * F.col("score")
        + F.lit(float(rescore_weight)) * F.coalesce(F.col("_rs"), F.lit(0.0))
    )
    if round_to is not None:
        combined = F.round(combined, round_to)
    win = win.select(
        "query_id", "doc_id",
        combined.alias("score"),
        F.lit(0).alias("_seg"),
        combined.alias("_ord"),
        F.lit(True).alias("in_window"),
    )
    tail = base.where(F.col("rank") > window_size).select(
        "query_id", "doc_id", "score",
        F.lit(1).alias("_seg"),
        (-F.col("rank")).cast("double").alias("_ord"),
        F.lit(False).alias("in_window"),
    )
    both = win.unionByName(tail)
    w = Window.partitionBy("query_id").orderBy(
        F.asc("_seg"), F.desc("_ord"), F.asc("doc_id")
    )
    return (
        both.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank", "in_window")
    )
