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
