"""Hard-negative mining / run algebra (SURVEY §2.3 J3-J6, §2.6 T4).

Reference semantics ported to declarative joins:
- build_hard_negatives: scripts/msmarco/build_hn.py:21-55 — negatives are
  run docs NOT in qrels positives (anti join), depth-cut (default 200),
  shuffled, then n_sample (default 30) taken. The reference seeds the
  shuffle with wall-clock (build_hn.py:42); we use a fixed-seed portable
  md5 order instead (FIXTURES.md determinism rules).
- add_ground_truth: driver/retrieve.py:100-111 — force qrels positives into
  the run at score 1000, dedupe keep-max.
- combine_negatives: scripts/ANCE-Tele/combine_negative.py:34-91 — append
  folder-1 negatives to matching query of folder-2 (left outer on query,
  folder-2 rows kept, folder-1 positives discarded).
- depth_cut: utils.py:170-177 (max_len_per_q).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.functions.hashing import md5_rank_col
from openmatch_spark.operators.runio import with_rank


def depth_cut(run: DataFrame, depth: int) -> DataFrame:
    r = run if "rank" in run.columns else with_rank(run)
    return r.where(F.col("rank") <= depth)


def build_hard_negatives(
    run: DataFrame,
    qrels: DataFrame,
    depth: int = 200,
    n_sample: int = 30,
    seed: int = 42,
) -> DataFrame:
    """(query_id, doc_id, sample_rank): sampled negatives per query.

    Anti join beats the reference's per-query dict membership at scale; the
    sample order is a deterministic md5 of (seed, query_id, doc_id), which is
    reproducible across engines (the DuckDB oracle sorts by the same hex).
    """
    negatives = depth_cut(run, depth).join(
        qrels.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_anti"
    )
    w = Window.partitionBy("query_id").orderBy(
        md5_rank_col("query_id", "doc_id", seed=seed), F.asc("doc_id")
    )
    return (
        negatives.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n_sample)
        .select("query_id", "doc_id", "sample_rank")
    )


def add_ground_truth(run: DataFrame, qrels: DataFrame, score: float = 1000.0) -> DataFrame:
    """Union qrels positives into the run at a pinned score; keep-max dedupe;
    deterministic re-rank. (driver/retrieve.py:100-111)"""
    gt = qrels.select(
        "query_id", "doc_id", F.lit(float(score)).alias("score")
    )
    merged = (
        run.select("query_id", "doc_id", "score")
        .unionByName(gt)
        .groupBy("query_id", "doc_id")
        .agg(F.max("score").alias("score"))
    )
    return with_rank(merged)


def combine_negatives(groups1: DataFrame, groups2: DataFrame) -> DataFrame:
    """Merge two mined-negative group tables keyed by query_id.

    groups*: (query_id, positives:array<string>, negatives:array<string>).
    Folder-2 rows are kept (outer-keep of 2), folder-1 negatives appended
    after folder-2's, folder-1 positives discarded
    (combine_negative.py:74-91).
    """
    g1 = groups1.select("query_id", F.col("negatives").alias("neg1"))
    return (
        groups2.join(g1, "query_id", "left")
        .select(
            "query_id",
            "positives",
            F.concat(
                F.col("negatives"), F.coalesce(F.col("neg1"), F.array())
            ).alias("negatives"),
        )
    )


def mined_groups(
    negatives: DataFrame, qrels: DataFrame
) -> DataFrame:
    """(query_id, positives, negatives) train-group table
    (utils.py:101-109 shape, arrays of doc ids sorted deterministically)."""
    pos = qrels.groupBy("query_id").agg(
        F.sort_array(F.collect_list("doc_id")).alias("positives")
    )
    neg = negatives.groupBy("query_id").agg(
        F.array_sort(
            F.collect_list(F.struct("sample_rank", "doc_id"))
        ).alias("_n")
    ).select(
        "query_id", F.transform("_n", lambda s: s["doc_id"]).alias("negatives")
    )
    return pos.join(neg, "query_id", "inner")
