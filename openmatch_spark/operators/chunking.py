"""Passage chunking + passage-score aggregation (MaxP document ranking).

Long web documents exceed what a first-stage ranker sees usefully at once;
the standard remedy (Dai & Callan, SIGIR 2019 "Deeper Text Understanding
for IR with Contextual Neural Language Modeling"; Anserini's MS MARCO doc
regressions) is: split each doc into overlapping fixed-size token windows,
rank PASSAGES, then aggregate per-doc as the max (MaxP), first (FirstP) or
sum (SumP) of its passage scores.

Spark shape — both stages are pure column algebra, no UDF, no extra shuffle
beyond what scoring itself needs:

  chunk_passages   tokenize (JVM) -> posexplode over a stride sequence ->
                   array slice + join: one projection pass over the corpus
                   scan, whole-stage codegen end to end.
  score_aggregate  one groupBy (query, doc) + window re-rank, bounded by
                   the passage run (queries x k), not the corpus.

Scale: chunking multiplies the corpus by ~n_tokens/stride rows BEFORE
indexing — at 100 TB that is a deliberate storage/recall trade the caller
makes per collection (MS MARCO doc -> passage is exactly this). The chunked
table partitions/buckets like any corpus; doc reconstruction needs no join
because the passage id embeds its parent id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.analysis import tokenize_col

PASSAGE_SEP = "#"


def chunk_passages(
    docs: DataFrame,
    size: int = 128,
    stride: int = 64,
    analyzer: str = "simple",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(passage_id, doc_id, passage_idx, text, n_tokens): overlapping token
    windows of ``size`` every ``stride`` tokens (the last window may be
    shorter). Docs with zero tokens emit NO passages (an empty passage can
    never be retrieved; callers needing total coverage keep the doc table).

    passage_id = '<doc_id>#<passage_idx>' — parseable back to the parent
    with one regexp, no join.
    """
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")
    toks = tokenize_col(F.col(text_col), analyzer)
    base = docs.select(
        F.col(id_col).cast("string").alias("doc_id"), toks.alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    # window starts 0, stride, 2*stride, ... <= n-1 (sequence is inclusive)
    starts = F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
    return (
        base.where(F.col("_n") > 0)
        .select("doc_id", "_toks", "_n", F.posexplode(starts).alias("passage_idx", "_s"))
        .select(
            F.concat_ws(PASSAGE_SEP, "doc_id", "passage_idx").alias("passage_id"),
            "doc_id",
            "passage_idx",
            F.array_join(F.slice("_toks", F.col("_s") + 1, size), " ").alias("text"),
            F.least(F.lit(size), F.col("_n") - F.col("_s")).cast("int").alias("n_tokens"),
        )
    )


def score_aggregate(
    passage_run: DataFrame,
    k: int = 100,
    agg: str = "max",
    passage_id_col: str = "doc_id",
    round_to: int | None = None,
) -> DataFrame:
    """Passage run -> document run (query_id, doc_id, score, rank).

    agg: "max" (MaxP — the robust default), "first" (FirstP: the passage
    with passage_idx 0; docs whose first passage missed the passage top-k
    drop out, faithful to FirstP-over-a-passage-run), or "sum" (SumP).
    Deterministic final order (score DESC, doc_id ASC), same contract as
    search().

    round_to: round the doc score BEFORE ranking. Overlapping windows make
    cross-doc exact ties common, and summation-order ulps would otherwise
    decide those ranks engine-dependently; ranking on the rounded score
    makes the (score DESC, doc_id ASC) order reproducible across engines
    (rounding is monotone, so round(max) == max(round)).
    """
    doc = F.regexp_replace(F.col(passage_id_col), f"{PASSAGE_SEP}[0-9]+$", "")
    pr = passage_run.withColumn("_doc", doc)
    if agg == "max":
        scores = pr.groupBy("query_id", "_doc").agg(F.max("score").alias("score"))
    elif agg == "sum":
        scores = pr.groupBy("query_id", "_doc").agg(F.sum("score").alias("score"))
    elif agg == "first":
        first = F.col(passage_id_col).endswith(f"{PASSAGE_SEP}0")
        scores = pr.where(first).select("query_id", "_doc", "score")
    else:
        raise ValueError(f"unknown agg: {agg}")
    if round_to is not None:
        scores = scores.withColumn("score", F.round("score", round_to))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("_doc"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("_doc").alias("doc_id"), "score", "rank")
    )
