"""TREC run algebra: sink/source (SURVEY §2.1 S8/S11).

Reference: save_as_trec (src/openmatch/utils.py:131-146) sorts each query's
hits by score desc and writes `qid Q0 docid rank score runid`;
load_from_trec (utils.py:149-179) parses 6- or 3-column lines with an
optional per-query depth cut (max_len_per_q).

Our rank is always recomputed with the deterministic window
(score DESC, doc_id ASC) — the reference relies on Python sort stability.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

def rank_window():
    """The deterministic rank order used engine-wide."""
    return Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))


def with_rank(run: DataFrame) -> DataFrame:
    return run.withColumn("rank", F.row_number().over(rank_window()))


def trec_lines(run: DataFrame, run_id: str = "om-spark") -> DataFrame:
    """(line) column of TREC-format text, globally ordered for the sink."""
    r = run if "rank" in run.columns else with_rank(run)
    return r.select(
        F.concat_ws(
            " ",
            F.col("query_id"),
            F.lit("Q0"),
            F.col("doc_id"),
            F.col("rank").cast("string"),
            F.format_string("%.6f", F.col("score")),  # no locale separators
            F.lit(run_id),
        ).alias("value")
    )


def save_as_trec(run: DataFrame, path: str, run_id: str = "om-spark") -> None:
    """Write the run as TREC text, one file per query-partition.

    At scale a run is small relative to the corpus; coalesce(1) gives the
    reference's single-file contract for eval tooling.
    """
    r = with_rank(run) if "rank" not in run.columns else run
    trec_lines(r.orderBy("query_id", "rank"), run_id).coalesce(1).write.mode(
        "overwrite"
    ).text(path)


def load_from_trec(
    spark: SparkSession, path: str, max_len_per_q: int | None = None
) -> DataFrame:
    """Parse TREC run text -> (query_id, doc_id, score, rank).

    Accepts 6-col (`qid Q0 docid rank score runid`) and 3-col
    (`qid docid score`) formats like the reference (utils.py:155-170);
    rank is recomputed deterministically either way.
    """
    raw = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    six = raw.where(F.size(parts) >= 6).select(
        parts.getItem(0).alias("query_id"),
        parts.getItem(2).alias("doc_id"),
        parts.getItem(4).cast("double").alias("score"),
    )
    three = raw.where(F.size(parts) == 3).select(
        parts.getItem(0).alias("query_id"),
        parts.getItem(1).alias("doc_id"),
        parts.getItem(2).cast("double").alias("score"),
    )
    run = with_rank(six.unionByName(three))
    if max_len_per_q is not None:
        run = run.where(F.col("rank") <= max_len_per_q)
    return run
