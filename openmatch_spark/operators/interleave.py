"""Team-draft interleaving — the online-evaluation surface (Radlinski,
Kurup & Joachims 2008): merge two rankers' lists for the SAME query into
one list a user can be shown, attributing each slot to the ranker that
contributed it; clicks on team-A docs vs team-B docs then compare the
rankers with interleaving's well-known sensitivity advantage over A/B
splits. Reference counterpart: none — the reference evaluates offline
only; interleaving is the serving-side complement of its metric suite.

Protocol (pinned exactly, so the SQL oracle can replay it):
  * at each position, the team with FEWER attributed picks so far picks;
    ties break by a deterministic coin — the portable md5 uniform of
    (seed, query_id, position) < 0.5 means A (functions/hashing.py: the
    draw is bit-identical in Spark, Python, and DuckDB).
  * the picking team takes its highest-ranked document not yet in the
    interleaved list (docs occurring in both lists are consumed once);
    if its list is exhausted, the OTHER team picks and gets attribution.
  * stop at k picks or when both lists are exhausted.

Scale shape: both runs are (queries × depth)-bounded, so the greedy runs
per query inside one applyInPandas over tiny groups; nothing else moves.
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from openmatch_spark.functions.hashing import md5_rank_py

_OUT_SCHEMA = "query_id string, pos int, doc_id string, team string"


def team_draft_interleave(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int = 10,
    seed: int = 42,
) -> DataFrame:
    """(query_id, pos, doc_id, team) — the interleaved list with per-slot
    team attribution. run_a / run_b: (query_id, doc_id, rank)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def tag(run: DataFrame, team: str) -> DataFrame:
        return run.select(
            F.col("query_id").cast("string").alias("query_id"),
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col("rank").cast("int").alias("rank"),
            F.lit(team).alias("src"),
        )

    both = tag(run_a, "A").unionByName(tag(run_b, "B"))

    def _draft(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["query_id"].iloc[0]
        lists = {
            t: pdf[pdf["src"] == t].sort_values("rank")["doc_id"].tolist()
            for t in ("A", "B")
        }
        picked: set[str] = set()
        counts = {"A": 0, "B": 0}
        out = []
        pos = 0
        while pos < k:
            pos += 1
            if counts["A"] < counts["B"]:
                pref = "A"
            elif counts["B"] < counts["A"]:
                pref = "B"
            else:
                u = int(md5_rank_py(qid, pos, seed=seed)[:8], 16) / 4294967296.0
                pref = "A" if u < 0.5 else "B"
            other = "B" if pref == "A" else "A"
            team, doc = None, None
            for t in (pref, other):
                for d in lists[t]:
                    if d not in picked:
                        team, doc = t, d
                        break
                if doc is not None:
                    break
            if doc is None:  # both lists exhausted
                break
            picked.add(doc)
            counts[team] += 1
            out.append((qid, pos, doc, team))
        return pd.DataFrame(out, columns=["query_id", "pos", "doc_id", "team"])

    return both.groupBy("query_id").applyInPandas(_draft, _OUT_SCHEMA)


def interleave_credit(
    interleaved: DataFrame, clicks: DataFrame
) -> DataFrame:
    """(query_id, clicks_a, clicks_b, winner) — score an interleaving
    session: count clicked slots per team; the team with strictly more
    clicked slots wins the query ('tie' otherwise). clicks: (query_id,
    doc_id) rows of clicked documents."""
    c = clicks.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    ).distinct()
    hit = interleaved.join(c, ["query_id", "doc_id"])
    per_q = hit.groupBy("query_id").agg(
        F.sum(F.when(F.col("team") == "A", 1).otherwise(0))
        .cast("long").alias("clicks_a"),
        F.sum(F.when(F.col("team") == "B", 1).otherwise(0))
        .cast("long").alias("clicks_b"),
    )
    base = interleaved.select("query_id").distinct()
    return base.join(per_q, "query_id", "left").select(
        "query_id",
        F.coalesce("clicks_a", F.lit(0)).cast("long").alias("clicks_a"),
        F.coalesce("clicks_b", F.lit(0)).cast("long").alias("clicks_b"),
        F.when(F.coalesce("clicks_a", F.lit(0)) > F.coalesce("clicks_b", F.lit(0)), "A")
        .when(F.coalesce("clicks_b", F.lit(0)) > F.coalesce("clicks_a", F.lit(0)), "B")
        .otherwise("tie")
        .alias("winner"),
    )
