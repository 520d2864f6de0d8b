"""Re-ranking pipeline (SURVEY §3.3, reference driver/rerank.py +
retriever/reranker.py:99-154).

The reference expands a previous-stage run into (query, doc) pairs, scores
each pair with a model forward, and re-sorts per query. Our engine keeps the
same dataflow — run -> hydrate (J1/J2) -> pair scorer -> deterministic
re-rank window — with the scorer slot pluggable:

- bm25_pair_scorer: exact BM25 re-scoring of the candidate pair using FROZEN
  index statistics (broadcast df/idf of the query's terms + avgdl/N) — the
  classic "first stage is approximate, re-score exactly" pattern, and a
  strong self-check: re-ranking the engine's own run must reproduce its
  scores bit-for-bit (tested).
- any user fn(query_text: pd.Series, doc_text: pd.Series) -> pd.Series of
  float64 — e.g. a cross-encoder forward inside mapInPandas (X4); see
  operators/inference.py for the executor-side model-loading skeleton.

The reference's per-rank temp-file merge (reranker.py:136-152) collapses
into the final window — no file exchange, one shuffle.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from openmatch_spark.operators.runio import with_rank
from openmatch_spark.operators.transforms import hydrate_run
from openmatch_spark.functions.localrel import in_list


def bm25_pair_scorer(stats: dict, term_stats: dict[str, tuple[int, float]]):
    """Build a pair scorer closed over frozen corpus statistics.

    stats: index stats.json dict (n_docs, avgdl, k1, b, analyzer).
    term_stats: {term: (df, idf)} for (at least) all query terms.
    """
    from openmatch_spark.analysis import tokenize_py

    analyzer = stats["analyzer"]
    k1, b = float(stats["k1"]), float(stats["b"])
    avgdl = float(stats["avgdl"]) or 1.0

    def score(query_text: pd.Series, doc_text: pd.Series) -> pd.Series:
        from collections import Counter

        out = []
        for q, d in zip(query_text, doc_text):
            qterms = Counter(tokenize_py(q, analyzer))
            dterms = Counter(tokenize_py(d, analyzer))
            dl = sum(dterms.values())
            s = 0.0
            for t in sorted(qterms):  # canonical ascending-term order
                if t not in term_stats or t not in dterms:
                    continue
                tf = dterms[t]
                idf = term_stats[t][1]
                s += qterms[t] * idf * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))
            out.append(s)
        return pd.Series(out, dtype="float64")

    return score


def rerank(
    run: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    scorer: Callable[[pd.Series, pd.Series], pd.Series],
    depth: int | None = None,
) -> DataFrame:
    """run + texts + pair scorer -> re-ranked (query_id, doc_id, score, rank).

    depth applies the reference's reranking_depth cut (W2) before scoring.
    """
    r = run if "rank" in run.columns else with_rank(run)
    if depth is not None:
        r = r.where(F.col("rank") <= depth)
    pairs = hydrate_run(r.select("query_id", "doc_id"), corpus, queries)

    score_udf = pandas_udf(scorer, DoubleType())
    scored = pairs.select(
        "query_id",
        "doc_id",
        score_udf(F.col("query_text"), F.col("doc_text")).alias("score"),
    )
    return with_rank(scored)


def rerank_bm25(index, run: DataFrame, corpus: DataFrame, queries: DataFrame,
                depth: int | None = None) -> DataFrame:
    """Exact-BM25 rerank against a BM25Index's frozen statistics.

    Query texts tokenize driver-side below the same threshold the search
    path uses (query/bm25_search.py _DISTRIBUTED_TOKENIZE_MIN_QUERIES);
    above it, tokenization fans out to executors and only the DISTINCT
    query vocabulary — bounded by dictionary size, not batch size — comes
    back to build the broadcast term-stats table."""
    from collections import Counter

    from openmatch_spark.analysis import tokenize_col, tokenize_py
    from openmatch_spark.query.bm25_search import (
        _DISTRIBUTED_TOKENIZE_MIN_QUERIES,
    )

    analyzer = index.stats["analyzer"]
    # snapshot the queries ONCE: the size probe below plus the distributed
    # vocabulary scan (and the final rerank join) would otherwise re-evaluate
    # the source, and over a non-deterministic source the collected
    # vocabulary could miss terms for queries that differ between
    # evaluations (ADVICE r3)
    queries = queries.localCheckpoint(eager=True)
    head = queries.select("text").take(_DISTRIBUTED_TOKENIZE_MIN_QUERIES + 1)
    if len(head) > _DISTRIBUTED_TOKENIZE_MIN_QUERIES:
        qterms = {
            r["term"]
            for r in queries.select(
                F.explode(tokenize_col(F.col("text"), analyzer)).alias("term")
            )
            .distinct()
            .collect()
        }
    else:
        qterms = set()
        for row in head:
            qterms |= set(Counter(tokenize_py(row["text"], analyzer)))
    rows = (
        index.dictionary.where(in_list("term", sorted(qterms)))
        .select("term", "df", "idf")
        .collect()
    )
    term_stats = {r["term"]: (int(r["df"]), float(r["idf"])) for r in rows}
    return rerank(run, corpus, queries, bm25_pair_scorer(index.stats, term_stats), depth=depth)
