"""Distributed BM25 top-k search over the packed index (SURVEY §3.2 Spark shape).

Plan:
  queries ─tokenize─► (query_id, term, qtf)
          ─join dictionary─► matched terms (+ term_bucket)    [queries are small:
                                                               collected & broadcast]
  postings ─bucket-pruned scan─► blocks for matched terms only
           ─broadcast join query terms─► (query, term, block)
           ─repartition(query_id, shard)─► applyInPandas kernel:
                block-max MaxScore pruning + canonical re-score ─► shard top-k
           ─join docmap─► doc_id
           ─window (score DESC, doc_id ASC) rank<=k─► run(query_id, doc_id, score, rank)

This is the reference's partition-wise search + score merge
(dense_retriever.py:318-335 `SuccessiveRetriever`, utils.py:262-283
`merge_retrieval_results_by_score`) as one declarative plan: per-(query,shard)
partial top-k, then a final window top-k — with the first-seen-wins dup rule
replaced by the deterministic (score DESC, doc_id ASC) rank everywhere
(utils.py:141-146 relies on Python sort stability; we pin it down).

Determinism: per-doc scores are summed in canonical ascending-term order in
both engine and oracle; pruning (which visits terms by impact) only selects
candidates — survivors are re-scored canonically before emission.

Query-side weighting: a term repeated in the query multiplies its weight by
its query term frequency (Lucene/Anserini semantics); OOV terms drop out at
the dictionary join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from openmatch_spark.analysis import tokenize_col
from openmatch_spark.functions.codec import decode_postings
from openmatch_spark.index.load import BM25Index

_KERNEL_OUT = StructType(
    [
        StructField("query_id", StringType()),
        StructField("shard", IntegerType()),
        StructField("doc_ord", LongType()),
        StructField("score", DoubleType()),
    ]
)


def query_terms(index: BM25Index, queries: DataFrame) -> DataFrame:
    """(query_id, term, qtf, term_bucket, idf) for in-vocabulary terms."""
    analyzer = index.stats["analyzer"]
    qt = (
        queries.select(
            F.col("query_id").cast("string").alias("query_id"),
            F.explode(tokenize_col(F.col("text"), analyzer)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("qtf"))
    )
    return qt.join(index.dictionary.select("term", "term_bucket"), "term")


def _accumulate(ords_list, weights_list):
    """Sum weights per doc, preserving list order for equal docs (canonical)."""
    ords = np.concatenate(ords_list)
    weights = np.concatenate(weights_list)
    uniq, inv = np.unique(ords, return_inverse=True)
    acc = np.zeros(uniq.shape[0], dtype=np.float64)
    np.add.at(acc, inv, weights)
    return uniq, acc


def _score_group(pdf: pd.DataFrame, k: int, mode: str) -> pd.DataFrame:
    """Kernel for one (query_id, shard) group: blocks -> shard-local top-k."""
    qid = pdf["query_id"].iloc[0]
    shard = int(pdf["shard"].iloc[0])

    # decode lazily per term; terms visited by impact for pruning,
    # but final scores are recomputed in ascending-term order.
    terms = {}
    for term, g in pdf.groupby("term", sort=True):
        g = g.sort_values("block_id")
        qtf = float(g["qtf"].iloc[0])
        terms[term] = {
            "qtf": qtf,
            "blocks": g[["first_ord", "last_ord", "max_score", "docs", "scores"]],
            "ub": qtf * float(g["max_score"].max()),
        }

    def decode_term(t, lo=None, hi=None, member=None):
        """Decoded (ords, qtf*weights) for term t, optionally restricted."""
        rows = terms[t]["blocks"]
        if lo is not None:
            rows = rows[(rows["last_ord"] >= lo) & (rows["first_ord"] <= hi)]
        outs, outw = [], []
        qtf = terms[t]["qtf"]
        for _, r in rows.iterrows():
            o = decode_postings(r["docs"])
            w = np.frombuffer(r["scores"], dtype=np.float64) * qtf
            if member is not None:
                m = np.isin(o, member)
                o, w = o[m], w[m]
            outs.append(o)
            outw.append(w)
        if not outs:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        return np.concatenate(outs), np.concatenate(outw)

    term_names = sorted(terms)
    if mode == "daat" or len(term_names) == 1:
        pairs = [decode_term(t) for t in term_names]
        pairs = [p for p in pairs if p[0].size]
        if not pairs:
            return pd.DataFrame(columns=["query_id", "shard", "doc_ord", "score"])
        uniq, acc = _accumulate([p[0] for p in pairs], [p[1] for p in pairs])
    else:
        # Block-max MaxScore (TAAT flavor): visit terms by descending upper
        # bound; once the remaining upper-bound sum can't beat the current
        # kth score, new docs are provably out — restrict remaining terms to
        # the candidate set (and to candidate ord-range -> block skipping).
        by_impact = sorted(term_names, key=lambda t: -terms[t]["ub"])
        rem = [terms[t]["ub"] for t in by_impact]
        suffix = np.cumsum(rem[::-1])[::-1]
        uniq = np.empty(0, dtype=np.int64)
        acc = np.empty(0, dtype=np.float64)
        frozen = False
        for j, t in enumerate(by_impact):
            if frozen and uniq.size:
                o, w = decode_term(t, lo=int(uniq.min()), hi=int(uniq.max()), member=uniq)
            else:
                o, w = decode_term(t)
            if o.size:
                uniq, acc = _accumulate([uniq, o], [acc, w])
            if not frozen and j + 1 < len(by_impact) and uniq.size >= k:
                theta = np.partition(acc, -k)[-k]
                if suffix[j + 1] < theta:
                    frozen = True
        if not uniq.size:
            return pd.DataFrame(columns=["query_id", "shard", "doc_ord", "score"])
        # canonical re-score of the top candidates (ascending-term sum order)
        m = min(uniq.size, max(4 * k, 64))
        cand = uniq[np.argsort(-acc, kind="stable")[:m]]
        cand.sort()
        pairs = [decode_term(t, lo=int(cand.min()), hi=int(cand.max()), member=cand) for t in term_names]
        pairs = [p for p in pairs if p[0].size]
        uniq, acc = _accumulate([p[0] for p in pairs], [p[1] for p in pairs])

    # shard-local top-k; doc_ord asc == doc_id asc within a shard (docmap
    # ordinals are assigned by doc_id sort), so this tie-break is final.
    order = np.lexsort((uniq, -acc))[:k]
    return pd.DataFrame(
        {
            "query_id": qid,
            "shard": shard,
            "doc_ord": uniq[order],
            "score": acc[order],
        }
    )


def search(
    index: BM25Index,
    queries: DataFrame,
    k: int = 100,
    mode: str = "maxscore",
    remove_identical: bool = False,
) -> DataFrame:
    """Top-k BM25 run: (query_id, doc_id, score, rank).

    remove_identical drops hits where doc_id == query_id
    (reference dense_retriever.py:252-253, flag arguments.py:207).
    """
    spark = index.spark
    qt = query_terms(index, queries)
    matched = qt.collect()  # queries are small (reference materializes them too)
    if not matched:
        return spark.createDataFrame(
            [], "query_id string, doc_id string, score double, rank int"
        )
    buckets = sorted({r["term_bucket"] for r in matched})
    qt_small = spark.createDataFrame(
        [(r["query_id"], r["term"], float(r["qtf"])) for r in matched],
        "query_id string, term string, qtf double",
    )
    blocks = (
        index.postings.where(F.col("term_bucket").isin(buckets))  # partition pruning
        .join(F.broadcast(qt_small), "term")
        .select(
            "query_id", "shard", "term", "qtf", "block_id",
            "first_ord", "last_ord", "max_score", "docs", "scores",
        )
    )
    partial = (
        blocks.repartition("query_id", "shard")
        .groupBy("query_id", "shard")
        .applyInPandas(lambda pdf: _score_group(pdf, k, mode), _KERNEL_OUT)
    )
    hits = partial.join(
        index.docmap.select("shard", "doc_ord", "doc_id"), ["shard", "doc_ord"]
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    run = (
        hits.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
    if remove_identical:
        run = run.where(F.col("query_id") != F.col("doc_id"))
        w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        run = run.withColumn("rank", F.row_number().over(w2))
    return run
