"""Sort-by-attribute search — the ES `sort` surface: the query acts as a
FILTER (any-term match, like search's OR candidate set) and the top-k is
taken by a document attribute instead of relevance ("newest matching
pages", "cheapest matching products").

Plan: the same vocabulary-pruned postings decode as search produces the
candidate (query, shard, doc_ord) set; tombstones mask before any cut;
the docmap join hydrates doc_id; the attribute table joins on doc_id
(AQE picks broadcast when it is small — pass a pre-projected frame with
just (doc_id, sort column) to keep it so); one window takes the top-k by
(sort value, doc_id). Scores are deliberately absent — ES leaves _score
null under explicit sort, and skipping the weight aggregation makes the
candidate phase strictly cheaper than ranked search.

NULL sort values order LAST in both directions (ES's missing:_last
default), so a doc without the attribute can never displace a real hit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.index.load import BM25Index
from openmatch_spark.query.bm25_search import (
    _DISTRIBUTED_TOKENIZE_MIN_QUERIES,
    decoded_query_postings,
)


def search_sorted(
    index: BM25Index,
    queries: DataFrame,
    attrs: DataFrame,
    sort_col: str,
    ascending: bool = True,
    k: int = 100,
    distributed_threshold: int = _DISTRIBUTED_TOKENIZE_MIN_QUERIES,
) -> DataFrame:
    """(query_id, doc_id, sort_value, rank) — top-k matching docs ordered
    by attrs[sort_col] (ties broken by doc_id ASC). attrs: (doc_id,
    <sort_col> ...); docs matching the query but absent from attrs sort
    as NULL (last)."""
    empty = index.spark.createDataFrame(
        [], "query_id string, doc_id string, sort_value double, rank int"
    )
    decoded, qterms = decoded_query_postings(index, queries, distributed_threshold)
    if decoded is None:
        return empty
    candidates = (
        decoded.join(qterms, "term")
        .select("query_id", "shard", "doc_ord")
        .distinct()
    )
    hydrated = candidates.join(
        index.docmap.select("shard", "doc_ord", "doc_id"), ["shard", "doc_ord"]
    ).join(
        attrs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col(sort_col).cast("double").alias("sort_value"),
        ),
        "doc_id",
        "left",
    )
    key = F.asc_nulls_last("sort_value") if ascending else F.desc_nulls_last(
        "sort_value"
    )
    w = Window.partitionBy("query_id").orderBy(key, F.asc("doc_id"))
    return (
        hydrated.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "sort_value", "rank")
    )
