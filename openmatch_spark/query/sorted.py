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


def search_sorted_indexed(
    index: BM25Index,
    queries: DataFrame,
    k: int = 100,
    ascending: bool | None = None,
    distributed_threshold: int = _DISTRIBUTED_TOKENIZE_MIN_QUERIES,
) -> DataFrame:
    """search_sorted over an INDEX-SORTED index (build_index(index_sort=
    ...)) — no attribute join (the docmap carries the sort value) and,
    when the requested direction matches the build direction, block-
    pruned EARLY TERMINATION: only blocks with block_id <
    ceil(k / block_size) are read per posting list.

    Why that cut is lossless: per shard, doc ordinals follow the sort
    field, posting lists are doc_ord-ascending by construction, and
    blocks are consecutive block_size chunks — so a list's first B
    blocks hold its B*block_size best-sorted postings. Any doc in the
    query's true top-k has at most k-1 better matches, hence is among
    the first k entries of every term list that contains it; the first
    ceil(k/block_size) blocks (all full except the last) cover those.
    The union of per-term prefixes therefore covers the top-k of the
    whole OR candidate set. Two honesty gates: tombstones break the
    argument (a pruned block's doc may replace a deleted one), so any
    deletes disable the cap; and a direction opposite to the build
    order reads full lists (Lucene likewise early-terminates only in
    the index-sort direction).

    ascending: None = the index's build direction (the fast path);
    passing the opposite direction still answers, without the cap.

    Returns (query_id, doc_id, sort_value, rank) — identical rows to
    search_sorted(index, queries, docmap-sort-values, k)."""
    stats = index.stats
    meta = stats.get("index_sort")
    if not meta:
        raise ValueError(
            "index has no index_sort (build_index(index_sort=...)); use "
            "search_sorted with an attribute frame instead"
        )
    build_desc = bool(meta.get("desc", False))
    want_asc = (not build_desc) if ascending is None else bool(ascending)
    matches_build = want_asc == (not build_desc)
    cap = None
    if matches_build and not index.has_deletes():
        cap = -(-int(k) // int(stats["block_size"]))  # ceil
    empty = index.spark.createDataFrame(
        [], "query_id string, doc_id string, sort_value double, rank int"
    )
    decoded, qterms = decoded_query_postings(
        index, queries, distributed_threshold, block_cap=cap
    )
    if decoded is None:
        return empty
    candidates = (
        decoded.join(qterms, "term")
        .select("query_id", "shard", "doc_ord")
        .distinct()
    )
    hydrated = candidates.join(
        index.docmap.select("shard", "doc_ord", "doc_id", "sort_value"),
        ["shard", "doc_ord"],
    )
    key = (
        F.asc_nulls_last("sort_value") if want_asc
        else F.desc_nulls_last("sort_value")
    )
    w = Window.partitionBy("query_id").orderBy(key, F.asc("doc_id"))
    return (
        hydrated.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "sort_value", "rank")
    )
