"""Document deletes (tombstones) and upsert for the packed index.

The reference has no mutable-index surface (its corpora are static TSV/JSONL
dumps); this module is the engine-specific capability a long-lived web index
needs — remove a page (takedown, robots change, crawl error) or re-ingest a
fresher version of a url WITHOUT rebuilding, the Lucene liveDocs design
expressed over Spark tables:

  * ``delete_docs`` resolves each doc_id to every committed (shard, doc_ord)
    occurrence at delete time and APPENDS those pairs to an index-adjacent
    ``deletes`` table. Nothing else moves: postings/docmap/dictionary stay
    byte-identical, and corpus statistics stay frozen (exactly the
    incremental-ingest trade — a deleted doc keeps contributing to df/avgdl
    until a rebaseline, like Lucene's deleted docs until a merge).
  * every query path masks the tombstoned pairs BEFORE its top-k cut
    (kernel-side in bm25_search via the driver-held live-docs map;
    ``BM25Index.mask_deleted`` on the join-shaped boolean/phrase paths), so
    a deleted doc never consumes a result slot and the survivors' scores
    are bit-identical to an undeleted search filtered post-hoc.
  * ``compact_index`` physically drops tombstoned docs during its merge
    (they simply get no ordinal in the merged docmap, so their postings die
    at the remap join) and purges the merged shards' tombstone rows; with
    ``rebaseline_stats=True`` the result is bit-identical to a fresh build
    that never saw the deleted docs (tested).
  * because tombstones are SHARD-scoped, a shard ingested after the delete
    never matches an older tombstone — re-ingesting a url (``upsert_docs``)
    resurrects it with its new content, no tombstone bookkeeping needed.

Scale: the tombstone table is bounded by deletes since the last compaction
(the maintenance cycle purges it), not by index size. The searcher holds it
as {shard -> sorted ord array} on the driver — the same memory contract as
Lucene's per-segment liveDocs bitsets, shipped to scoring kernels in task
closures. delete_docs itself is one docmap join (tombstone side broadcast
when small) + one bounded append; it never touches postings.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from openmatch_spark.index.storage import IndexStorage


def _ids_frame(spark: SparkSession, doc_ids) -> DataFrame:
    """Normalize list[str] | DataFrame(doc_id, ...) to a distinct 1-col frame."""
    if isinstance(doc_ids, DataFrame):
        return doc_ids.select(F.col("doc_id").cast("string")).distinct()
    return spark.createDataFrame(
        [(str(d),) for d in sorted(set(doc_ids))], "doc_id string"
    )


def next_free_shard(store: IndexStorage, stats: dict) -> int:
    """First shard id no committed (or provably once-committed) segment uses.

    The manifest is the source of truth; stats.num_shards only covers the
    pre-manifest era. Postings dirs beyond num_shards with NO manifest mean
    the manifest was lost — allocating over them would let build-resume
    silently skip real work, so refuse (same guard as the streaming drain,
    streaming/incremental.py)."""
    if store.exists("manifest"):
        mx = store.read("manifest").agg(F.max("shard")).collect()[0][0]
        if mx is not None:
            return int(mx) + 1
        return int(stats["num_shards"])
    if store.exists("postings"):
        mx_disk = store.read("postings").agg(F.max("shard")).collect()[0][0]
        if mx_disk is not None and int(mx_disk) >= int(stats["num_shards"]):
            raise RuntimeError(
                f"index has postings for shard {mx_disk} >= "
                f"num_shards={stats['num_shards']} but no manifest: manifest "
                "lost/corrupted — rebuild or restore it; refusing to "
                "allocate shard ids"
            )
    return int(stats["num_shards"])


def delete_docs(
    spark: SparkSession,
    index_dir: str,
    doc_ids,
    table_prefix: str | None = None,
    table_format: str | None = None,
) -> dict:
    """Tombstone every committed occurrence of the given doc_ids.

    doc_ids: list[str] or a DataFrame with a ``doc_id`` column. Idempotent —
    already-tombstoned pairs are not re-appended. Returns
    {"n_requested", "n_matched", "n_new"}; ids matching no live doc are a
    no-op (n_matched < n_requested), not an error.
    """
    from openmatch_spark.index.load import load_index

    ids = _ids_frame(spark, doc_ids)
    n_requested = ids.count()
    idx = load_index(
        spark, index_dir, table_prefix=table_prefix, table_format=table_format
    )
    store = idx._store()
    # every committed occurrence of the id (a url re-ingested by several
    # drains exists in several shards; delete means ALL of them)
    targets = idx.docmap.select("shard", "doc_ord", "doc_id").join(
        F.broadcast(ids), "doc_id"
    )
    if store.exists("deletes"):
        targets = targets.join(
            F.broadcast(store.read("deletes").select("shard", "doc_ord")),
            ["shard", "doc_ord"],
            "left_anti",
        )
        n_matched = (
            idx.docmap.select("doc_id").join(F.broadcast(ids), "doc_id").count()
        )
    else:
        n_matched = None  # targets.count() below IS the matched count
    now = float(time.time())
    new_rows = targets.select(
        F.col("shard").cast("int"),
        F.col("doc_ord").cast("long"),
        "doc_id",
        F.lit(now).alias("deleted_at"),
    )
    new_rows.persist()
    try:
        n_new = new_rows.count()
        if n_new:
            store.append(new_rows, "deletes")
    finally:
        new_rows.unpersist()
    return {
        "n_requested": int(n_requested),
        "n_matched": int(n_matched if n_matched is not None else n_new),
        "n_new": int(n_new),
    }


def purge_deletes_for_shards(store: IndexStorage, shards: list[int]) -> None:
    """Drop tombstone rows whose shard was just physically retired (the
    merge already excluded those docs). Tombstones on OTHER shards stay —
    they still mask live data. Called by compact_index after its commit."""
    if not store.exists("deletes"):
        return
    remaining = store.read("deletes").where(~F.col("shard").isin(shards))
    store.overwrite(remaining, "deletes", stage=True)


def upsert_docs(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    analyzer: str | None = None,
    table_prefix: str | None = None,
    table_format: str | None = None,
) -> dict:
    """Replace (or insert) the given pages: tombstone the urls' current
    occurrences, then ingest the new versions as one appended segment
    (frozen base statistics + extended dictionary — identical semantics to
    a streaming drain; a later compact(rebaseline_stats=True) converges
    scores to a fresh build). A url not yet in the index is a plain insert.

    Returns {"deleted": delete_docs result, "shard": new segment id,
    "n_docs": docs ingested}.
    """
    from openmatch_spark.index.build import build_index

    store = IndexStorage.resolve(
        spark, index_dir, table_prefix=table_prefix, table_format=table_format
    )
    stats = store.read_stats()
    deleted = delete_docs(
        spark,
        index_dir,
        pages.select(F.col("url").alias("doc_id")),
        table_prefix=table_prefix,
        table_format=table_format,
    )
    shard_id = next_free_shard(store, stats)
    build_index(
        spark,
        pages,
        index_dir,
        analyzer=analyzer or stats["analyzer"],
        num_shards=shard_id + 1,
        num_term_buckets=int(stats["num_term_buckets"]),
        block_size=int(stats["block_size"]),
        resume=True,
        extend_dictionary=True,
        shard_override=shard_id,
        table_prefix=table_prefix,
        table_format=table_format,
    )
    n_docs = int(
        store.read("docmap").where(F.col("shard") == shard_id).count()
    )
    return {"deleted": deleted, "shard": shard_id, "n_docs": n_docs}
