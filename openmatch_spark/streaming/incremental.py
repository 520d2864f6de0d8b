"""Incremental index maintenance via Structured Streaming.

The reference's only "streaming" runtime is a polling loop that watches a
directory and processes each new checkpoint exactly once
(driver/async_eval_dr.py:136-189). The Spark-native equivalent is a
file-source stream with Trigger.AvailableNow: each micro-batch of newly
arrived corpus files becomes one new index shard batch, committed through the
same write-then-manifest protocol as the batch build — so batch and streaming
paths share all index code and the index stays queryable mid-ingest.

New docs get fresh shard ids (one past the manifest's max committed shard,
so repeated drain cycles and compactions never collide) — corpus-level BM25
stats (N, avgdl) and existing terms' idf stay FROZEN at base-build values,
the standard trade-off of incremental sparse indexing; a periodic full
rebuild re-baselines stats. Terms UNSEEN at base build are appended to the
dictionary (idf computed against the frozen N), so newly ingested vocabulary
is immediately searchable (build.py extend_dictionary).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from openmatch_spark.fixtures import PAGES_SCHEMA
from openmatch_spark.index.build import build_index
from openmatch_spark.index.layout import IndexPaths


def incremental_index_available_now(
    spark: SparkSession,
    watch_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    analyzer: str | None = None,
) -> int:
    """Drain currently-available new parquet files in watch_dir into the
    index; returns number of micro-batches processed. Exactly-once per file
    comes from the stream checkpoint; idempotent shard commit comes from the
    manifest protocol."""
    paths = IndexPaths(index_dir)
    stats = paths.read_stats()
    # next free shard id comes from the MANIFEST, not stats.json: stats stay
    # frozen across drains, so `num_shards` alone would re-issue the same
    # shard ids on the second drain cycle — build's resume would then skip
    # the "already committed" shard and silently drop the new docs
    # (regression-tested in tests/test_streaming.py multi-drain test).
    from openmatch_spark.index.deletes import next_free_shard
    from openmatch_spark.index.storage import IndexStorage

    store = IndexStorage.resolve(spark, index_dir)
    # only a MISSING manifest (index built before the manifest protocol, or
    # never committed) may fall back to stats — a transient read error must
    # raise, or the fallback silently reintroduces the shard-id collision.
    # Postings dirs beyond num_shards with no manifest mean the manifest was
    # LOST, and next_free_shard refuses rather than re-issue committed ids
    # (shared allocation guard, index/deletes.py).
    n_existing = next_free_shard(store, stats)
    processed = {"n": 0}

    def handle_batch(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        # one new shard per micro-batch, appended after existing shards;
        # shard_override pins the whole slice into that id (an explicit
        # build_index parameter — module-global monkeypatching would break
        # under concurrent builds sharing one driver)
        shard_id = n_existing + processed["n"]
        build_index(
            spark,
            batch_df,
            index_dir,
            analyzer=analyzer or stats["analyzer"],
            num_shards=shard_id + 1,
            num_term_buckets=int(stats["num_term_buckets"]),
            block_size=int(stats["block_size"]),
            resume=True,  # keeps frozen stats.json; skips committed shards
            extend_dictionary=True,  # new vocabulary becomes searchable
            shard_override=shard_id,
        )
        processed["n"] += 1

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .option("recursiveFileLookup", "true")  # writers drop dir-per-batch
        .parquet(watch_dir)
    )
    q = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return processed["n"]


def maintain_index(
    spark: SparkSession,
    watch_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    analyzer: str | None = None,
    compact: bool = True,
    rebaseline: bool = False,
    tier_factor: int = 10,
    min_merge: int = 2,
    max_merge: int = 10,
    rebuild_positions_from=None,
) -> dict:
    """One full maintenance cycle — what a scheduled ingest job runs:

      1. drain currently-available new files into appended shards
         (incremental_index_available_now: exactly-once per file, frozen
         base statistics, dictionary extended with new vocabulary);
      2. settle segments under the tiered policy (compact_auto — bounds
         segment count at O(log N) for O(N log N) amortized merge cost);
      3. optionally rebaseline: one full merge that recomputes
         N/avgdl/df/idf and re-weights payloads, converging the index to
         fresh-build scores (index/compact.py rebaseline_stats; legal even
         when step 2 settled everything into a single segment).

    Run with rebaseline=False on the frequent cadence and rebaseline=True
    on the slow one (e.g. nightly) — the standard incremental-index
    freshness/cost trade. Returns {"batches": n, "merges": [...],
    "rebaseline": {...}|None}. When rebaseline=True the tiered pass is
    skipped: the rebaseline IS a full merge of every committed shard, so
    compact_auto's decode/re-pack work would be immediately re-done and
    discarded.

    rebuild_positions_from: pass the full accumulated pages corpus to
    rebuild the positional sidecar at the end of the cycle — drains
    append shards the old sidecar doesn't cover and compaction drops it,
    so an index serving phrase/proximity queries should rebuild per
    maintenance cycle (returned under "positions").

    Near-dup dedup at this cadence: run operators/dedup_incremental
    .incremental_deduplicate over each drain's docs against an
    index-adjacent signature store — signatures are computed for NEW docs
    only, and the per-drain verdicts provably match the one-shot batch
    dedup over the accumulated corpus (no full recompute per cycle).
    """
    from openmatch_spark.index.compact import compact_auto, compact_index

    n = incremental_index_available_now(
        spark, watch_dir, index_dir, checkpoint_dir, analyzer=analyzer
    )
    merges = []
    if compact and not rebaseline:
        merges = compact_auto(
            spark, index_dir, tier_factor=tier_factor,
            min_merge=min_merge, max_merge=max_merge,
        )
    reb = None
    if rebaseline:
        reb = compact_index(spark, index_dir, rebaseline_stats=True)
    pos = None
    if rebuild_positions_from is not None:
        # the positional sidecar is keyed to index geometry (shard,
        # doc_ord): drains append shards it doesn't cover and compaction
        # drops it outright (fail-safe), so phrase/proximity service over
        # a maintained index needs a rebuild each cycle. The caller
        # supplies the FULL accumulated pages corpus (the sidecar is a
        # from-corpus product, not mergeable from the old one).
        from openmatch_spark.index.positions import build_positions

        pos = build_positions(spark, rebuild_positions_from, index_dir)
    return {
        "batches": n, "merges": merges, "rebaseline": reb, "positions": pos,
    }
