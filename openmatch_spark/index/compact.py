"""Segment compaction: merge index shards, Lucene-style.

Incremental ingest (streaming/incremental.py) appends one shard per
micro-batch; left alone, a long-running ingest accumulates hundreds of tiny
segments — more partition dirs to scan, more per-shard top-k groups at query
time, more driver metadata. compact_index() merges a set of committed shards
into ONE new shard and retires the old ones, preserving search results
bit-for-bit:

  * posting payloads store final BM25 weights (frozen at build), so a merge
    is a pure re-keying: decode blocks -> (term, doc_ord, weight) rows,
    remap ordinals to the merged shard's dense doc_id order, re-pack with
    the SAME sort-based Arrow packer as the build. No re-tokenization, no
    re-scoring; scores are copied bytes, block boundaries re-derived by the
    same pure function of (doc order, block_size).
  * commit protocol: write the merged shard's docmap+postings under a NEW
    shard id (invisible: not yet in the manifest, and all index reads are
    manifest-gated — index/load.py), then rewrite the manifest (old shards
    out, merged shard in), then physically drop the retired partition dirs.
    A crash before the manifest rewrite leaves the old index intact; a crash
    after it leaves only unreferenced dirs, which readers ignore and the
    next compact/cleanup removes. The manifest rewrite itself is atomic on
    Iceberg (createOrReplace); on plain parquet paths it is the one small
    non-atomic window (manifest is a few KB).

Scale: the merge shuffles decoded postings once, hash-partitioned on
(shard, term_bucket) exactly like the build — the cost is proportional to
the merged segments' size, never the whole index. Merging the K smallest
segments (Lucene's tiered policy) keeps amortized merge cost O(N log N).
"""

from __future__ import annotations

import time

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window

from openmatch_spark.functions.codec import decode_postings
from openmatch_spark.index.build import (
    _pack_blocks_arrow,
    build_docmap,
)
from openmatch_spark.index.layout import (
    MANIFEST_SCHEMA,
    METRICS_SCHEMA,
    POSTING_SCHEMA,
)
from openmatch_spark.index.storage import IndexStorage


def _decode_blocks_arrow(batches):
    """mapInArrow kernel: posting blocks -> flat (shard, term, term_bucket,
    doc_ord, weight) rows. Per-block numpy decode (varbyte+delta inverse,
    raw float64 weights); block rows are exploded with np.repeat, no
    per-posting Python."""
    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("shard", pa.int32()),
            ("term", pa.string()),
            ("term_bucket", pa.int32()),
            ("doc_ord", pa.int64()),
            ("weight", pa.float64()),
        ]
    )
    for batch in batches:
        if batch.num_rows == 0:
            continue
        shard = batch.column("shard").to_numpy()
        bucket = batch.column("term_bucket").to_numpy()
        terms = batch.column("term").to_numpy(zero_copy_only=False)
        docs = batch.column("docs").to_pylist()
        scores = batch.column("scores").to_pylist()
        ords_parts = [decode_postings(d) for d in docs]
        lens = np.array([p.shape[0] for p in ords_parts], dtype=np.int64)
        if lens.sum() == 0:
            continue
        ords = np.concatenate(ords_parts)
        weights = np.frombuffer(b"".join(scores), dtype="<f8")
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.repeat(shard, lens), type=pa.int32()),
                pa.array(np.repeat(terms, lens), type=pa.string()),
                pa.array(np.repeat(bucket, lens), type=pa.int32()),
                pa.array(ords, type=pa.int64()),
                pa.array(weights, type=pa.float64()),
            ],
            schema=out_schema,
        )


def plan_compaction(
    manifest_rows,
    tier_factor: int = 10,
    min_merge: int = 2,
    max_merge: int = 10,
) -> list[list[int]]:
    """Tiered merge policy (Lucene-flavoured), as a pure function of the
    manifest: bucket segments by floor(log_tier_factor(n_docs)) and, within
    any tier holding >= min_merge segments, merge the smallest up to
    max_merge at a time. Merging like-sized segments keeps amortized merge
    cost O(N log N) over the index's life — repeatedly folding tiny
    streaming segments into one giant one would be O(N^2).

    manifest_rows: iterable with `shard` and `n_docs` fields (Rows or
    tuples via ._asdict-compatible access). Returns a list of shard-id
    groups; run each through compact_index, largest-tier first (each merge
    may promote the result into a higher tier — call plan+compact in a loop
    until the plan is empty to fully settle)."""
    if tier_factor < 2:
        raise ValueError(f"tier_factor must be >= 2, got {tier_factor}")

    def int_tier(n: int) -> int:
        # integer-safe log bucket: float log misbuckets exact powers
        # (math.log(1000, 10) == 2.999... -> tier 2, grouping a 1000-doc
        # segment with 100-doc ones)
        t, x = 0, max(n, 1)
        while x >= tier_factor:
            x //= tier_factor
            t += 1
        return t

    segs = [(int(r["shard"]), int(r["n_docs"])) for r in manifest_rows]
    tiers: dict[int, list[tuple[int, int]]] = {}
    for shard, n in segs:
        tiers.setdefault(int_tier(n), []).append((shard, n))
    plan = []
    for tier in sorted(tiers):
        members = sorted(tiers[tier], key=lambda sn: (sn[1], sn[0]))
        while len(members) >= min_merge:
            group, members = members[:max_merge], members[max_merge:]
            if len(group) < min_merge:
                break
            plan.append([s for s, _ in group])
    return plan


def compact_auto(
    spark: SparkSession,
    index_dir: str,
    tier_factor: int = 10,
    min_merge: int = 2,
    max_merge: int = 10,
    table_prefix: str | None = None,
    table_format: str | None = None,
) -> list[dict]:
    """Plan-and-merge until the tiered policy finds nothing left to do.
    Returns one compact_index result per executed merge."""
    store = IndexStorage.resolve(
        spark, index_dir, table_prefix=table_prefix, table_format=table_format
    )
    results = []
    while True:
        plan = plan_compaction(
            store.read("manifest").collect(),
            tier_factor=tier_factor,
            min_merge=min_merge,
            max_merge=max_merge,
        )
        if not plan:
            return results
        for group in plan:
            results.append(
                compact_index(
                    spark, index_dir, shards=group,
                    table_prefix=table_prefix, table_format=table_format,
                )
            )


def compact_index(
    spark: SparkSession,
    index_dir: str,
    shards: list[int] | None = None,
    table_prefix: str | None = None,
    table_format: str | None = None,
    timings: dict | None = None,
) -> dict:
    """Merge the given committed shards (default: ALL) into one new shard.

    Returns {"merged": [...], "new_shard": id, "n_docs": .., "n_postings": ..}.
    Search results over the index are identical before and after
    (property-tested in tests/test_compaction.py).
    """
    t = timings if timings is not None else {}
    store = IndexStorage.resolve(
        spark, index_dir, table_prefix=table_prefix, table_format=table_format
    )
    manifest_rows = store.read("manifest").collect()
    committed = sorted({r["shard"] for r in manifest_rows})
    merge = sorted(shards) if shards else committed
    if len(merge) < 2:
        raise ValueError(f"need >= 2 shards to compact, got {merge}")
    missing = set(merge) - set(committed)
    if missing:
        raise ValueError(f"shards not in manifest: {sorted(missing)}")
    new_shard = max(committed) + 1
    stats = store.read_stats()
    block_size = int(stats["block_size"])

    from openmatch_spark.session import scoped_confs

    # per-partition-dir replacement: only the new shard's dirs are touched
    with scoped_confs(
        spark, {"spark.sql.sources.partitionOverwriteMode": "dynamic"}
    ):
        # a PREVIOUS compaction (or killed build) that crashed between data
        # write and manifest commit can leave stray dirs under exactly this
        # shard id (it is also max(committed)+1 for the next drain), and the
        # postings dynamic overwrite only replaces the (shard, term_bucket)
        # partitions present in the new data — stale buckets would survive
        # and become visible at manifest commit. Start from a clean slate.
        store.delete_partitions("postings", "shard", [new_shard])
        store.delete_partitions("docmap", "shard", [new_shard])

        t0 = time.time()
        old_docmap = store.read("docmap").where(F.col("shard").isin(merge))
        merged_docmap = build_docmap(
            old_docmap.select(
                F.lit(new_shard).cast("int").alias("shard"), "doc_id", "doclen"
            )
        )
        store.overwrite(merged_docmap, "docmap", ["shard"], stage=True)
        new_docmap = store.read("docmap").where(F.col("shard") == new_shard)
        t["docmap_sec"] = time.time() - t0

        t0 = time.time()
        # old (shard, doc_ord) -> merged doc_ord via doc_id, made a strict
        # 1:1 mapping even when the same doc_id appears more than once in
        # the merged set (e.g. a url re-ingested by a later drain): pair the
        # i-th old occurrence with the i-th new ordinal. A plain doc_id join
        # would fan duplicates out NxN and double those docs' scores.
        occ_old = Window.partitionBy("doc_id").orderBy("shard", "doc_ord")
        occ_new = Window.partitionBy("doc_id").orderBy("doc_ord")
        ord_map = (
            old_docmap.select(
                "shard", "doc_ord", "doc_id",
                F.row_number().over(occ_old).alias("occ"),
            )
            .join(
                new_docmap.select(
                    "doc_id",
                    F.col("doc_ord").alias("new_ord"),
                    F.row_number().over(occ_new).alias("occ"),
                ),
                ["doc_id", "occ"],
            )
        )
        decoded = (
            store.read("postings")
            .where(F.col("shard").isin(merge))
            .mapInArrow(
                _decode_blocks_arrow,
                "shard int, term string, term_bucket int, doc_ord long, weight double",
            )
        )
        rekeyed = decoded.join(ord_map, ["shard", "doc_ord"]).select(
            F.lit(new_shard).cast("int").alias("shard"),
            "term",
            "term_bucket",
            F.col("new_ord").alias("doc_ord"),
            "weight",
        )
        n_out = max(
            2 * spark.sparkContext.defaultParallelism,
            store.read("postings").rdd.getNumPartitions(),
        )
        blocks = (
            rekeyed.repartition(n_out, "shard", "term_bucket")
            .sortWithinPartitions("shard", "term_bucket", "term", "doc_ord")
            .mapInArrow(_pack_blocks_arrow(block_size), POSTING_SCHEMA)
        )
        store.overwrite(blocks, "postings", ["shard", "term_bucket"], stage=True)
        t["postings_sec"] = time.time() - t0

        # ---- commit: manifest rewrite, then retire the old segment dirs ----
        t0 = time.time()
        summary = (
            store.read("postings")
            .where(F.col("shard") == new_shard)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_blocks"),
                F.sum("n").cast("long").alias("n_postings"),
            )
            .collect()[0]
        )
        n_docs = new_docmap.count()
        now = time.time()
        kept = [
            (int(r["shard"]), int(r["n_docs"]), int(r["n_blocks"]),
             int(r["n_postings"]), float(r["committed_at"]))
            for r in manifest_rows
            if r["shard"] not in set(merge)
        ]
        kept.append(
            (int(new_shard), int(n_docs), int(summary["n_blocks"] or 0),
             int(summary["n_postings"] or 0), float(now))
        )
        store.overwrite(spark.createDataFrame(kept, MANIFEST_SCHEMA), "manifest")
        store.delete_partitions("postings", "shard", merge)
        store.delete_partitions("docmap", "shard", merge)
        t["commit_sec"] = time.time() - t0

        metrics_row = (
            -1,  # compactions use batch_id -1; build batches count from 0
            "compact:" + ",".join(str(s) for s in merge) + f"->{new_shard}",
            int(n_docs),
            int(summary["n_postings"] or 0),
            float(t.get("docmap_sec", 0.0)),
            float(t.get("postings_sec", 0.0)),
            float(t.get("commit_sec", 0.0)),
            float(time.time()),
        )
        store.append(spark.createDataFrame([metrics_row], METRICS_SCHEMA), "metrics")

    return {
        "merged": merge,
        "new_shard": new_shard,
        "n_docs": int(n_docs),
        "n_postings": int(summary["n_postings"] or 0),
    }
