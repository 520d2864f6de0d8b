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
    groups ordered smallest tier first (the order compact_auto executes:
    folding tiny streaming segments away first is what each merge pays for;
    a merge may promote its result into a higher tier — call plan+compact
    in a loop until the plan is empty to fully settle)."""
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
    rebaseline_stats: bool = False,
    prune_keep_per_term: int | None = None,
) -> dict:
    """Merge the given committed shards (default: ALL) into one new shard.

    Returns {"merged": [...], "new_shard": id, "n_docs": .., "n_postings": ..}.
    Search results over the index are identical before and after
    (property-tested in tests/test_compaction.py).

    prune_keep_per_term=N applies STATIC INDEX PRUNING (Carmel et al.
    2001) during the merge: each term keeps only its N highest-impact
    postings (by 6 dp-rounded stored weight, doc_ord tie-break — and
    doc_ord is the doc_id sort order, so the survivor set is a pure
    function of corpus content). Searches over the pruned index are
    deliberately APPROXIMATE: a doc can lose a term's contribution or
    vanish from a term's candidates entirely — that is the contract that
    buys a head-term-bounded index (≤ N postings per term, so index size
    is O(vocabulary × N) instead of corpus-sized) and head-term-bounded
    query cost. Weights keep their original values (Carmel's uniform
    pruning does not rescore); dictionary df/cf keep pre-prune values —
    the same frozen-statistics semantic the incremental path uses, fixed
    by a later rebaseline compact if needed. The per-term window sorts
    each term's postings in one task (df log df) — at extreme scale swap
    the exact rank for a per-term weight-threshold sketch; composes with
    rebaseline_stats (prune runs AFTER re-weighting, on the new weights).

    rebaseline_stats=True (requires merging ALL committed shards) fixes the
    one remaining way an incrementally grown index diverges from a fresh
    build: incremental drains freeze N/avgdl/idf at base-build values
    (streaming/incremental.py), so scores drift as the corpus grows.
    Rebaseline recomputes N/avgdl/df/idf over the merged corpus and
    re-weights every posting payload during the existing decode → re-pack
    pass — tf is recovered exactly from the stored weight by inverting the
    BM25 weight formula with the OLD statistics (w = idf·tf/(tf+K) ⇒
    tf = round(w·K/(idf−w)), exact for any realistic tf at float64), then
    re-weighted with the NEW ones using the byte-identical build
    expression. After compact(rebaseline_stats=True), search scores,
    dictionary rows, and stats.json are identical to a one-shot
    build_index over the union corpus (tested).

    Commit order under rebaseline: postings (invisible) → manifest →
    dictionary → stats.json → retire old dirs. Search correctness never
    depends on dictionary idf or stats.avgdl (payloads carry final
    weights), so a crash inside the tail of that sequence leaves a
    SEARCH-correct index whose dictionary/stats lag one rebaseline — the
    same staleness class as not having run it; re-running compaction
    converges. On Iceberg the table writes are snapshot-atomic each.
    """
    t = timings if timings is not None else {}
    store = IndexStorage.resolve(
        spark, index_dir, table_prefix=table_prefix, table_format=table_format
    )
    manifest_rows = store.read("manifest").collect()
    committed = sorted({r["shard"] for r in manifest_rows})
    merge = sorted(shards) if shards else committed
    if len(merge) < 2 and not rebaseline_stats and prune_keep_per_term is None:
        # a plain 1-shard merge is a pointless rewrite; a 1-shard REBASELINE
        # is meaningful (re-weight in place) and required for already-
        # compacted indexes — e.g. compact --auto --rebaseline after the
        # tiered pass settled everything into one segment, or re-running a
        # rebaseline that crashed after its manifest commit
        raise ValueError(f"need >= 2 shards to compact, got {merge}")
    if not merge:
        raise ValueError("no committed shards to compact")
    missing = set(merge) - set(committed)
    if missing:
        raise ValueError(f"shards not in manifest: {sorted(missing)}")
    stats = store.read_stats()
    # refuse to compact a PARTIALLY built index: build resume tracks the
    # base range 0..num_shards-1 by id in the manifest, so retiring a base
    # shard id mid-build makes resume re-index those docs (duplicates), and
    # allocating the merged id inside the base range would make resume skip
    # real work (silent loss). Compaction is only sound once every base
    # shard is committed. (Incremental shards beyond the base range are
    # fine — they are never in resume's todo set.)
    base = set(range(int(stats["num_shards"])))
    if not base.issubset(committed):
        # base ids absent from the manifest are legitimate ONLY if an
        # earlier compaction retired them — the append-only metrics log is
        # the lineage that proves the base build once committed them
        # (build batches log batch_id >= 0 with their shard list)
        built: set[int] = set()
        if store.exists("metrics"):
            for r in (
                store.read("metrics")
                .where(F.col("batch_id") >= 0)
                .select("shards")
                .collect()
            ):
                built |= {int(s) for s in str(r["shards"]).split(",") if s}
        if not base.issubset(built | set(committed)):
            raise ValueError(
                f"refusing to compact partially built index: base shards "
                f"{sorted(base - set(committed) - built)} never committed "
                f"(num_shards={stats['num_shards']}, committed={committed}) — "
                "finish build_index(resume=True) first"
            )
    new_shard = max(max(committed) + 1, int(stats["num_shards"]))
    block_size = int(stats["block_size"])
    if rebaseline_stats and set(merge) != set(committed):
        raise ValueError(
            "rebaseline_stats requires compacting ALL committed shards "
            f"(got {merge}, committed {committed}): re-weighting only a "
            "subset would mix two statistics baselines in one index"
        )
    if prune_keep_per_term is not None and set(merge) != set(committed):
        raise ValueError(
            "prune_keep_per_term requires compacting ALL committed shards "
            f"(got {merge}, committed {committed}): a per-term cut over a "
            "subset is not the global top-N — unmerged segments would keep "
            "postings the cut should have dropped"
        )
    if rebaseline_stats and stats.get("scoring", "bm25") != "bm25":
        # BM25's weight is exactly invertible to tf; QLD's is not — its
        # Lucene clamp DROPS zero-weight postings at build, so the merged
        # corpus's tf cannot be recovered from payloads alone. Rebaselining
        # a qld index means rebuilding it from the corpus.
        raise NotImplementedError(
            f"rebaseline_stats supports scoring='bm25' only (index has "
            f"scoring={stats.get('scoring')!r}): the qld clamp drops "
            "zero-weight postings, so tf recovery from payloads is "
            "impossible — rebuild the index to rebaseline"
        )

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
        # physical delete: tombstoned docs (index/deletes.py) get no ordinal
        # in the merged docmap, so their postings die at the ord_map inner
        # join below — no extra pass over the postings. Their tombstone rows
        # are purged after commit (the merged shards no longer exist).
        had_deletes = store.exists("deletes")
        if had_deletes:
            dead = (
                store.read("deletes")
                .where(F.col("shard").isin(merge))
                .select("shard", "doc_ord")
                .distinct()
            )
            old_docmap = old_docmap.join(
                F.broadcast(dead), ["shard", "doc_ord"], "left_anti"
            )
        # index-sorted indexes (stats.index_sort) must keep ordinals in
        # sort-field order across the merge — the persisted sort_value
        # rides along and re-keys the merged shard; plain indexes keep
        # the doc_id ordering
        sort_meta = stats.get("index_sort")
        # stored doc-values columns (stats.store_attrs) ride the merge
        # verbatim and re-key with the merged ordinals
        attr_cols = tuple(stats.get("store_attrs") or ())
        if sort_meta:
            merged_docmap = build_docmap(
                old_docmap.select(
                    F.lit(new_shard).cast("int").alias("shard"),
                    "doc_id", "doclen", "sort_value", *attr_cols,
                ),
                sort_col="sort_value",
                sort_desc=bool(sort_meta.get("desc", False)),
                attr_cols=attr_cols,
            )
        else:
            merged_docmap = build_docmap(
                old_docmap.select(
                    F.lit(new_shard).cast("int").alias("shard"),
                    "doc_id", "doclen", *attr_cols,
                ),
                attr_cols=attr_cols,
            )
        # the merged doc count rides the docmap write as an observed
        # metric (same pattern as build_index's manifest bookkeeping) —
        # the separate new_docmap.count() job it replaces re-scanned the
        # just-written table
        from pyspark.sql import Observation

        obs_docmap = Observation()
        merged_docmap = merged_docmap.observe(
            obs_docmap, F.count(F.lit(1)).alias("n_docs")
        )
        store.overwrite(merged_docmap, "docmap", ["shard"], stage=True)
        n_docs_written = int(obs_docmap.get["n_docs"])
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
                "shard", "doc_ord", "doc_id", "doclen",
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
        recovered = dict_new = None
        if rebaseline_stats:
            from openmatch_spark.functions.bm25 import (
                bm25_weight_col,
                lucene_idf_col,
            )
            from openmatch_spark.index.build import term_bucket_col

            g = new_docmap.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.avg("doclen").alias("avgdl"),
                F.sum("doclen").alias("total_terms"),
            ).collect()[0]
            n_docs_new = int(g["n_docs"])
            avgdl_new = float(g["avgdl"]) if g["avgdl"] is not None else 0.0
            avgdl_old = float(stats["avgdl"]) or 1.0
            k1, b = float(stats["k1"]), float(stats["b"])
            # invert the index-time weight with the OLD stats to recover tf
            # exactly (w = idf*tf/(tf+K) => tf = w*K/(idf-w); float64 error
            # stays far below 0.5 for any realistic tf — property-tested)
            k_old = F.lit(k1) * (
                F.lit(1.0 - b) + F.lit(b) * F.col("doclen") / F.lit(avgdl_old)
            )
            recovered = (
                decoded.join(ord_map, ["shard", "doc_ord"])
                .join(
                    store.read("dictionary").select(
                        "term", F.col("idf").alias("_idf_old")
                    ),
                    "term",
                )
                .select(
                    F.lit(new_shard).cast("int").alias("shard"),
                    "term",
                    "term_bucket",
                    F.col("new_ord").alias("doc_ord"),
                    "doclen",
                    F.round(
                        F.col("weight") * k_old / (F.col("_idf_old") - F.col("weight"))
                    ).alias("tf"),
                )
            )
            recovered.persist()
            # NEW dictionary over the merged corpus — the byte-identical
            # expressions a fresh build uses (index/build.py STATS phase)
            dict_new = (
                recovered.groupBy("term")
                .agg(
                    F.count(F.lit(1)).alias("df"),
                    F.sum("tf").cast("long").alias("cf"),
                )
                .select(
                    "term",
                    "df",
                    "cf",
                    lucene_idf_col(F.col("df"), float(n_docs_new)).alias("idf"),
                    term_bucket_col(
                        F.col("term"), int(stats["num_term_buckets"])
                    ).alias("term_bucket"),
                )
            )
            avgdl_w = avgdl_new if avgdl_new else 1.0
            rekeyed = recovered.join(dict_new.select("term", "idf"), "term").select(
                "shard",
                "term",
                "term_bucket",
                "doc_ord",
                bm25_weight_col(
                    F.col("tf"), F.col("idf"), F.col("doclen"), avgdl_w, k1, b
                ).alias("weight"),
            )
        else:
            rekeyed = decoded.join(ord_map, ["shard", "doc_ord"]).select(
                F.lit(new_shard).cast("int").alias("shard"),
                "term",
                "term_bucket",
                F.col("new_ord").alias("doc_ord"),
                "weight",
            )
        if prune_keep_per_term is not None:
            if prune_keep_per_term <= 0:
                raise ValueError(
                    f"prune_keep_per_term must be positive, got "
                    f"{prune_keep_per_term}"
                )
            wpr = Window.partitionBy("term").orderBy(
                F.desc(F.round(F.col("weight"), 6)), F.asc("doc_ord")
            )
            rekeyed = (
                rekeyed.withColumn("_pr", F.row_number().over(wpr))
                .where(F.col("_pr") <= prune_keep_per_term)
                .drop("_pr")
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
        # block/posting counts ride the write (no re-scan of the merged
        # segment just written)
        obs_post = Observation()
        blocks = blocks.observe(
            obs_post,
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum("n").alias("n_postings"),
        )
        store.overwrite(blocks, "postings", ["shard", "term_bucket"], stage=True)
        t["postings_sec"] = time.time() - t0

        # ---- commit: manifest rewrite, then retire the old segment dirs ----
        t0 = time.time()
        summary = obs_post.get
        n_docs = n_docs_new if rebaseline_stats else n_docs_written
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
        if rebaseline_stats:
            # after the manifest: search is already correct (payloads carry
            # the new weights); dictionary/stats follow, old dirs last so a
            # recompute of the persisted frame can still read its lineage
            store.overwrite(dict_new, "dictionary", stage=True)
            store.write_stats(
                dict(
                    stats,
                    n_docs=n_docs_new,
                    avgdl=avgdl_new,
                    total_terms=int(g["total_terms"] or 0),
                )
            )
        store.delete_partitions("postings", "shard", merge)
        store.delete_partitions("docmap", "shard", merge)
        if had_deletes:
            from openmatch_spark.index.deletes import purge_deletes_for_shards

            purge_deletes_for_shards(store, merge)
        if store.exists("positions"):
            # the merge re-assigned doc_ords, so the sidecar's merged shards
            # are stale AND the new shard has none — a partially-covered
            # sidecar would silently drop phrase hits. Drop the WHOLE table:
            # has_positions() goes false and phrase search fails loudly
            # until build_positions re-runs (fail-safe over fail-silent).
            import warnings

            store.drop("positions")
            warnings.warn(
                "compact_index invalidated the positions sidecar; re-run "
                "build_positions to restore phrase search",
                stacklevel=2,
            )
        if recovered is not None:
            recovered.unpersist()
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
