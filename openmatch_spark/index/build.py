"""Distributed inverted-index build (SURVEY §2.4 A10, north_rule).

Dataflow (one declarative plan per phase; Catalyst owns the physical plan):

  pages ──extract/tokenize (Arrow UDF)──► corpus(doc_id, terms, doclen)
        ├─ phase STATS (checkpointed): N, avgdl, dictionary(term, df, cf, idf)
        └─ phase POSTINGS (per shard batch, resumable):
             docmap:   shard-local dense doc_ord by doc_id sort
             explode ──groupBy(shard,term,doc)──► tf
                     ──join docmap + dictionary──► weight (float64, index-time BM25)
                     ──repartition(shard,term_bucket)+sortWithinPartitions──►
                     ──mapInArrow single-pass packer──► delta+varbyte blocks
             write postings/docmap (dynamic partition overwrite by shard)
             append manifest row per shard   (write-then-manifest ⇒ idempotent resume)

Skew strategy (Zipf head terms like "the" appear in ~every doc):
  * the tf groupBy keys on (shard, term, doc_id) — doc_id spreads hot terms
    across all partitions; partial aggregation combines map-side.
  * block packing is SORT-based, not collect_list-based: postings are hash
    partitioned on (shard, term_bucket), sorted (Tungsten external sort —
    spills, never OOMs), and a streaming Arrow kernel chunks each
    (shard, term) run into block_size blocks with O(block_size) state.
    A head term's multi-million-posting run emits complete blocks eagerly;
    no reducer ever materializes an unbounded list. Block boundaries are a
    pure function of corpus content, so the index is identical under any
    parallelism (property-tested).
  * doc-sharding bounds every per-(shard,term) list by docs-per-shard,
    which is what makes query-side groups bounded too.

At 10^12 docs: num_shards sized so a shard is ~100-250M docs, block_size 128,
postings partitioned by (shard, term_bucket) — an Iceberg-style layout where
query-time bucket pruning keeps scans to the terms actually queried.

Reference parity notes: the reference's index build is embarrassingly-parallel
encode + spill (dense_retriever.py:67-129) with rank-sliced sharding
(inference_dataset.py:216-235); Spark partitioning replaces the manual
sharding, shuffle replaces the barrier, and the manifest replaces the
`evaluated_steps` bookkeeping idea (driver/async_eval_dr.py:136-186).
"""

from __future__ import annotations

import time

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from openmatch_spark.analysis import extract_corpus
from openmatch_spark.functions.bm25 import (
    B,
    K1,
    bm25_weight_col,
    lucene_idf_col,
    qld_weight_col,
)
from openmatch_spark.functions.codec import encode_blocks_batch
from openmatch_spark.index.layout import POSTING_SCHEMA, MANIFEST_SCHEMA, METRICS_SCHEMA
from openmatch_spark.index.storage import IndexStorage
from openmatch_spark.stats import global_stats

# postings buffered per task before a vectorized encode+emit; bounds kernel
# memory to ~10 MB/task regardless of partition size
_PACK_BUFFER_ROWS = 1 << 17


def _pack_blocks_arrow(block_size: int):
    """mapInArrow kernel: sorted (shard, term_bucket, term, doc_ord, weight)
    stream -> encoded posting blocks, one pass, no collect_list.

    The input partition is hash-distributed on (shard, term_bucket) and
    sorted by (shard, term_bucket, term, doc_ord), so each (shard, term)
    run is contiguous. Blocks are consecutive `block_size` chunks of a run —
    a pure function of corpus content, independent of parallelism. Runs that
    out-grow the buffer emit their COMPLETE blocks eagerly (block boundaries
    never depend on later postings), so a head term's multi-million-posting
    run never accumulates: carried state stays < block_size rows.
    """
    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("term", pa.string()),
            ("term_bucket", pa.int32()),
            ("shard", pa.int32()),
            ("block_id", pa.int32()),
            ("first_ord", pa.int64()),
            ("last_ord", pa.int64()),
            ("n", pa.int32()),
            ("max_score", pa.float64()),
            ("docs", pa.binary()),
            ("scores", pa.binary()),
        ]
    )

    def kernel(batches):
        bs = block_size
        buf: list = []  # accumulated input batches
        nbuf = 0
        carry_blocks = 0  # blocks already emitted for the run at buffer head

        def flush(final: bool):
            nonlocal buf, nbuf, carry_blocks
            if not nbuf:
                return None
            tbl = pa.Table.from_batches(buf).combine_chunks()
            shard = tbl.column("shard").to_numpy()
            bucket = tbl.column("term_bucket").to_numpy()
            terms = tbl.column("term").to_numpy(zero_copy_only=False)
            ords = tbl.column("doc_ord").to_numpy()
            weights = tbl.column("weight").to_numpy()
            nrows = len(ords)

            change = np.empty(nrows, dtype=bool)
            change[0] = True
            change[1:] = (terms[1:] != terms[:-1]) | (shard[1:] != shard[:-1])
            run_starts = np.flatnonzero(change)

            tail_start = int(run_starts[-1])
            if final:
                emit_upto = nrows
            else:
                # emit only COMPLETE blocks of the (possibly unfinished) tail
                # run; its residual carries to the next flush. Always hold
                # back at least one row of the tail run — the carry is the
                # physical link that tells the next flush "run 0 continues
                # with this block_id base"; an empty carry would make a
                # continuing run restart at block_id 0.
                emit_upto = tail_start + ((nrows - tail_start) // bs) * bs
                if emit_upto == nrows:
                    emit_upto -= bs
            out = None
            if emit_upto > 0:
                rs = run_starts[run_starts < emit_upto]
                lens = np.empty(rs.shape[0], dtype=np.int64)
                lens[:-1] = rs[1:] - rs[:-1]
                lens[-1] = emit_upto - rs[-1]
                nblk = (lens + bs - 1) // bs
                total = int(nblk.sum())
                run_of_block = np.repeat(np.arange(rs.shape[0]), nblk)
                first_blk = np.cumsum(nblk) - nblk
                blk_in_run = np.arange(total) - first_blk[run_of_block]
                block_starts = rs[run_of_block] + blk_in_run * bs
                # block ids continue across flushes for the carried head run
                base = np.zeros(rs.shape[0], dtype=np.int64)
                base[0] = carry_blocks
                block_ids = (base[run_of_block] + blk_in_run).astype(np.int32)

                enc = encode_blocks_batch(
                    ords[:emit_upto], weights[:emit_upto], block_starts
                )
                out = pa.RecordBatch.from_arrays(
                    [
                        pa.array(terms[rs][run_of_block], type=pa.string()),
                        pa.array(bucket[block_starts], type=pa.int32()),
                        pa.array(shard[block_starts], type=pa.int32()),
                        pa.array(block_ids, type=pa.int32()),
                        pa.array(enc["first_ord"], type=pa.int64()),
                        pa.array(enc["last_ord"], type=pa.int64()),
                        pa.array(enc["n"], type=pa.int32()),
                        pa.array(enc["max_score"], type=pa.float64()),
                        pa.array(enc["docs"], type=pa.binary()),
                        pa.array(enc["scores"], type=pa.binary()),
                    ],
                    schema=out_schema,
                )
            # carried residual: rows past emit_upto (all one run)
            if final:
                buf, nbuf, carry_blocks = [], 0, 0
            else:
                rest = tbl.slice(emit_upto)
                buf = rest.to_batches()
                nbuf = nrows - emit_upto
                if emit_upto > tail_start:  # tail run emitted some blocks
                    carry_blocks = (
                        (carry_blocks if tail_start == 0 else 0)
                        + (emit_upto - tail_start) // bs
                    )
                elif tail_start > 0:
                    carry_blocks = 0  # fresh run carried, nothing emitted yet
            return out

        for batch in batches:
            if batch.num_rows == 0:
                continue
            buf.append(batch)
            nbuf += batch.num_rows
            if nbuf >= _PACK_BUFFER_ROWS:
                out = flush(final=False)
                if out is not None:
                    yield out
        out = flush(final=True)
        if out is not None:
            yield out

    return kernel


def shard_col(doc_id_col, num_shards: int):
    """Deterministic doc shard: pmod(xxhash64(doc_id), S). Not part of the
    DuckDB-checked surface, so Spark's internal hash is fine here."""
    return F.pmod(F.xxhash64(doc_id_col), F.lit(num_shards)).cast("int")


def term_bucket_col(term_col, num_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(num_buckets)).cast("int")


def build_docmap(
    corpus_sharded: DataFrame,
    sort_col: str | None = None,
    sort_desc: bool = False,
    attr_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(shard, doc_ord, doc_id, doclen[, sort_value][, attrs...]): dense
    per-shard ordinal by doc_id sort — or, with sort_col, by (sort value,
    doc_id): Lucene INDEX SORTING. Ordinals then follow the sort field
    inside every shard, so posting lists (doc_ord-ordered by construction)
    are physically sorted by the field and a sort-by-field query can stop
    after the first blocks (query/sorted.py search_sorted_indexed). The
    sort value is persisted in the docmap (float64) so sorted queries
    never need an attribute join; NULLs order last in either direction
    (ES missing:_last) via the NULL flag leading the sort key.

    attr_cols are DOC VALUES (build_index store_attrs): per-doc attribute
    columns persisted verbatim alongside the ordinal, so filtered search
    and facets hydrate from the index's own column-pruned docmap scan
    instead of joining the raw corpus at query time.

    Either way ordinals stay a pure function of corpus content —
    identical index bytes under any parallelism (property-tested).
    row_number is a shard-local sort: one task per shard, parallel
    across shards.
    """
    attrs = [F.col(a) for a in attr_cols]
    if sort_col is None:
        w = Window.partitionBy("shard").orderBy("doc_id")
        return corpus_sharded.select(
            "shard",
            (F.row_number().over(w) - 1).cast("long").alias("doc_ord"),
            "doc_id",
            F.col("doclen").cast("long").alias("doclen"),
            *attrs,
        )
    sv = F.col(sort_col).cast("double")
    key = sv.desc() if sort_desc else sv.asc()
    w = Window.partitionBy("shard").orderBy(
        sv.isNull().asc(), key, F.col("doc_id").asc()
    )
    return corpus_sharded.select(
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("doc_ord"),
        "doc_id",
        F.col("doclen").cast("long").alias("doclen"),
        sv.alias("sort_value"),
        *attrs,
    )


_SCOPED_CONFS = (
    "spark.sql.shuffle.partitions",
    "spark.sql.sources.partitionOverwriteMode",
)


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    analyzer: str = "dpr",
    num_shards: int = 8,
    num_term_buckets: int = 16,
    block_size: int = 128,
    k1: float = K1,
    b: float = B,
    shard_batch_size: int | None = None,
    resume: bool = False,
    fail_after_batches: int | None = None,
    timings: dict | None = None,
    shuffle_partitions: int | None = None,
    table_prefix: str | None = None,
    table_format: str | None = None,
    extend_dictionary: bool = False,
    shard_override: int | None = None,
    scoring: str = "bm25",
    mu: float = 1000.0,
    index_sort: str | None = None,
    index_sort_desc: bool = False,
    store_attrs: tuple[str, ...] | list[str] | None = None,
) -> dict:
    """Scoped-conf wrapper around the build body: shuffle partitioning and
    partition-overwrite mode are session confs the build must set, so they
    are captured here and restored in a finally — success OR failure — on
    the session that executes the writes (the pages DataFrame's own session;
    see the clone note in the body).

    shard_override pins EVERY doc in `pages` into that single shard id
    instead of hashing across num_shards — the incremental-ingest path
    (streaming/incremental.py) appends each micro-batch as one new shard
    this way. num_shards must still cover the id (override < num_shards)."""
    from openmatch_spark.session import scoped_confs

    sess = pages.sparkSession or spark
    # None values: snapshot/restore only — the body picks the actual values
    with scoped_confs(sess, {key: None for key in _SCOPED_CONFS}):
        return _build_index_body(
            spark, pages, index_dir, analyzer, num_shards, num_term_buckets,
            block_size, k1, b, shard_batch_size, resume, fail_after_batches,
            timings, shuffle_partitions, table_prefix, table_format,
            extend_dictionary, shard_override, scoring, mu,
            index_sort, index_sort_desc, store_attrs,
        )


def _build_index_body(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    analyzer: str,
    num_shards: int,
    num_term_buckets: int,
    block_size: int,
    k1: float,
    b: float,
    shard_batch_size: int | None,
    resume: bool,
    fail_after_batches: int | None,
    timings: dict | None,
    shuffle_partitions: int | None,
    table_prefix: str | None,
    table_format: str | None,
    extend_dictionary: bool = False,
    shard_override: int | None = None,
    scoring: str = "bm25",
    mu: float = 1000.0,
    index_sort: str | None = None,
    index_sort_desc: bool = False,
    store_attrs: tuple[str, ...] | list[str] | None = None,
) -> dict:
    """Build (or resume) the BM25 index at index_dir. Returns stats dict.

    store_attrs (Lucene doc values): pages columns persisted verbatim in
    the docmap at build time, frozen in stats.json like index_sort —
    resumed builds and incremental drains must carry the same columns (a
    drain missing one would leave NULL holes in the stored table), and
    compaction re-keys them with the merged ordinals. Query surfaces then
    hydrate attributes from the index itself (BM25Index.stored_attributes,
    search_filtered(where=...)) with one column-pruned docmap scan — no
    corpus join.

    index_sort (Lucene index sorting): name a pages column — per-shard
    doc ordinals follow (that value, doc_id) instead of doc_id, the
    value is persisted in the docmap, and stats.json records
    {"index_sort": {"field", "desc"}}. Posting lists are then physically
    ordered by the field, enabling block-pruned early termination in
    search_sorted_indexed (query/sorted.py). Like scoring, the FROZEN
    stats own the sort on resume/incremental drains — a drained batch
    must carry the field, and passing a different index_sort than the
    frozen one raises.

    scoring: "bm25" (default) or "qld" (Dirichlet query likelihood,
    functions/bm25.py qld_weight_col). Both are precomputed per-(term, doc)
    payload weights over frozen collection stats, so query-time machinery is
    identical; on resume the FROZEN stats' scoring/mu win (an incremental
    drain or upsert into a qld index stays qld automatically).

    resume=True skips the STATS phase if stats.json exists (stats must be
    frozen across resumes or weights would drift) and skips shards already in
    the manifest. fail_after_batches is a test hook for kill/resume tests.

    shuffle_partitions sizes the build's exchanges by DATA, not core count:
    a reducer's hash-agg/sort state grows with rows-per-partition, so a
    partition count tied to cores degrades superlinearly as the corpus grows
    (measured 1.5x throughput loss at 2x corpus on a fixed box). Default:
    one partition per input partition, floored at 2x defaultParallelism —
    the same rule a 100 TB run uses (partitions ~ input bytes / target
    partition size), with AQE coalescing any overshoot.
    """
    t = timings if timings is not None else {}

    # conf MUST be set on the session that will execute the writes — inside
    # Structured Streaming's foreachBatch the batch DataFrame belongs to a
    # CLONED session with an isolated conf, and setting the overwrite mode
    # on the outer session silently reverts the clone to its inherited value
    # (caught by tests/test_streaming.py: static mode wiped prior shards).
    spark = pages.sparkSession or spark

    # all table IO routes through IndexStorage: parquet paths in the sandbox,
    # catalog tables (Iceberg via writeTo, or session-catalog saveAsTable)
    # when configured — SURVEY §7.4 (index/storage.py)
    store = IndexStorage.resolve(
        spark, index_dir, table_prefix=table_prefix, table_format=table_format
    )

    if shuffle_partitions is None:
        shuffle_partitions = max(
            2 * spark.sparkContext.defaultParallelism,
            pages.rdd.getNumPartitions(),
        )
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))

    def _mark(name, t0):
        t[name] = t.get(name, 0.0) + (time.time() - t0)

    if shard_override is not None and not (0 <= shard_override < num_shards):
        raise ValueError(
            f"shard_override={shard_override} outside 0..{num_shards - 1}"
        )
    shard_expr = (
        F.lit(shard_override).cast("int")
        if shard_override is not None
        else shard_col(F.col("doc_id"), num_shards)
    )

    # frozen stats own the index sort (same rule as scoring): a resumed or
    # incremental build MUST keep the base build's ordinal order, or the
    # new shards' posting lists stop being field-ordered and sorted-query
    # early termination silently returns wrong answers.
    store_attrs = tuple(store_attrs) if store_attrs else ()
    if resume and store.has_stats():
        _frozen = store.read_stats()
        _frozen_sort = _frozen.get("index_sort")
        if index_sort is not None and (
            _frozen_sort is None
            or _frozen_sort.get("field") != index_sort
            or bool(_frozen_sort.get("desc", False)) != bool(index_sort_desc)
        ):
            raise ValueError(
                f"index_sort={index_sort!r} (desc={index_sort_desc}) differs "
                f"from the frozen stats' index_sort={_frozen_sort!r}"
            )
        if _frozen_sort is not None:
            index_sort = _frozen_sort["field"]
            index_sort_desc = bool(_frozen_sort.get("desc", False))
        # frozen stats own the doc-values columns too: a drain writing a
        # different attr set would leave NULL holes (or missing columns)
        # in the stored table
        _frozen_attrs = tuple(_frozen.get("store_attrs") or ())
        if store_attrs and store_attrs != _frozen_attrs:
            raise ValueError(
                f"store_attrs={store_attrs!r} differs from the frozen "
                f"stats' store_attrs={_frozen_attrs!r}"
            )
        store_attrs = _frozen_attrs
    _RESERVED = ("shard", "doc_id", "doclen", "terms", "sort_value", "doc_ord")
    if index_sort in _RESERVED:
        raise ValueError(f"index_sort column name {index_sort!r} is reserved")
    for a in store_attrs:
        if a in _RESERVED:
            raise ValueError(f"store_attrs column name {a!r} is reserved")

    carry = tuple(dict.fromkeys(
        ((index_sort,) if index_sort else ()) + store_attrs
    ))
    corpus = extract_corpus(
        pages, analyzer=analyzer, carry_cols=carry,
    ).withColumn("shard", shard_expr)
    corpus.persist()

    # tf is THE shared intermediate: the dictionary (df = rows per term,
    # cf = sum tf) and the postings build both derive from it. It stays a
    # LAZY expression over the cached corpus: materializing ~0.9 rows/token
    # into the block cache costs more than re-running the explode+hash-agg
    # from the tokenized cache (measured 3x at 400k docs), and at cluster
    # scale a cached tf would spill anyway.
    tf = (
        corpus.select("shard", "doc_id", F.explode("terms").alias("term"))
        .groupBy("shard", "term", "doc_id")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )

    if scoring not in ("bm25", "qld"):
        raise ValueError(f"scoring must be 'bm25' or 'qld', got {scoring!r}")

    # ---- phase STATS (atomic via stats.json tmp+rename) -------------------
    if resume and store.has_stats():
        stats = store.read_stats()
        # frozen stats own the scoring function: mixing weight formulas
        # inside one index would make payload sums meaningless
        scoring = stats.get("scoring", "bm25")
        mu = float(stats.get("mu", 1000.0))
        dictionary = store.read("dictionary")
        if extend_dictionary:
            # Incremental-ingest vocabulary evolution: terms unseen at base
            # build would otherwise vanish at the inner dictionary join and
            # the new docs would be unsearchable by their new vocabulary.
            # Extend the dictionary with this batch's unseen terms; their
            # idf uses the FROZEN corpus size N (the standard incremental
            # trade-off — existing terms keep their exact frozen idf, so
            # pre-existing rankings are untouched; a periodic full rebuild
            # re-baselines). left_anti makes a retried batch idempotent.
            t0 = time.time()
            n_frozen = float(stats["n_docs"])
            fresh = (
                tf.groupBy("term")
                .agg(
                    F.count(F.lit(1)).alias("df"),
                    F.sum("tf").cast("long").alias("cf"),
                )
                .join(dictionary.select("term"), "term", "left_anti")
                .select(
                    "term",
                    "df",
                    "cf",
                    lucene_idf_col(F.col("df"), n_frozen).alias("idf"),
                    term_bucket_col(F.col("term"), int(stats["num_term_buckets"])).alias(
                        "term_bucket"
                    ),
                )
            )
            # persist: the emptiness probe and the append would otherwise
            # each run the full tokenize/agg/anti-join pipeline
            fresh.persist()
            try:
                if fresh.take(1):
                    store.append(fresh, "dictionary")
                    dictionary = store.read("dictionary")
            finally:
                fresh.unpersist()
            _mark("dict_extend", t0)
    else:
        t0 = time.time()
        g = global_stats(corpus)
        dictionary_df = tf.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        ).select(
            "term",
            "df",
            "cf",
            # Lucene idf, float64, computed JVM-side — the ONE shared
            # expression (functions/bm25.py) the rebaseline also uses
            lucene_idf_col(F.col("df"), float(g["n_docs"])).alias("idf"),
            term_bucket_col(F.col("term"), num_term_buckets).alias("term_bucket"),
        )
        stats = dict(
            g,
            analyzer=analyzer,
            num_shards=num_shards,
            num_term_buckets=num_term_buckets,
            block_size=block_size,
            k1=k1,
            b=b,
            scoring=scoring,
            mu=mu,
        )
        if index_sort:
            stats["index_sort"] = {
                "field": index_sort, "desc": bool(index_sort_desc)
            }
        if store_attrs:
            stats["store_attrs"] = list(store_attrs)

        # the dictionary write only feeds the weighted join inside the
        # batch loop, while the first batch's docmap window+write depends
        # only on the cached corpus — overlap the two independent jobs
        # (guide-style back-fill: the next job's tasks fill the executors
        # the dictionary write's tail leaves idle). stats.json — the
        # atomic commit marker that lets resume skip this phase — is
        # written INSIDE the future, strictly after the dictionary lands,
        # so a crash mid-overlap never leaves stats.json without its
        # dictionary.
        def _commit_stats_phase():
            store.overwrite(dictionary_df, "dictionary")
            out = store.read("dictionary")
            store.write_stats(stats)
            return out

        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        _stats_pool = ThreadPoolExecutor(max_workers=1)
        dict_future = _stats_pool.submit(
            inheritable_thread_target(_commit_stats_phase)
        )
        dictionary = None  # resolved via _resolve_dictionary before use
        _mark("stats_phase", t0)

    def _resolve_dictionary():
        nonlocal dictionary
        if dictionary is None:
            try:
                dictionary = dict_future.result()
            finally:
                _stats_pool.shutdown(wait=False)
        return dictionary

    avgdl = float(stats["avgdl"]) if stats["avgdl"] else 1.0

    # ---- phase POSTINGS (per shard batch, manifest-resumable) -------------
    done: set[int] = set()
    if resume:
        try:
            done = {r["shard"] for r in store.read("manifest").select("shard").distinct().collect()}
        except Exception:
            done = set()
    all_shards = (
        [shard_override] if shard_override is not None else list(range(num_shards))
    )
    todo = [s for s in all_shards if s not in done]
    batch = shard_batch_size or len(todo) or 1
    batches = [todo[i : i + batch] for i in range(0, len(todo), batch)]

    # dynamic partition overwrite (per-shard-dir replacement) is only needed
    # when a write must leave other shards' dirs intact — multi-batch builds
    # and resumes. A fresh single-batch build uses the cheaper static mode
    # (dynamic stages + moves every partition dir driver-side at commit).
    spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode",
        "dynamic" if (resume or len(batches) > 1) else "static",
    )
    write_parallelism = shuffle_partitions

    for bi, shards in enumerate(batches):
        if fail_after_batches is not None and bi >= fail_after_batches:
            _resolve_dictionary()  # stats phase must land before the crash
            corpus.unpersist()
            raise RuntimeError(f"injected failure before batch {bi} (test hook)")
        batch_t0 = dict(t)
        part = corpus.where(F.col("shard").isin(shards))
        t0 = time.time()
        if resume or len(batches) > 1:
            # dynamic-overwrite hygiene: a killed earlier attempt (committer
            # v2 commits task files directly) or a crashed compaction can
            # leave stray files under these shard ids, and dynamic overwrite
            # only replaces the (shard, term_bucket) partitions present in
            # the NEW data — stale buckets would survive and go live at
            # manifest commit. Readers never see these ids yet (manifest
            # gate), so the pre-clean is race-free.
            store.delete_partitions("postings", "shard", shards)
        # manifest bookkeeping via write-time observed metrics: the per-
        # shard doc/block/posting counts the manifest rows need used to be
        # recomputed by re-reading the just-written tables (one docmap agg
        # + one postings scan + a join/collect — ~5 extra jobs per batch,
        # and at scale a full re-scan of the postings just written).
        # Observation aggregates ride the WRITE job itself, so the counts
        # cost zero extra passes. Per-shard conditional aggregates bound
        # the observe expression list, so this engages for reasonable
        # batch widths (a 10^12-doc build batches shards anyway); wider
        # batches keep the read-back path.
        from pyspark.sql import Observation

        observe_counts = len(shards) <= 64
        obs_docmap = Observation() if observe_counts else None
        docmap_df = build_docmap(
            part, sort_col=index_sort, sort_desc=index_sort_desc,
            attr_cols=store_attrs,
        )
        if observe_counts:
            docmap_df = docmap_df.observe(
                obs_docmap,
                *[
                    F.count(F.when(F.col("shard") == s, 1)).alias(f"d{s}")
                    for s in shards
                ],
            )
        store.overwrite(docmap_df, "docmap", ["shard"])
        # re-read what we just wrote: downstream consumers (weighted join,
        # manifest doc counts) would otherwise re-run the window sort per use
        docmap = store.read("docmap").where(F.col("shard").isin(shards))
        _mark("docmap_write", t0)
        t0 = time.time()

        dictionary = _resolve_dictionary()  # overlapped stats commit

        part_tf = tf.where(F.col("shard").isin(shards))
        if scoring == "qld":
            # Dirichlet QL payload weight: needs the term's collection
            # frequency (dictionary cf) and total collection length, both
            # frozen in stats — the same impact-ordered layout as BM25.
            total_terms = float(stats["total_terms"]) or 1.0
            dict_side = dictionary.select("term", "cf", "term_bucket")
            weight_expr = qld_weight_col(
                F.col("tf"), F.col("cf"), F.col("doclen"), total_terms, mu
            )
        else:
            dict_side = dictionary.select("term", "idf", "term_bucket")
            weight_expr = bm25_weight_col(
                F.col("tf"), F.col("idf"), F.col("doclen"), avgdl, k1, b
            )
        weighted = (
            part_tf.join(docmap.select("shard", "doc_id", "doc_ord", "doclen"), ["shard", "doc_id"])
            .join(dict_side, "term")
            .select(
                "shard",
                "term",
                "term_bucket",
                "doc_ord",
                weight_expr.alias("weight"),
            )
        )
        if scoring == "qld":
            # Lucene's LMDirichlet clamp floors per-term scores at 0; an
            # exact-zero weight contributes nothing, so it carries no
            # posting (qld_weight_col docstring documents the contract)
            weighted = weighted.where(F.col("weight") > 0.0)
        # Sort-based block packing (one shuffle, no collect_list): hash the
        # postings to (shard, term_bucket) partitions — the same axes as the
        # directory layout, so each output dir is written by exactly one
        # task — sort within partitions, then a single-pass Arrow kernel
        # packs consecutive block_size chunks per (shard, term) run.
        # Head-term skew: a hot term's run streams through the kernel with
        # O(block_size) state (complete blocks emit eagerly), and Tungsten's
        # sort spills — no reducer ever materializes a full posting list.
        # Block boundaries are a pure function of (doc_ord order, block_size)
        # so the index bytes are identical under any parallelism.
        # explicit partition count: repartition(cols) without N lets AQE
        # coalesce the exchange down to one task on small inputs, which
        # serializes the sort+pack+write stage
        blocks = (
            weighted.repartition(write_parallelism, "shard", "term_bucket")
            .sortWithinPartitions("shard", "term_bucket", "term", "doc_ord")
            .mapInArrow(_pack_blocks_arrow(block_size), POSTING_SCHEMA)
        )
        obs_post = Observation() if observe_counts else None
        if observe_counts:
            blocks = blocks.observe(
                obs_post,
                *[
                    F.count(F.when(F.col("shard") == s, 1)).alias(f"b{s}")
                    for s in shards
                ],
                *[
                    F.sum(F.when(F.col("shard") == s, F.col("n"))).alias(
                        f"p{s}"
                    )
                    for s in shards
                ],
            )
        store.overwrite(blocks, "postings", ["shard", "term_bucket"])
        _mark("postings_write", t0)
        t0 = time.time()

        # write-then-manifest: a shard is committed only once its data is down.
        if observe_counts:
            md, mp = obs_docmap.get, obs_post.get
            committed_at = float(time.time())
            # a shard with zero docs gets NO manifest row — identical to
            # the read-back path, whose docmap agg emits no row for it
            collected = [
                (
                    int(s),
                    int(md[f"d{s}"] or 0),
                    int(mp[f"b{s}"] or 0),
                    int(mp[f"p{s}"] or 0),
                    committed_at,
                )
                for s in shards
                if int(md[f"d{s}"] or 0) > 0
            ]
        else:
            summary = (
                store.read("postings")
                .where(F.col("shard").isin(shards))
                .groupBy("shard")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_blocks"),
                    F.sum("n").cast("long").alias("n_postings"),
                )
            )
            ndocs = docmap.groupBy("shard").agg(
                F.count(F.lit(1)).cast("long").alias("n_docs")
            )
            collected = (
                ndocs.join(summary, "shard", "left")
                .select(
                    F.col("shard").cast("int"),
                    "n_docs",
                    F.coalesce("n_blocks", F.lit(0)).cast("long").alias("n_blocks"),
                    F.coalesce("n_postings", F.lit(0)).cast("long").alias("n_postings"),
                    F.lit(time.time()).cast("double").alias("committed_at"),
                )
                .collect()
            )
        store.append(spark.createDataFrame(collected, MANIFEST_SCHEMA), "manifest")
        _mark("manifest_commit", t0)

        # per-batch build metrics table (north-rule "lineage + metrics"):
        # the manifest is the per-shard LINEAGE (what is committed); this
        # records how each batch ran — phase walls, row counts, commit time
        batch_t1 = dict(t)
        row = (
            int(bi),
            ",".join(str(s) for s in shards),
            int(sum(r[1] for r in collected)),  # n_docs (row or tuple)
            int(sum(r[3] for r in collected)),  # n_postings
            float(batch_t1.get("docmap_write", 0.0) - batch_t0.get("docmap_write", 0.0)),
            float(batch_t1.get("postings_write", 0.0) - batch_t0.get("postings_write", 0.0)),
            float(batch_t1.get("manifest_commit", 0.0) - batch_t0.get("manifest_commit", 0.0)),
            float(time.time()),
        )
        store.append(spark.createDataFrame([row], METRICS_SCHEMA), "metrics")

    _resolve_dictionary()  # zero-batch build: stats must still commit
    corpus.unpersist()
    return stats
