"""Positional sidecar index: per-(term, doc) token positions, delta+varbyte.

Phrase and proximity queries need WHERE a term occurs, not just that it
does. Positions live in their own table (layout.POSITIONS_SCHEMA) beside
the postings — the Lucene .doc/.pos split — so pure-BM25 queries never
scan them, and the same (shard, term_bucket) partitioning gives phrase
queries the same directory pruning the scorer gets.

Build plan (ONE data shuffle, same shape as the postings packer):

  pages ─extract/tokenize─► (doc_id, terms)
        ─posexplode─► (doc_id, pos, term)
        ─join docmap (doc_id → shard, doc_ord)─► keyed occurrences
        ─repartition(shard, term_bucket) + sortWithinPartitions
              (shard, term_bucket, term, doc_ord, pos)─►
        ─mapInArrow run-packer─► one row per (term, doc): npos,
              delta+varbyte positions payload
        ─write partitioned by (shard, term_bucket)

The run packer holds back the partition tail's (term, doc) run on every
buffer flush, so a run is never split across emits; carried state is
bounded by the longest document, the same bound extract_corpus already
accepts per row. term_bucket is a pure hash of the term (no dictionary
join), and the docmap join shuffles occurrences once — on a cluster where
docmap is bucketed by doc_id it collapses to a co-located join.

Compaction note: compact_index re-assigns doc_ords when it merges shards,
which invalidates this table; compact deletes a stale positions sidecar
and build_positions must be re-run (documented in compact_index).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from openmatch_spark.analysis import extract_corpus
from openmatch_spark.functions.codec import encode_sequences_batch
from openmatch_spark.index.build import term_bucket_col
from openmatch_spark.index.layout import POSITIONS_SCHEMA
from openmatch_spark.index.storage import IndexStorage

_PACK_BUFFER_ROWS = 1 << 17


def _pack_positions_arrow():
    """mapInArrow kernel: sorted (shard, term_bucket, term, doc_ord, pos)
    stream -> one encoded row per (shard, term, doc_ord) run.

    Complete runs are emitted eagerly; the (possibly unfinished) tail run is
    carried to the next flush, so state is bounded by buffer + one run
    (<= longest doclen)."""
    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("term", pa.string()),
            ("term_bucket", pa.int32()),
            ("shard", pa.int32()),
            ("doc_ord", pa.int64()),
            ("npos", pa.int32()),
            ("positions", pa.binary()),
        ]
    )

    def kernel(iterator):
        buf: list = []
        nbuf = 0

        def flush(final: bool):
            nonlocal buf, nbuf
            if not nbuf:
                return None
            tbl = pa.Table.from_batches(buf).combine_chunks()
            shard = tbl.column("shard").to_numpy()
            bucket = tbl.column("term_bucket").to_numpy()
            terms = tbl.column("term").to_numpy(zero_copy_only=False)
            ords = tbl.column("doc_ord").to_numpy()
            pos = tbl.column("pos").to_numpy()
            nrows = len(pos)

            change = np.empty(nrows, dtype=bool)
            change[0] = True
            change[1:] = (
                (terms[1:] != terms[:-1])
                | (ords[1:] != ords[:-1])
                | (shard[1:] != shard[:-1])
            )
            run_starts = np.flatnonzero(change)
            emit_upto = nrows if final else int(run_starts[-1])
            out = None
            if emit_upto > 0:
                rs = run_starts[run_starts < emit_upto]
                lens = np.empty(rs.shape[0], dtype=np.int64)
                lens[:-1] = rs[1:] - rs[:-1]
                lens[-1] = emit_upto - rs[-1]
                payloads = encode_sequences_batch(pos[:emit_upto], rs)
                out = pa.RecordBatch.from_arrays(
                    [
                        pa.array(terms[rs], type=pa.string()),
                        pa.array(bucket[rs], type=pa.int32()),
                        pa.array(shard[rs], type=pa.int32()),
                        pa.array(ords[rs], type=pa.int64()),
                        pa.array(lens, type=pa.int32()),
                        pa.array(payloads, type=pa.binary()),
                    ],
                    schema=out_schema,
                )
            if final:
                buf, nbuf = [], 0
            else:
                rest = tbl.slice(emit_upto)
                buf = rest.to_batches()
                nbuf = nrows - emit_upto
            return out

        for batch in iterator:
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


def _decode_positions_arrow(batches):
    """mapInArrow kernel: positions rows -> flat (shard, term, doc_ord, pos)
    occurrences. Vectorized decode + np.repeat, no per-occurrence Python."""
    import pyarrow as pa

    from openmatch_spark.functions.codec import decode_postings

    out_schema = pa.schema(
        [
            ("shard", pa.int32()),
            ("term", pa.string()),
            ("doc_ord", pa.int64()),
            ("pos", pa.int64()),
        ]
    )
    for batch in batches:
        if batch.num_rows == 0:
            continue
        shard = batch.column("shard").to_numpy()
        terms = batch.column("term").to_numpy(zero_copy_only=False)
        ords = batch.column("doc_ord").to_numpy()
        payloads = batch.column("positions").to_pylist()
        parts = [decode_postings(p) for p in payloads]
        lens = np.array([p.shape[0] for p in parts], dtype=np.int64)
        if lens.sum() == 0:
            continue
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.repeat(shard, lens), type=pa.int32()),
                pa.array(np.repeat(terms, lens), type=pa.string()),
                pa.array(np.repeat(ords, lens), type=pa.int64()),
                pa.array(np.concatenate(parts), type=pa.int64()),
            ],
            schema=out_schema,
        )


def build_positions(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    table_prefix: str | None = None,
    table_format: str | None = None,
    shuffle_partitions: int | None = None,
) -> dict:
    """Build the positional sidecar for an EXISTING index over the same
    pages. Tokenization, sharding and doc ordinals all come from the index
    (stats.json analyzer + docmap join), so positions and postings agree
    row-for-row. Returns {"n_rows": ..., "n_positions": ...}."""
    spark = pages.sparkSession or spark
    store = IndexStorage.resolve(
        spark, index_dir, table_prefix=table_prefix, table_format=table_format
    )
    stats = store.read_stats()
    analyzer = stats["analyzer"]
    num_term_buckets = int(stats["num_term_buckets"])

    corpus = extract_corpus(pages, analyzer=analyzer)
    occ = corpus.select(
        "doc_id", F.posexplode("terms").alias("pos", "term")
    )
    docmap = store.read("docmap").select("shard", "doc_id", "doc_ord")
    keyed = occ.join(docmap, "doc_id").select(
        "shard",
        term_bucket_col(F.col("term"), num_term_buckets).alias("term_bucket"),
        "term",
        "doc_ord",
        F.col("pos").cast("long").alias("pos"),
    )
    if shuffle_partitions is None:
        shuffle_partitions = max(
            2 * spark.sparkContext.defaultParallelism,
            pages.rdd.getNumPartitions(),
        )
    packed = (
        keyed.repartition(shuffle_partitions, "shard", "term_bucket")
        .sortWithinPartitions("shard", "term_bucket", "term", "doc_ord", "pos")
        .mapInArrow(_pack_positions_arrow(), POSITIONS_SCHEMA)
    )
    # summary counts ride the write job as observed metrics — the former
    # read-back aggregation re-scanned the whole just-written sidecar
    from pyspark.sql import Observation

    obs = Observation()
    packed = packed.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("npos").alias("n_positions"),
    )
    store.overwrite(packed, "positions", ["shard", "term_bucket"])
    summary = obs.get
    return {"n_rows": int(summary["n_rows"]), "n_positions": int(summary["n_positions"] or 0)}
