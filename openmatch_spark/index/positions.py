"""Positional sidecar index: per-(term, doc) token positions, delta+varbyte.

Phrase and proximity queries need WHERE a term occurs, not just that it
does. Positions live in their own table (layout.POSITIONS_SCHEMA) beside
the postings — the Lucene .doc/.pos split — so pure-BM25 queries never
scan them, and the same (shard, term_bucket) partitioning gives phrase
queries the same directory pruning the scorer gets.

Build plan (ONE data shuffle, and it carries already-encoded rows):

  pages ─extract/tokenize + map-side run encode (one mapInArrow stage)─►
              one row per (doc, term): npos, delta+varbyte payload
        ─join docmap (doc_id → shard, doc_ord)─► keyed rows
        ─repartition(shard, term_bucket) + sortWithinPartitions
              (shard, term_bucket, term, doc_ord)─►
        ─write partitioned by (shard, term_bucket)

A positions run never spans documents and each input row is one whole
document, so the payload is final before anything is shuffled — the
exchange moves one compact encoded row per (doc, term) instead of one
row per token occurrence, and no Python kernel runs after it.
term_bucket is a pure hash of the term (no dictionary join), and the
docmap join moves each encoded row at most once — on a cluster where
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
from openmatch_spark.index.storage import IndexStorage


def _encode_doc_positions_arrow():
    """mapInArrow kernel: (doc_id, terms) -> one encoded positions row per
    (doc, term): (doc_id, term, npos, positions payload).

    A positions run never spans documents and every input row IS one whole
    document, so the final delta+varbyte payload can be built map-side in
    the same stage as tokenization — the shuffle then moves one compact
    encoded row per (doc, term) instead of one 40-byte row per token
    occurrence (guide: shuffle encoded payloads once, not raw occurrence
    streams). Payload bytes are identical to the former post-shuffle
    packer: same positions, same encode_sequences_batch."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out_schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("term", pa.string()),
            ("npos", pa.int32()),
            ("positions", pa.binary()),
        ]
    )

    def kernel(iterator):
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            terms_col = batch.column("terms")
            lens = pc.fill_null(
                pc.list_value_length(terms_col), 0
            ).to_numpy().astype(np.int64)
            total = int(lens.sum())
            if total == 0:
                continue
            flat = terms_col.flatten()
            codes_arr = flat.dictionary_encode()
            codes = codes_arr.indices.to_numpy().astype(np.int64)
            vocab = codes_arr.dictionary
            doc_idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
            starts = np.zeros(batch.num_rows, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
            # group occurrences into (doc, term) runs; pos stays ascending
            # within a run because lexsort is stable and input order is
            # ascending pos
            order = np.lexsort((pos, codes, doc_idx))
            sd, sc, sp = doc_idx[order], codes[order], pos[order]
            change = np.empty(total, dtype=bool)
            change[0] = True
            change[1:] = (sd[1:] != sd[:-1]) | (sc[1:] != sc[:-1])
            run_starts = np.flatnonzero(change)
            run_lens = np.empty(run_starts.shape[0], dtype=np.int64)
            run_lens[:-1] = run_starts[1:] - run_starts[:-1]
            run_lens[-1] = total - run_starts[-1]
            payloads = encode_sequences_batch(sp, run_starts)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id").take(pa.array(sd[run_starts])),
                    vocab.take(pa.array(sc[run_starts])).cast(pa.string()),
                    pa.array(run_lens, type=pa.int32()),
                    pa.array(payloads, type=pa.binary()),
                ],
                schema=out_schema,
            )

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
    # encode each document's (term -> positions payload) rows MAP-SIDE, in
    # the same stage as tokenization (kernel docstring): the only shuffle
    # then carries one compact encoded row per (doc, term) — at web-corpus
    # token counts that is several times fewer rows and bytes than the
    # former per-occurrence stream, and no Python kernel runs after the
    # exchange.
    enc = corpus.select("doc_id", "terms").mapInArrow(
        _encode_doc_positions_arrow(),
        "doc_id string, term string, npos int, positions binary",
    )
    docmap = store.read("docmap").select("shard", "doc_id", "doc_ord")
    keyed = enc.join(docmap, "doc_id").select(
        "term",
        term_bucket_col(F.col("term"), num_term_buckets).alias("term_bucket"),
        "shard",
        "doc_ord",
        "npos",
        "positions",
    )
    if shuffle_partitions is None:
        shuffle_partitions = max(
            2 * spark.sparkContext.defaultParallelism,
            pages.rdd.getNumPartitions(),
        )
    packed = (
        keyed.repartition(shuffle_partitions, "shard", "term_bucket")
        .sortWithinPartitions("shard", "term_bucket", "term", "doc_ord")
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
