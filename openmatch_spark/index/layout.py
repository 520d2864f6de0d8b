"""On-disk index layout (Iceberg-ready, Parquet in the sandbox).

Schemas and path/stat helpers only — all table I/O goes through
index/storage.py (IndexStorage), which targets an Iceberg catalog when one
is configured (`spark.sql.catalog.local` set, or an explicit table_prefix),
session-catalog tables, or plain Parquet paths — identical schemas either
way (SURVEY §7.4).

Layout under <index_dir>/:
  stats.json                 — {"n_docs", "avgdl", "total_terms", build params}
  dictionary/                — (term, df, cf, idf, term_bucket)   [parquet]
  docmap/                    — (shard, doc_ord, doc_id, doclen)   [partitioned by shard]
  postings/                  — (term, shard, block_id, first_ord, last_ord,
                                n, max_score, docs BINARY, scores BINARY)
                               [partitioned by term_bucket]
  manifest/                  — (shard, n_docs, n_blocks, committed_at)
                               append-only; a shard is COMPLETE iff present.

The doc_ord is a dense per-shard int64 assigned by sorting doc_id within the
shard; (shard, doc_ord) <-> doc_id via docmap. Posting payloads are
delta+varbyte docIDs and float64 little-endian precomputed BM25 weights
(weights are fully determined at build time once corpus stats are fixed —
an impact-ordered layout that removes the doclen join from the query path).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

POSTING_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("term_bucket", IntegerType()),
        StructField("shard", IntegerType()),
        StructField("block_id", IntegerType()),
        StructField("first_ord", LongType()),
        StructField("last_ord", LongType()),
        StructField("n", IntegerType()),
        StructField("max_score", DoubleType()),
        StructField("docs", BinaryType()),
        StructField("scores", BinaryType()),
    ]
)

# optional positional sidecar (phrase/proximity queries): per-(term, doc)
# delta+varbyte token positions, partitioned like postings so the same
# bucket pruning applies. Kept OUT of the postings table on purpose —
# positions are several times the postings' size, and pure-BM25 queries
# must never scan them (Lucene keeps .pos beside .doc for the same reason).
POSITIONS_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("term_bucket", IntegerType()),
        StructField("shard", IntegerType()),
        StructField("doc_ord", LongType()),
        StructField("npos", IntegerType()),
        StructField("positions", BinaryType()),
    ]
)

DOCMAP_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("doc_ord", LongType()),
        StructField("doc_id", StringType()),
        StructField("doclen", LongType()),
    ]
)

DICT_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("df", LongType()),
        StructField("cf", LongType()),
        StructField("idf", DoubleType()),
        StructField("term_bucket", IntegerType()),
    ]
)

METRICS_SCHEMA = StructType(
    [
        StructField("batch_id", IntegerType()),
        StructField("shards", StringType()),
        StructField("n_docs", LongType()),
        StructField("n_postings", LongType()),
        StructField("docmap_sec", DoubleType()),
        StructField("postings_sec", DoubleType()),
        StructField("manifest_sec", DoubleType()),
        StructField("committed_at", DoubleType()),
    ]
)

MANIFEST_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("n_docs", LongType()),
        StructField("n_blocks", LongType()),
        StructField("n_postings", LongType()),
        StructField("committed_at", DoubleType()),
    ]
)

# tombstone table (document deletes): SHARD-SCOPED live-doc masks, the
# Lucene liveDocs design. delete_docs resolves doc_id -> every committed
# (shard, doc_ord) occurrence AT DELETE TIME and appends those pairs; a
# shard ingested later never matches an older tombstone, so re-ingesting
# a url (upsert) resurrects it naturally. Query paths mask the pairs
# before any top-k cut; compaction drops deleted docs physically and
# purges the merged shards' tombstone rows.
DELETES_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("doc_ord", LongType()),
        StructField("doc_id", StringType()),
        StructField("deleted_at", DoubleType()),
    ]
)


@dataclass
class IndexPaths:
    root: str

    @property
    def stats(self) -> str:
        return os.path.join(self.root, "stats.json")

    @property
    def dictionary(self) -> str:
        return os.path.join(self.root, "dictionary")

    @property
    def docmap(self) -> str:
        return os.path.join(self.root, "docmap")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def positions(self) -> str:
        return os.path.join(self.root, "positions")

    @property
    def manifest(self) -> str:
        return os.path.join(self.root, "manifest")

    @property
    def deletes(self) -> str:
        return os.path.join(self.root, "deletes")

    @property
    def metrics(self) -> str:
        return os.path.join(self.root, "metrics")

    def write_stats(self, stats: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self.stats + ".tmp"
        with open(tmp, "w") as f:
            json.dump(stats, f, indent=1, sort_keys=True)
        os.replace(tmp, self.stats)  # atomic: stats exist fully or not at all

    def read_stats(self) -> dict:
        with open(self.stats) as f:
            return json.load(f)

    def has_stats(self) -> bool:
        return os.path.exists(self.stats)
