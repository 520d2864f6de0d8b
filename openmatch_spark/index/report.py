"""Index introspection — the `_cat/segments`-style operational report.

One call summarizes what is on disk: per-segment doc/posting/block counts
from the manifest and postings tables, dictionary size, posting-payload
compression ratio vs raw 8-byte ords + 8-byte weights, and whether the
positional sidecar is live. Everything is a handful of metadata-sized
aggregations — no posting payload is decoded."""

from __future__ import annotations

import pyspark.sql.functions as F

from openmatch_spark.index.load import BM25Index


def index_report(index: BM25Index) -> dict:
    """Summary dict; segment rows sorted by shard id."""
    manifest = {
        int(r["shard"]): r
        for r in index.manifest.orderBy("shard").collect()
    }
    seg_stats = {
        int(r["shard"]): r
        for r in index.postings.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum("n").alias("n_postings"),
            F.sum(F.length("docs")).alias("doc_bytes"),
            F.sum(F.length("scores")).alias("score_bytes"),
            F.avg("n").alias("avg_block_fill"),
        )
        .collect()
    }
    segments = []
    for shard in index.committed_shards():
        m = manifest.get(shard)
        s = seg_stats.get(shard)
        segments.append(
            {
                "shard": shard,
                "n_docs": int(m["n_docs"]) if m else 0,
                "n_postings": int(s["n_postings"]) if s else 0,
                "n_blocks": int(s["n_blocks"]) if s else 0,
                "avg_block_fill": round(float(s["avg_block_fill"]), 2) if s else 0.0,
            }
        )
    total_postings = sum(s["n_postings"] for s in segments)
    enc_bytes = sum(
        int(s["doc_bytes"]) + int(s["score_bytes"]) for s in seg_stats.values()
    )
    raw_bytes = total_postings * 16  # int64 ord + float64 weight
    dict_rows = index.dictionary.count()
    stats = index.stats
    return {
        "n_segments": len(segments),
        "n_docs": sum(s["n_docs"] for s in segments),
        "n_postings": total_postings,
        "n_terms": int(dict_rows),
        "analyzer": stats["analyzer"],
        "block_size": int(stats["block_size"]),
        "avgdl": float(stats["avgdl"]),
        "payload_bytes": int(enc_bytes),
        "compression_ratio": round(raw_bytes / enc_bytes, 3) if enc_bytes else None,
        "has_positions": index.has_positions(),
        "segments": segments,
    }
