"""One-call curate -> index pipeline: raw pages to a searchable BM25 index
with a persisted per-document curation lineage.

The composition a production ingest actually runs (the data-pipeline twin
of the reference's beir_eval_pipeline — its only self-contained end-to-end
driver, driver/beir_eval_pipeline.py): gate language/quality, dedup
(canonical-url + exact + LSH near-dup), index the survivors, and record WHY
every dropped document was dropped, because at web scale "the index lost
page X" is unanswerable without per-doc lineage.

The verdict table is written under <index_dir>/curation before the build
starts (parquet next to stats.json — same filesystem assumption), so a
failed build leaves the lineage of what was attempted; build_index's own
resume semantics are unchanged.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def curate_and_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    url_dedup: bool = True,
    shingle_n: int = 3,
    num_hashes: int = 8,
    num_bands: int = 4,
    jaccard_threshold: float = 0.8,
    max_bucket: int = 1000,
    **build_kwargs,
) -> dict:
    """pages (url, warc_ts, html, text, lang) -> curated BM25 index.

    Returns build_index's stats dict plus a "curation" summary:
    {"n_pages", "n_kept", "drops": {reason: count}, "lineage": path}.
    build_kwargs pass through to build_index (num_shards, analyzer, ...).

    Scale shape: the gates are projections over the scan, dedup is the
    shuffle-bounded deduplicate_corpus composition, and the kept-set join
    back to pages is a semi-join on the url key — one extra shuffle of the
    (url) column set, nothing quadratic, before the normal build.
    """
    from openmatch_spark.operators.curate import curate_corpus

    verdicts = curate_corpus(
        pages,
        langs=langs,
        min_quality=min_quality,
        id_col="url",
        text_col="text",
        url_col="url" if url_dedup else None,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        num_bands=num_bands,
        jaccard_threshold=jaccard_threshold,
        max_bucket=max_bucket,
    ).localCheckpoint(eager=True)  # one evaluation feeds lineage + join + counts

    lineage = os.path.join(index_dir, "curation")
    verdicts.write.mode("overwrite").parquet(lineage)

    kept = pages.join(
        verdicts.where(F.col("keep") == 1).select(F.col("doc_id").alias("url")),
        "url",
        "left_semi",
    )
    from openmatch_spark.index import build_index

    stats = dict(build_index(spark, kept, index_dir, **build_kwargs))
    drops = {
        r["reason"]: r["n"]
        for r in verdicts.where(F.col("keep") == 0)
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_pages = verdicts.count()
    stats["curation"] = {
        "n_pages": n_pages,
        "n_kept": n_pages - sum(drops.values()),
        "drops": drops,
        "lineage": lineage,
    }
    return stats
