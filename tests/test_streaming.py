"""Incremental index ingest via Structured Streaming (Trigger.AvailableNow)."""

import os

import pyspark.sql.functions as F

from openmatch_spark.fixtures import PAGES_SCHEMA, QUERIES_SCHEMA, gen_pages_rows
from openmatch_spark.index import build_index, load_index
from openmatch_spark.query import search
from openmatch_spark.streaming import incremental_index_available_now


def test_incremental_ingest(spark, tmp_path):
    rows = gen_pages_rows(150)
    base, extra = rows[:100], rows[100:]
    idx_dir = str(tmp_path / "idx")
    watch = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(watch)

    build_index(
        spark, spark.createDataFrame(base, PAGES_SCHEMA), idx_dir,
        num_shards=2, num_term_buckets=4,
    )
    idx = load_index(spark, idx_dir)
    n_docs_before = idx.docmap.count()

    # a query matching ONLY a doc from the new batch
    marker = "zzzincremental"
    extra = [(u, ts, h, t + " " + marker, lang) for (u, ts, h, t, lang) in extra]
    spark.createDataFrame(extra, PAGES_SCHEMA).write.parquet(watch + "/batch1.parquet")

    queries = spark.createDataFrame([("qn", marker)], QUERIES_SCHEMA)
    assert search(idx, queries, k=10).count() == 0  # unseen before ingest

    n_batches = incremental_index_available_now(spark, watch, idx_dir, ckpt)
    assert n_batches >= 1

    idx2 = load_index(spark, idx_dir)
    assert idx2.docmap.count() == n_docs_before + len(extra)
    # marker is OOV in the frozen dictionary (documented trade-off), but
    # docs ARE searchable by their pre-existing vocabulary
    hit = search(idx2, spark.createDataFrame([("q", "term0000")], QUERIES_SCHEMA), k=200)
    new_urls = {u for (u, *_rest) in extra}
    assert any(r["doc_id"] in new_urls for r in hit.collect())

    # exactly-once: re-running the drained stream ingests nothing new
    n2 = incremental_index_available_now(spark, watch, idx_dir, ckpt)
    assert load_index(spark, idx_dir).docmap.count() == n_docs_before + len(extra)
