"""Resumability: kill mid-build, resume, byte-identical index (SURVEY §5.5)."""

import pytest

from openmatch_spark.fixtures import PAGES_SCHEMA, QUERIES_SCHEMA, gen_pages_rows, gen_queries_rows
from openmatch_spark.index import build_index, load_index
from openmatch_spark.query import search


def _index_content(spark, d):
    idx = load_index(spark, d)
    postings = sorted(
        (r["term"], r["shard"], r["block_id"], bytes(r["docs"]), bytes(r["scores"]))
        for r in idx.postings.collect()
    )
    docmap = sorted(map(tuple, idx.docmap.select("shard", "doc_ord", "doc_id").collect()))
    return postings, docmap


def test_kill_and_resume_identical(spark, tmp_path):
    rows = gen_pages_rows(200)
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)

    # full build in one go -> golden
    d1 = str(tmp_path / "full")
    build_index(spark, pages, d1, num_shards=4, num_term_buckets=4, block_size=16)

    # interrupted build: 4 shards in batches of 1, die after 2 batches
    d2 = str(tmp_path / "resumed")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(
            spark, pages, d2, num_shards=4, num_term_buckets=4, block_size=16,
            shard_batch_size=1, fail_after_batches=2,
        )
    manifest = load_index(spark, d2).manifest
    assert manifest.select("shard").distinct().count() == 2  # partial commit

    # resume completes the remaining shards without touching finished ones
    build_index(
        spark, pages, d2, num_shards=4, num_term_buckets=4, block_size=16,
        shard_batch_size=2, resume=True,
    )
    assert _index_content(spark, d2) == _index_content(spark, d1)

    # and the resumed index answers queries identically
    queries = spark.createDataFrame(gen_queries_rows(5), QUERIES_SCHEMA)
    r1 = sorted(map(tuple, search(load_index(spark, d1), queries, k=5).collect()))
    r2 = sorted(map(tuple, search(load_index(spark, d2), queries, k=5).collect()))
    assert r1 == r2


def test_resume_noop_when_complete(spark, tmp_path):
    rows = gen_pages_rows(80)
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    d = str(tmp_path / "idx")
    build_index(spark, pages, d, num_shards=2, num_term_buckets=2)
    before = _index_content(spark, d)
    build_index(spark, pages, d, num_shards=2, num_term_buckets=2, resume=True)
    assert _index_content(spark, d) == before


def test_build_restores_session_confs(spark, tmp_path):
    """build_index must not leak shuffle.partitions or overwrite-mode confs —
    on success OR on failure (ADVICE r1: a fresh single-batch build left the
    session in 'static' overwrite mode)."""
    pages = spark.createDataFrame(gen_pages_rows(40, seed=5), PAGES_SCHEMA)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    build_index(spark, pages, str(tmp_path / "ok"), num_shards=2, num_term_buckets=2)
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "dynamic"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev_sp

    with pytest.raises(RuntimeError):
        build_index(
            spark, pages, str(tmp_path / "fail"), num_shards=2,
            num_term_buckets=2, shard_batch_size=1, fail_after_batches=1,
        )
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "dynamic"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev_sp
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")


def test_build_metrics_table(spark, tmp_path):
    """Every batch appends one metrics row (phase walls + row counts);
    resume appends metrics only for the batches it actually ran."""
    pages = spark.createDataFrame(gen_pages_rows(60, seed=6), PAGES_SCHEMA)
    d = str(tmp_path / "m")
    build_index(spark, pages, d, num_shards=4, num_term_buckets=2, shard_batch_size=2)
    idx = load_index(spark, d)
    rows = sorted(idx.metrics.collect(), key=lambda r: r["batch_id"])
    assert [r["batch_id"] for r in rows] == [0, 1]
    assert sum(r["n_docs"] for r in rows) == 60
    assert all(r["postings_sec"] > 0 for r in rows)
    manifest_docs = sum(r["n_docs"] for r in idx.manifest.collect())
    assert manifest_docs == 60
