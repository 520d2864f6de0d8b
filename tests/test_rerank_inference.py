"""Rerank reproduces first-stage scores exactly; inference plumbing; sinks."""

import pytest
import pyspark.sql.functions as F

from openmatch_spark.fixtures import (
    PAGES_SCHEMA,
    QUERIES_SCHEMA,
    gen_pages_rows,
    gen_queries_rows,
)
from openmatch_spark.index import build_index, load_index
from openmatch_spark.operators.inference import (
    encode_and_index_dense,
    encode_texts,
    write_train_groups,
)
from openmatch_spark.operators.rerank import rerank_bm25
from openmatch_spark.query import search


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    rows = gen_pages_rows(200)
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    d = str(tmp_path_factory.mktemp("idx"))
    build_index(spark, pages, d, num_shards=2, num_term_buckets=4)
    queries = spark.createDataFrame(gen_queries_rows(8), QUERIES_SCHEMA)
    return load_index(spark, d), pages, queries


def test_rerank_reproduces_first_stage(spark, setup):
    """Exact-BM25 rerank with frozen index stats == first-stage scores."""
    idx, pages, queries = setup
    run = search(idx, queries, k=10)
    corpus = pages.select(F.col("url").alias("doc_id"), "text")
    rr = rerank_bm25(idx, run, corpus, queries)
    a = {(r["query_id"], r["doc_id"]): (r["score"], r["rank"]) for r in run.collect()}
    b = {(r["query_id"], r["doc_id"]): (r["score"], r["rank"]) for r in rr.collect()}
    assert set(a) == set(b)
    for key in a:
        assert a[key][0] == pytest.approx(b[key][0], abs=1e-9), key
        assert a[key][1] == b[key][1], key


def test_rerank_depth_cut(spark, setup):
    idx, pages, queries = setup
    run = search(idx, queries, k=10)
    corpus = pages.select(F.col("url").alias("doc_id"), "text")
    rr = rerank_bm25(idx, run, corpus, queries, depth=3)
    per_q = rr.groupBy("query_id").count().collect()
    assert all(r["count"] <= 3 for r in per_q)


def test_encode_texts_deterministic(spark):
    df = spark.createDataFrame([("a", "hello"), ("b", "world")], "doc_id string, text string")
    e1 = {r["doc_id"]: r["embedding"] for r in encode_texts(df, dim=8).collect()}
    e2 = {r["doc_id"]: r["embedding"] for r in encode_texts(df, dim=8).collect()}
    assert e1 == e2
    assert len(e1["a"]) == 8
    import numpy as np

    assert np.linalg.norm(e1["a"]) == pytest.approx(1.0, abs=1e-5)


def test_encode_and_index_dense_sink(spark, tmp_path):
    df = spark.createDataFrame([(str(i), f"doc {i}") for i in range(20)], "doc_id string, text string")
    out = str(tmp_path / "emb")
    encode_and_index_dense(df, out, num_shards=4, dim=8)
    back = spark.read.parquet(out)
    assert back.count() == 20
    assert set(back.columns) >= {"doc_id", "embedding", "shard"}
    assert back.select("shard").distinct().count() <= 4


def test_write_train_groups(spark, tmp_path):
    g = spark.createDataFrame(
        [(f"q{i}", ["p"], ["n1", "n2"]) for i in range(10)],
        "query_id string, positives array<string>, negatives array<string>",
    )
    out = str(tmp_path / "groups")
    write_train_groups(g, out, shard_size=4)
    back = spark.read.json(out)
    assert back.count() == 10
    row = back.where(F.col("query_id") == "q3").collect()[0]
    assert row["negatives"] == ["n1", "n2"]
