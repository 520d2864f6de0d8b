"""End-to-end BEIR-style eval pipeline (driver/beir_eval_pipeline.py:19-133):
BEIR-shaped dir -> load -> index -> search -> nDCG@10 — the reference's only
self-contained query→metric pipeline, mirrored on the Spark engine."""

from __future__ import annotations

import json
import os

import pytest

from openmatch_spark.index import build_index, load_index
from openmatch_spark.operators.metrics import ndcg_at_k
from openmatch_spark.operators.transforms import fill_template
from openmatch_spark.query import search
from openmatch_spark.sources.readers import load_beir_dataset


@pytest.fixture(scope="module")
def beir_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("beir")
    corpus = [
        {"_id": "d1", "title": "spark joins", "text": "broadcast hash join strategies in spark"},
        {"_id": "d2", "title": "window functions", "text": "rank and row number over partitions"},
        {"_id": "d3", "title": "stream processing", "text": "watermarks and late data in streams"},
        {"_id": "d4", "title": "join tuning", "text": "skew salting for big joins and shuffles"},
        {"_id": "d5", "title": "sorting", "text": "external sort spills to disk under pressure"},
    ]
    queries = [
        {"_id": "q1", "text": "spark join strategies"},
        {"_id": "q2", "text": "window rank partitions"},
        {"_id": "q3", "text": "unused train query"},
    ]
    with open(d / "corpus.jsonl", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in corpus)
    with open(d / "queries.jsonl", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in queries)
    os.makedirs(d / "qrels")
    with open(d / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        f.write("q1\td1\t2\nq1\td4\t1\nq2\td2\t2\n")
    with open(d / "qrels" / "train.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        f.write("q3\td5\t1\n")
    return str(d)


def test_beir_loader_shapes(spark, beir_dir):
    ds = load_beir_dataset(spark, beir_dir)
    assert ds["corpus"].count() == 5
    assert set(ds["qrels"]) == {"train", "test"}  # no dev.tsv -> absent
    # queries filtered to the split's qrels qids (beir_dataset.py:79)
    assert {r["query_id"] for r in ds["queries"]["test"].collect()} == {"q1", "q2"}
    assert {r["query_id"] for r in ds["queries"]["train"].collect()} == {"q3"}


def test_beir_eval_pipeline_e2e(spark, beir_dir, tmp_path):
    ds = load_beir_dataset(spark, beir_dir)
    # reference doc template "<title> [SEP] <text>" (beir_eval_pipeline.py
    # via DataArguments doc_template default)
    pages = fill_template(
        ds["corpus"], "<title> [SEP] <text>", out="text2"
    ).select(
        ds["corpus"]["doc_id"].alias("url"),
        "text2",
    ).withColumnRenamed("text2", "text")
    idx_dir = str(tmp_path / "beir_idx")
    build_index(spark, pages.selectExpr("url", "text"), idx_dir,
                analyzer="simple", num_shards=2, num_term_buckets=2)
    idx = load_index(spark, idx_dir)
    run = search(idx, ds["queries"]["test"], k=5)
    rows = {(r["query_id"], r["doc_id"], r["rank"]) for r in run.collect()}
    assert ("q1", "d1", 1) in rows  # title+text both match q1
    m = ndcg_at_k(run, ds["qrels"]["test"], k=10).first()
    assert m["n_queries"] == 2
    assert 0.5 < m["ndcg"] <= 1.0
