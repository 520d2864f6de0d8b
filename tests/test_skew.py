"""Head-term skew stress (north_rule: 'partitioning / shuffle / skew handled
explicitly'). A stopword-like term appears in EVERY document — the worst
Zipf case — and the build must neither concentrate it in one reducer state
(the streaming packer caps state at block_size) nor corrupt results.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from openmatch_spark.fixtures import PAGES_SCHEMA, _EPOCH
from openmatch_spark.index import build_index, load_index
from openmatch_spark.query import search


@pytest.fixture(scope="module")
def skew_idx(spark, tmp_path_factory):
    # every doc contains 'the' 3x; tail terms distinguish docs
    rows = []
    for i in range(3000):
        text = f"the the the tail{i % 97:03d} tail{i % 31:03d} uniq{i:05d}"
        rows.append((f"https://s.example/{i}", _EPOCH, text.encode(), text, "en"))
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    d = str(tmp_path_factory.mktemp("skew_idx"))
    build_index(spark, pages, d, analyzer="simple", num_shards=4,
                num_term_buckets=8, block_size=64)
    return load_index(spark, d)


def test_head_term_split_into_bounded_blocks(skew_idx):
    blocks = skew_idx.postings.where(F.col("term") == "the")
    stats = blocks.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.max("n").alias("max_n"),
        F.sum("n").alias("total"),
    ).first()
    assert stats["total"] == 3000  # df('the') == corpus size
    assert stats["max_n"] <= 64  # no block exceeds block_size
    assert stats["n_blocks"] >= 3000 // 64  # genuinely split, not one blob


def test_head_term_query_correct_under_skew(skew_idx, spark):
    # 'the' matches everything at equal tf/doclen: deterministic tie-break
    # (score DESC, doc_id ASC) must hold
    q = spark.createDataFrame([("q0", "the uniq00042")], "query_id string, text string")
    hits = search(skew_idx, q, k=5).collect()
    assert hits[0]["doc_id"] == "https://s.example/42"  # uniq term dominates
    assert [h["rank"] for h in hits] == [1, 2, 3, 4, 5]
    # remaining ranks: equal 'the'-only scores, tie-broken by doc_id asc
    rest = [h["doc_id"] for h in hits[1:]]
    assert rest == sorted(rest)


def test_skew_invariant_under_layout(skew_idx, spark, tmp_path_factory):
    rows = skew_idx.postings.where(F.col("term") == "the").count()
    # rebuild with different shards/buckets/blocks: same run
    pages_rows = []
    for i in range(3000):
        text = f"the the the tail{i % 97:03d} tail{i % 31:03d} uniq{i:05d}"
        pages_rows.append((f"https://s.example/{i}", _EPOCH, text.encode(), text, "en"))
    pages = spark.createDataFrame(pages_rows, PAGES_SCHEMA)
    d2 = str(tmp_path_factory.mktemp("skew_idx2"))
    build_index(spark, pages, d2, analyzer="simple", num_shards=7,
                num_term_buckets=3, block_size=128)
    idx2 = load_index(spark, d2)
    q = spark.createDataFrame(
        [("q0", "the tail042"), ("q1", "uniq00007 the")],
        "query_id string, text string",
    )
    a = {(r["query_id"], r["doc_id"], round(r["score"], 9), r["rank"])
         for r in search(skew_idx, q, k=10).collect()}
    b = {(r["query_id"], r["doc_id"], round(r["score"], 9), r["rank"])
         for r in search(idx2, q, k=10).collect()}
    assert a == b and len(a) == 20
    # head term's list is split per (shard, 64-block): at least ceil(3000/64)
    assert rows >= 47
