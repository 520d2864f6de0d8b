"""Round-5: big-batch docmap-join strategy — above _BROADCAST_CUT_MAX_ROWS
expected hit rows, search() broadcasts the DISTINCT hit-doc set (two
broadcast hops, q x k rows never cross the driver) instead of the whole
cut. Both shapes must be bit-identical; the plan must still never
shuffle the docmap."""

import pytest

import openmatch_spark.query.bm25_search as bs
from openmatch_spark.fixtures import PAGES_SCHEMA, gen_pages_rows
from openmatch_spark.index import build_index, load_index
from openmatch_spark.query import search


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("r5g") / "idx")
    pages = spark.createDataFrame(gen_pages_rows(300), PAGES_SCHEMA)
    build_index(spark, pages, d, analyzer="simple", num_shards=4,
                num_term_buckets=4)
    return load_index(spark, d)


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.collect()
    )


def test_distinct_doc_broadcast_identical(spark, idx, monkeypatch):
    qs = spark.createDataFrame(
        [(f"q{i}", f"term{i % 40:04d} term{(i * 7) % 60:04d}")
         for i in range(60)],
        "query_id string, text string",
    )
    small_path = _rows(search(idx, qs, k=20))
    monkeypatch.setattr(bs, "_BROADCAST_CUT_MAX_ROWS", 0)
    big_path = _rows(search(idx, qs, k=20))
    assert small_path == big_path
    assert big_path  # non-empty


def test_distinct_doc_broadcast_plan(spark, idx, monkeypatch):
    monkeypatch.setattr(bs, "_BROADCAST_CUT_MAX_ROWS", 0)
    qs = spark.createDataFrame(
        [("q0", "term0001 term0003")], "query_id string, text string"
    )
    plan = search(idx, qs, k=10)._jdf.queryExecution().executedPlan().toString()
    # two broadcast exchanges on the hit path, docmap never on the
    # shuffle side of its join
    assert plan.count("BroadcastExchange") >= 2
    assert "SortMergeJoin" not in plan