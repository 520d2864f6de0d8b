"""Round-5: fielded-family lifecycle parity (VERDICT r4 item 5).

The single-index surface has deletes/upsert/rebaseline; these tests pin
the same contract on the fielded family: delete_docs_fielded masks a doc
from every per-field query path at once, upsert_docs_fielded replaces
content per field (including retracting a field that went empty), and a
delete + compact_fielded_index(rebaseline_stats=True) cycle lands
bit-identically on a fresh fielded build of the surviving corpus —
mirroring tests/test_deletes.py's single-index contract."""

import json
import tempfile

import pytest

from openmatch_spark.query import (
    build_fielded_index,
    compact_fielded_index,
    delete_docs_fielded,
    load_fielded_index,
    search_dsl_fielded,
    search_fielded,
    upsert_docs_fielded,
)

ROWS = [
    ("d0", "spark engine overview", "the spark engine builds hash join plans"),
    ("d1", "merge sort deep dive", "sort merge join beats hash join"),
    ("d2", "window functions", "rank rows per partition with window functions"),
    ("d3", "spark windowing", "spark window aggregates and sessionization"),
    ("d4", "hash tables", "open addressing and chained hash tables"),
    ("d5", "spark hash internals", "window merge spark spark"),
]
SCHEMA = "doc_id string, title string, body string"

DSL = {
    "q0": {"bool": {"should": [
        {"match": {"title": "spark window"}},
        {"match": {"body": "hash join"}},
    ]}},
    "q1": {"dis_max": {"queries": [
        {"match": {"title": "merge"}},
        {"match": {"body": "merge"}},
    ], "tie_breaker": 0.4}},
}


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.collect()
    )


def _build(spark, rows, **kw):
    d = tempfile.mkdtemp(prefix="om_r5c_")
    pages = spark.createDataFrame(rows, SCHEMA)
    build_fielded_index(spark, pages, d, ["title", "body"],
                        analyzer="simple", num_shards=2, num_term_buckets=4,
                        block_size=4, **kw)
    return d


def test_fielded_delete_masks_every_path(spark):
    d = _build(spark, ROWS)
    res = delete_docs_fielded(spark, d, ["d0", "d3"])
    assert set(res) == {"body", "title"}
    assert all(r["n_new"] >= 1 for r in res.values())
    fx = load_fielded_index(spark, d)
    run = search_dsl_fielded(fx, DSL, k=10)
    docs = {r["doc_id"] for r in run.collect()}
    assert docs and not docs & {"d0", "d3"}
    # multi_match path masks too
    mm = search_fielded(fx, spark.createDataFrame(
        [("m", "spark window")], "query_id string, text string"
    ), k=10)
    mdocs = {r["doc_id"] for r in mm.collect()}
    assert mdocs and not mdocs & {"d0", "d3"}
    # idempotent + unknown id is a no-op
    res2 = delete_docs_fielded(spark, d, ["d0", "nope"])
    assert all(r["n_new"] == 0 for r in res2.values())


def test_fielded_delete_compact_rebaseline_equals_fresh(spark):
    d = _build(spark, ROWS)
    delete_docs_fielded(spark, d, ["d1", "d5"])
    out = compact_fielded_index(spark, d, rebaseline_stats=True)
    assert set(out) == {"body", "title"}
    survivors = [r for r in ROWS if r[0] not in ("d1", "d5")]
    fresh = _build(spark, survivors)
    run_a = search_dsl_fielded(load_fielded_index(spark, d), DSL, k=10)
    run_b = search_dsl_fielded(load_fielded_index(spark, fresh), DSL, k=10)
    assert _rows(run_a) == _rows(run_b)
    assert _rows(run_a)  # non-empty


def test_fielded_upsert_replaces_and_retracts(spark):
    d = _build(spark, ROWS)
    # d4 gets new content in both fields; d2's body goes empty (retract);
    # d9 is a brand-new doc
    up = spark.createDataFrame(
        [
            ("d4", "spark shuffle tuning", "spark shuffle partitions and skew"),
            ("d2", "window functions", None),
            ("d9", "bloom filters", "bloom filter joins in spark"),
        ],
        SCHEMA,
    )
    res = upsert_docs_fielded(spark, up, d)
    assert set(res) == {"body", "title"}
    assert res["body"]["upserted"] is not None
    fx = load_fielded_index(spark, d)
    # new content findable, in both fields
    run = search_dsl_fielded(fx, {
        "t": {"match": {"title": "shuffle tuning"}},
        "b": {"match": {"body": "bloom filter"}},
    }, k=10)
    got = {(r["query_id"], r["doc_id"]) for r in run.collect()}
    assert ("t", "d4") in got and ("b", "d9") in got
    # old d4 content is gone
    old = search_dsl_fielded(fx, {"o": {"match": {"title": "hash tables"}}},
                             k=10)
    assert "d4" not in {r["doc_id"] for r in old.collect()}
    # retracted body: d2 no longer matches through body, still via title
    ret = search_dsl_fielded(fx, {
        "rb": {"match": {"body": "rank rows partition"}},
        "rt": {"match": {"title": "window functions"}},
    }, k=10)
    got = {(r["query_id"], r["doc_id"]) for r in ret.collect()}
    assert ("rb", "d2") not in got
    assert ("rt", "d2") in got
    # upsert semantics converge to a fresh build after rebaseline
    compact_fielded_index(spark, d, rebaseline_stats=True)
    merged = [r for r in ROWS if r[0] not in ("d4", "d2")] + [
        ("d4", "spark shuffle tuning", "spark shuffle partitions and skew"),
        ("d2", "window functions", None),
        ("d9", "bloom filters", "bloom filter joins in spark"),
    ]
    fresh = _build(spark, merged)
    run_a = search_dsl_fielded(load_fielded_index(spark, d), DSL, k=10)
    run_b = search_dsl_fielded(load_fielded_index(spark, fresh), DSL, k=10)
    assert _rows(run_a) == _rows(run_b)


def test_fielded_upsert_carries_frozen_attrs(spark):
    rows = [(r[0], r[1], r[2], "en") for r in ROWS]
    d = tempfile.mkdtemp(prefix="om_r5c_attr_")
    pages = spark.createDataFrame(rows, SCHEMA + ", lang string")
    build_fielded_index(spark, pages, d, ["title", "body"],
                        analyzer="simple", num_shards=2, num_term_buckets=4,
                        block_size=4, store_attrs=["lang"])
    up = spark.createDataFrame(
        [("d9", "bloom filters", "bloom filter joins", "de")],
        SCHEMA + ", lang string",
    )
    upsert_docs_fielded(spark, up, d)
    fx = load_fielded_index(spark, d)
    run = search_dsl_fielded(fx, {
        "q": {"bool": {"should": [{"match": {"body": "bloom"}}],
                       "filter": [{"term": {"lang": "de"}}]}},
    }, k=10)
    assert {r["doc_id"] for r in run.collect()} == {"d9"}
