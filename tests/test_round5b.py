"""Round-5: distributed query-batch compilation (VERDICT r4 item 4).

The DSL / query_string / expansion surfaces used to collect + parse +
tokenize every query batch driver-side unconditionally; they now honor
the engine-wide _DISTRIBUTED_TOKENIZE_MIN_QUERIES like the plain path:
above the threshold, parse+tokenize fans out to executors and only
compact compiled rows (query_string) or a distinct-text token memo
(DSL/fielded) return to the driver. These tests pin bit-identity
between the driver path and the distributed path (threshold=0 forces
distribution at test batch sizes), plus the error-propagation contract.
"""

import json
import tempfile

import pytest

from openmatch_spark.fixtures import (
    PAGES_SCHEMA,
    QUERIES_SCHEMA,
    gen_pages_rows,
)
from openmatch_spark.index import build_index, build_positions, load_index
from openmatch_spark.query import (
    build_fielded_index,
    load_fielded_index,
    search_dsl,
    search_dsl_fielded,
    search_fuzzy,
    search_query_string,
)
from openmatch_spark.query.dsl import _distributed_tok_cache, _leaf_texts
from openmatch_spark.query.expand import _query_tokens


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("r5b") / "idx")
    pages = spark.createDataFrame(gen_pages_rows(200), PAGES_SCHEMA)
    build_index(spark, pages, d, analyzer="simple", num_shards=4,
                num_term_buckets=4, store_attrs=["lang"])
    build_positions(spark, pages, d)  # match_phrase leaves need the sidecar
    return load_index(spark, d)


def _q(spark, pairs):
    return spark.createDataFrame(pairs, QUERIES_SCHEMA)


def test_query_string_distributed_identity(spark, idx):
    qs = _q(spark, [
        ("q0", "term0001 term0003"),
        ("q1", "+term0002 -term0040 term0010^2"),
        ("q2", "term000*"),
        ("q3", "term0001~1"),
        ("q4", "(term0001 OR term0003) AND term0002"),  # grouped path
        ("q5", "term0005 NOT term0001"),
    ])
    driver = search_query_string(idx, qs, k=20)
    dist = search_query_string(idx, qs, k=20, distributed_threshold=0)
    assert _rows(driver) == _rows(dist)
    assert _rows(dist)  # non-empty


def test_query_string_distributed_error_propagates(spark, idx):
    qs = _q(spark, [("q0", "(term0001 AND term0002")])  # unbalanced
    with pytest.raises(ValueError, match="unbalanced"):
        search_query_string(idx, qs, k=5, distributed_threshold=0)


DSLS = {
    "f0": {"match": {"text": "term0001 term0003"}},
    "f1": {"bool": {"should": [{"match": {"text": "term0002"}}],
                    "filter": [{"term": {"lang": "en"}}]}},
    "n0": {"bool": {"must": [
        {"bool": {"should": [{"match": {"text": "term0001"}},
                             {"fuzzy": {"text": "term0003"}}]}},
    ], "must_not": [{"term": {"text": "term0040"}}]}},
    "d0": {"dis_max": {"queries": [
        {"match": {"text": "term0001"}},
        {"match_phrase": {"text": {"query": "term0002 term0005",
                                   "slop": 2}}},
    ], "tie_breaker": 0.3}},
}


def test_dsl_distributed_identity(spark, idx):
    qdf = spark.createDataFrame(
        [(q, json.dumps(d)) for q, d in sorted(DSLS.items())],
        "query_id string, dsl string",
    )
    driver = search_dsl(idx, {q: d for q, d in DSLS.items()}, k=20)
    dist = search_dsl(idx, qdf, k=20, distributed_threshold=0)
    assert _rows(driver) == _rows(dist)
    assert _rows(dist)


def test_dsl_distributed_atomicity_error(spark, idx):
    qdf = spark.createDataFrame(
        [("q", json.dumps({"term": {"text": "term0001 term0002"}}))],
        "query_id string, dsl string",
    )
    with pytest.raises(ValueError, match="analyzes to 2 tokens"):
        search_dsl(idx, qdf, k=5, distributed_threshold=0)


def test_tok_cache_contents_and_walker(spark, idx):
    qdf = spark.createDataFrame(
        [(q, json.dumps(d)) for q, d in sorted(DSLS.items())],
        "query_id string, dsl string",
    )
    parsed, cache = _distributed_tok_cache(
        qdf, {"text": "simple"}, distributed_threshold=0
    )
    assert set(parsed) == set(DSLS)
    # every tokenize-bound leaf text of every query is pre-warmed
    want = {
        ("simple", t) for d in DSLS.values() for (_f, t) in _leaf_texts(d)
    }
    assert want <= set(cache)
    assert cache[("simple", "term0001 term0003")] == ("term0001", "term0003")
    # walker skips filter context but descends bool/dis_max
    texts = {t for (_f, t) in _leaf_texts(DSLS["n0"])}
    assert texts == {"term0001", "term0003", "term0040"}
    assert not [t for (_f, t) in _leaf_texts(DSLS["f1"]) if t == "en"]
    # multi_match pre-warm (fielded rewrite target), boost suffix stripped
    mm = {"multi_match": {"query": "a b", "fields": ["title^2", "body"]}}
    assert set(_leaf_texts(mm)) == {("title", "a b"), ("body", "a b")}
    # small batch: driver path, no cache, zero extra jobs
    parsed2, cache2 = _distributed_tok_cache(qdf, {"text": "simple"})
    assert cache2 is None and set(parsed2) == set(DSLS)


FROWS = [
    ("d0", "spark engine overview", "the spark engine builds hash plans"),
    ("d1", "merge sort deep dive", "sort merge join beats hash join"),
    ("d2", "window functions", "rank rows per partition with windows"),
    ("d3", "spark windowing", "spark window aggregates and sessions"),
]


def test_fielded_distributed_identity(spark, tmp_path_factory):
    pages = spark.createDataFrame(
        FROWS, "doc_id string, title string, body string"
    )
    d = tempfile.mkdtemp(prefix="om_r5b_fielded_")
    build_fielded_index(spark, pages, d, ["title", "body"],
                        analyzer="simple", num_shards=2, num_term_buckets=4,
                        block_size=4)
    findex = load_fielded_index(spark, d)
    qs = {
        "q0": {"bool": {"should": [
            {"match": {"title": "spark window"}},
            {"match": {"body": "hash join"}},
        ]}},
        "q1": {"dis_max": {"queries": [
            {"match": {"title": "merge sort"}},
            {"match": {"body": "merge sort"}},
        ], "tie_breaker": 0.5}},
        "q2": {"multi_match": {"query": "spark window",
                               "fields": ["title", "body"]}},
    }
    qdf = spark.createDataFrame(
        [(q, json.dumps(v)) for q, v in sorted(qs.items())],
        "query_id string, dsl string",
    )
    driver = search_dsl_fielded(findex, qs, k=10)
    dist = search_dsl_fielded(findex, qdf, k=10, distributed_threshold=0)
    assert _rows(driver) == _rows(dist)
    assert _rows(dist)


def test_query_tokens_distributed_identity(spark, idx):
    qs = _q(spark, [("q0", "term0001 notinvocabzz term0001"),
                    ("q1", "term0040 term0002")])
    drv = _query_tokens(idx, qs, distributed_threshold=10_000)
    dst = _query_tokens(idx, qs, distributed_threshold=0)
    assert drv == dst
    assert ("q0", "term0001", 2.0) in drv
    assert ("q0", "notinvocabzz", 1.0) in drv  # no vocab filter
    # and the fuzzy surface lands on identical runs either way
    run = search_fuzzy(idx, _q(spark, [("f", "term0001")]), k=10)
    assert _rows(run)


def test_pattern_tokens_distributed_identity(spark, idx):
    from openmatch_spark.query import search_regexp, search_wildcard
    from openmatch_spark.query.expand import _regexp_tokens, _wildcard_tokens

    qs = _q(spark, [("q0", "term000* ter?0001"), ("q1", "term00[12]. x*")])
    for fn in (_wildcard_tokens, _regexp_tokens):
        drv = fn(idx, qs, distributed_threshold=10_000)
        dst = fn(idx, qs, distributed_threshold=0)
        assert drv == dst and drv
    # run-level identity through the search surfaces
    for search_fn, text in ((search_wildcard, "term000*"),
                            (search_regexp, "term00[^3].")):
        q1 = _q(spark, [("w", text)])
        a = _rows(search_fn(idx, q1, k=15))
        assert a  # non-empty either way; tokens fn shared by both paths
    # validation errors survive the distributed path
    bad = _q(spark, [("b", "^anchored")])
    with pytest.raises(ValueError, match="class negation"):
        _regexp_tokens(idx, bad, distributed_threshold=0)
