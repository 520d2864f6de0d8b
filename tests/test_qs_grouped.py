"""Grouped query_string grammar (parentheses / AND / OR / NOT) compiled
onto the nested-bool DSL executor: parser units assert the exact Lucene
classic addClause occur rules; execution parity is engine-vs-engine
against hand-written DSL trees (the tree executor itself is verified in
test_dsl_nested.py against flat-path leaf runs)."""

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmatch_spark.index import build_index, build_positions, load_index
from openmatch_spark.query import search_dsl, search_query_string
from openmatch_spark.query.querystring import parse_query_string_grouped

DOCS = [
    ("doc://0", "spark hash join beats sort merge join on small tables"),
    ("doc://1", "the hash join and the sort merge join"),
    ("doc://2", "spark spark spark hash hash join"),
    ("doc://3", "merge sort is not sort merge"),
    ("doc://4", "join hash spark"),
    ("doc://5", "window functions rank rows per partition"),
    ("doc://6", "spark window merge"),
]


@pytest.fixture(scope="module")
def idx(spark):
    pages = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in DOCS],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    d = tempfile.mkdtemp(prefix="om_qsg_idx_")
    build_index(spark, pages, d, analyzer="simple", num_shards=2,
                num_term_buckets=4, block_size=4)
    build_positions(spark, pages, d)
    return load_index(spark, d)


def _m(t, b=1.0):
    return {"match": {"text": {"query": t, "boost": b}}}


def test_parse_group_and():
    d = parse_query_string_grouped("(spark OR join) AND customer")
    assert d == {"bool": {"must": [
        {"bool": {"should": [_m("spark"), _m("join")]}},
        _m("customer"),
    ]}}


def test_parse_lucene_promote():
    # the classic parser's non-boolean quirk: a AND b OR c -> +a +b c
    d = parse_query_string_grouped("a AND b OR c")
    assert d == {"bool": {"must": [_m("a"), _m("b")],
                          "should": [_m("c")]}}


def test_parse_and_mode_demote():
    # default AND, OR demotes the preceding clause (even explicit '+')
    d = parse_query_string_grouped("+a OR b", "and")
    assert d == {"bool": {"should": [_m("a"), _m("b")]}}


def test_parse_not_group_and_boost():
    d = parse_query_string_grouped("hash AND NOT (merge OR scan) (a b)^2")
    assert d["bool"]["must"] == [_m("hash")]
    assert d["bool"]["must_not"] == [
        {"bool": {"should": [_m("merge"), _m("scan")]}}]
    assert d["bool"]["should"] == [
        {"bool": {"should": [_m("a", 2.0), _m("b", 2.0)]}}]


def test_parse_leaf_kinds_in_groups():
    d = parse_query_string_grouped('("hash join"~2 OR merg~1) !scan*')
    g = d["bool"]["should"][0]["bool"]["should"]
    assert g == [
        {"match_phrase": {"text": {"query": "hash join", "slop": 2,
                                   "boost": 1.0}}},
        {"fuzzy": {"text": {"value": "merg", "fuzziness": 1, "boost": 1.0}}},
    ]
    assert d["bool"]["must_not"] == [
        {"prefix": {"text": {"value": "scan", "boost": 1.0}}}]


def test_parse_nested_depth():
    d = parse_query_string_grouped("((a OR b) AND c) OR d")
    inner = d["bool"]["should"][0]
    assert inner["bool"]["must"] == [
        {"bool": {"should": [_m("a"), _m("b")]}}, _m("c")]
    assert d["bool"]["should"][1] == _m("d")


def test_parse_validation():
    for bad in ["(a b", "a) b", "()", "a ^2"]:
        with pytest.raises(ValueError):
            parse_query_string_grouped(bad)


def _runs(idx, spark, text, dsl, k=100):
    q = spark.createDataFrame([("g", text)], "query_id string, text string")
    got = sorted(
        (r["doc_id"], round(r["score"], 9), r["rank"])
        for r in search_query_string(idx, q, k=k).collect()
    )
    exp = sorted(
        (r["doc_id"], round(r["score"], 9), r["rank"])
        for r in search_dsl(idx, {"g": dsl}, k=k).collect()
    )
    return got, exp


def test_exec_parity_group_must(idx, spark):
    got, exp = _runs(
        idx, spark, "(spark OR merge) AND hash",
        {"bool": {"must": [
            {"bool": {"should": [_m("spark"), _m("merge")]}},
            _m("hash"),
        ]}},
    )
    assert got == exp and got


def test_exec_parity_not_group(idx, spark):
    got, exp = _runs(
        idx, spark, "hash AND NOT (merge OR window)",
        {"bool": {"must": [_m("hash")],
                  "must_not": [{"bool": {"should": [_m("merge"),
                                                    _m("window")]}}]}},
    )
    assert got == exp and got


def test_exec_parity_boosted_group(idx, spark):
    got, exp = _runs(
        idx, spark, "(spark join)^2 window",
        {"bool": {"should": [
            {"bool": {"should": [_m("spark", 2.0), _m("join", 2.0)]}},
            _m("window"),
        ]}},
    )
    assert got == exp and got


def test_mixed_batch_keeps_flat_path(idx, spark):
    """A batch mixing grouped and plain queries: the plain one must be
    byte-identical to a plain-only run (it stays on the legacy path)."""
    q2 = spark.createDataFrame(
        [("g", "(spark OR merge) AND hash"), ("p", "hash join")],
        "query_id string, text string",
    )
    both = search_query_string(idx, q2, k=100).collect()
    plain_only = search_query_string(
        idx,
        spark.createDataFrame([("p", "hash join")],
                              "query_id string, text string"),
        k=100,
    ).collect()
    p = sorted(map(tuple, (r for r in both if r["query_id"] == "p")))
    assert p == sorted(map(tuple, plain_only)) and p


def test_msm_refused_with_groups(idx, spark):
    q = spark.createDataFrame([("g", "(a OR b) c")],
                              "query_id string, text string")
    with pytest.raises(ValueError, match="min_should_match"):
        search_query_string(idx, q, k=5, min_should_match=1)
