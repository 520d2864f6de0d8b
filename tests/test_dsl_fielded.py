"""Multi-field DSL over the fielded index (query/fielded.py
search_dsl_fielded): every expectation is composed in Python from
single-index DSL runs over the per-field corpora, so per-field
statistics and the doc_id-keyed composition are checked against the
already-verified single-field surfaces."""

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmatch_spark.index import build_index, load_index
from openmatch_spark.query import (
    build_fielded_index,
    load_fielded_index,
    search_dsl,
    search_dsl_fielded,
    search_fielded,
)

ROWS = [
    ("d0", "spark engine overview", "the spark engine builds hash join plans quickly"),
    ("d1", "merge sort deep dive", "sort merge join beats hash join on sorted input"),
    ("d2", "window functions", "rank rows per partition with window functions"),
    ("d3", "spark windowing", "spark window aggregates and sessionization"),
    ("d4", "hash tables", "open addressing and chained hash tables"),
    ("d5", "spark hash internals", "window merge spark spark"),
]
LANGS = {"d0": "en", "d1": "de", "d2": "en", "d3": "fr", "d4": "en",
         "d5": "de"}


@pytest.fixture(scope="module")
def fx(spark):
    pages = spark.createDataFrame(
        [(*r, LANGS[r[0]]) for r in ROWS],
        "doc_id string, title string, body string, lang string",
    )
    d = tempfile.mkdtemp(prefix="om_fdsl_idx_")
    build_fielded_index(spark, pages, d, ["title", "body"], analyzer="simple",
                        num_shards=2, num_term_buckets=4, block_size=4,
                        store_attrs=["lang"])
    return load_fielded_index(spark, d)


@pytest.fixture(scope="module")
def ref(spark):
    """field -> term -> {doc: score} single-index reference runs."""
    out = {}
    for fi, name in ((1, "title"), (2, "body")):
        dd = tempfile.mkdtemp(prefix=f"om_fdsl_{name}_")
        pg = spark.createDataFrame(
            [(r[0], None, None, r[fi], "en") for r in ROWS],
            "url string, warc_ts timestamp, html binary, text string,"
            " lang string",
        )
        build_index(spark, pg, dd, analyzer="simple", num_shards=2,
                    num_term_buckets=4, block_size=4)
        idx = load_index(spark, dd)
        out[name] = {
            t: {
                r["doc_id"]: r["score"]
                for r in search_dsl(
                    idx, {"q": {"match": {"text": t}}}, k=1000
                ).collect()
            }
            for t in ("spark", "hash", "join", "merge", "window", "sort")
        }
    return out


def _run(fx, q, k=1000):
    return {r["doc_id"]: r["score"]
            for r in search_dsl_fielded(fx, {"q": q}, k=k).collect()}


def _close(got, exp):
    assert set(got) == set(exp), (sorted(got), sorted(exp))
    for d in got:
        assert abs(got[d] - exp[d]) < 1e-9, (d, got[d], exp[d])


def test_bool_across_fields(fx, ref):
    got = _run(fx, {"bool": {"should": [
        {"match": {"title": "spark window"}},
        {"match": {"body": "hash join"}},
    ]}})
    t = {d: ref["title"]["spark"].get(d, 0.0) + ref["title"]["window"].get(d, 0.0)
         for d in set(ref["title"]["spark"]) | set(ref["title"]["window"])}
    b = {d: ref["body"]["hash"].get(d, 0.0) + ref["body"]["join"].get(d, 0.0)
         for d in set(ref["body"]["hash"]) | set(ref["body"]["join"])}
    exp = {d: t.get(d, 0.0) + b.get(d, 0.0) for d in set(t) | set(b)}
    _close(got, exp)


def test_dismax_best_fields_shape(fx, ref):
    got = _run(fx, {"dis_max": {"queries": [
        {"match": {"title": "spark"}},
        {"match": {"body": "spark"}},
    ], "tie_breaker": 0.3}})
    t, b = ref["title"]["spark"], ref["body"]["spark"]
    exp = {}
    for d in set(t) | set(b):
        br = [x for x in (t.get(d), b.get(d)) if x is not None]
        exp[d] = max(br) + 0.3 * (sum(br) - max(br))
    _close(got, exp)


def test_must_across_fields_with_nested_group(fx, ref):
    got = _run(fx, {"bool": {"must": [
        {"match": {"title": "spark"}},
        {"bool": {"should": [{"match": {"body": "hash"}},
                             {"match": {"body": "window"}}]}},
    ]}})
    ts, bh, bw = (ref["title"]["spark"], ref["body"]["hash"],
                  ref["body"]["window"])
    exp = {}
    for d in ts:
        if d in bh or d in bw:
            exp[d] = ts[d] + bh.get(d, 0.0) + bw.get(d, 0.0)
    _close(got, exp)


def test_must_not_on_other_field(fx, ref):
    got = _run(fx, {"bool": {
        "should": [{"match": {"title": "hash"}}],
        "must_not": [{"match": {"body": "join"}}],
    }})
    exp = {d: s for d, s in ref["title"]["hash"].items()
           if d not in ref["body"]["join"]}
    _close(got, exp)


def test_same_term_different_fields_distinct_stats(fx, ref):
    """'spark' scores differently per field (own df/avgdl/docCount)."""
    t, b = ref["title"]["spark"], ref["body"]["spark"]
    shared = set(t) & set(b)
    assert shared and any(abs(t[d] - b[d]) > 1e-9 for d in shared)
    got_t = _run(fx, {"match": {"title": "spark"}})
    got_b = _run(fx, {"match": {"body": "spark"}})
    _close(got_t, t)
    _close(got_b, b)


def test_validation(fx):
    with pytest.raises(ValueError, match="unknown field"):
        search_dsl_fielded(fx, {"q": {"match": {"abstract": "x"}}}, k=5)
    with pytest.raises(ValueError, match="no scoring clause"):
        search_dsl_fielded(fx, {"q": {"match_all": {}}}, k=5)
    with pytest.raises(ValueError, match="no scoring clause"):
        search_dsl_fielded(fx, {"q": {"constant_score": {
            "filter": {"term": {"lang": "en"}}}}}, k=5)
    with pytest.raises(ValueError, match="analyzes to"):
        search_dsl_fielded(fx, {"q": {"term": {"title": "two words"}}}, k=5)


def test_filter_context_on_union_docmaps(fx, ref):
    got = _run(fx, {"bool": {
        "should": [{"match": {"title": "spark"}}],
        "filter": [{"term": {"lang": "en"}}],
    }})
    exp = {d: s for d, s in ref["title"]["spark"].items()
           if LANGS[d] == "en"}
    _close(got, exp)


def test_constant_score_must_on_fielded(fx, ref):
    got = _run(fx, {"bool": {
        "should": [{"match": {"body": "hash"}}],
        "must": [{"constant_score": {"filter": {"term": {"lang": "en"}},
                                     "boost": 2.0}}],
    }})
    exp = {d: s + 2.0 for d, s in ref["body"]["hash"].items()
           if LANGS[d] == "en"}
    _close(got, exp)


def test_must_not_filter_rewrite_on_fielded(fx, ref):
    got = _run(fx, {"bool": {
        "should": [{"match": {"body": "join"}}],
        "must_not": [{"bool": {"filter": [{"term": {"lang": "de"}}]}}],
    }})
    exp = {d: s for d, s in ref["body"]["join"].items()
           if LANGS[d] != "de"}
    _close(got, exp)


def test_multi_match_best_fields_rewrite(fx):
    from openmatch_spark.query.fielded import rewrite_multi_match

    got = rewrite_multi_match({"multi_match": {
        "query": "spark hash", "fields": ["title^2", "body"],
        "type": "best_fields", "tie_breaker": 0.3}})
    assert got == {"dis_max": {"queries": [
        {"match": {"title": {"query": "spark hash", "boost": 2.0}}},
        {"match": {"body": {"query": "spark hash", "boost": 1.0}}},
    ], "tie_breaker": 0.3}}
    a = _run(fx, {"multi_match": {"query": "spark hash",
                                  "fields": ["title^2", "body"],
                                  "tie_breaker": 0.3}})
    b = _run(fx, got)
    _close(a, b)
    assert a


def test_multi_match_most_fields_sums(fx):
    a = _run(fx, {"multi_match": {"query": "spark", "fields": ["title", "body"],
                                  "type": "most_fields"}})
    b = _run(fx, {"bool": {"should": [{"match": {"title": "spark"}},
                                      {"match": {"body": "spark"}}]}})
    _close(a, b)
    assert a


def test_multi_match_inside_bool(fx):
    a = _run(fx, {"bool": {
        "must": [{"multi_match": {"query": "spark",
                                  "fields": ["title", "body"]}}],
        "should": [{"match": {"body": "join"}}],
    }})
    b = _run(fx, {"bool": {
        "must": [{"dis_max": {"queries": [{"match": {"title": "spark"}},
                                          {"match": {"body": "spark"}}],
                              "tie_breaker": 0.0}}],
        "should": [{"match": {"body": "join"}}],
    }})
    _close(a, b)
    assert a


def test_multi_match_validation(fx):
    with pytest.raises(ValueError, match="cross_fields"):
        search_dsl_fielded(fx, {"q": {"multi_match": {
            "query": "x", "fields": ["title"], "type": "cross_fields"}}}, k=5)
    with pytest.raises(ValueError, match="non-empty list"):
        search_dsl_fielded(fx, {"q": {"multi_match": {
            "query": "x", "fields": []}}}, k=5)
    with pytest.raises(ValueError, match="unknown field"):
        search_dsl_fielded(fx, {"q": {"multi_match": {
            "query": "x", "fields": ["abstract"]}}}, k=5)


@pytest.fixture(scope="module")
def fx_mixed(spark):
    """title: simple (keeps stopwords); body: english_stop (drops them)."""
    pages = spark.createDataFrame(
        [("m0", "The Spark Engine", "the spark engine and the hash join"),
         ("m1", "A Sort Merge", "sort merge join and the hash join"),
         ("m2", "Window Functions", "the rank of the rows in the window")],
        "doc_id string, title string, body string",
    )
    d = tempfile.mkdtemp(prefix="om_fdsl_mixed_")
    build_fielded_index(
        spark, pages, d, ["title", "body"],
        analyzer={"title": "simple", "body": "english_stop"},
        num_shards=1, num_term_buckets=2, block_size=4,
    )
    return load_fielded_index(spark, d)


def test_per_field_analyzers(fx_mixed):
    assert fx_mixed["title"].stats["analyzer"] == "simple"
    assert fx_mixed["body"].stats["analyzer"] == "english_stop"
    # 'the' is a term under simple, a stopword under english_stop
    t = _run(fx_mixed, {"match": {"title": "the"}})
    b = _run(fx_mixed, {"match": {"body": "the"}})
    assert set(t) == {"m0"} and not b
    got = _run(fx_mixed, {"bool": {"should": [
        {"match": {"title": "the spark"}},
        {"match": {"body": "the hash join"}},
    ]}})
    assert set(got) == {"m0", "m1"}


def test_all_stopword_queries_vanish_not_error(fx_mixed):
    # a leaf, a nested group, and a dis_max that fully analyze away all
    # return EMPTY results (flat-path parity), never raise
    assert _run(fx_mixed, {"match": {"body": "the and of"}}) == {}
    assert _run(fx_mixed, {"bool": {"should": [
        {"bool": {"should": [{"match": {"body": "the and"}}]}},
    ]}}) == {}
    assert _run(fx_mixed, {"dis_max": {"queries": [
        {"match": {"body": "the"}}, {"match": {"body": "and"}},
    ]}}) == {}
    # and a vanished nested group beside a live leaf imposes nothing
    got = _run(fx_mixed, {"bool": {"should": [
        {"bool": {"should": [{"match": {"body": "the and"}}]}},
        {"match": {"body": "hash"}},
    ]}})
    assert set(got) == {"m0", "m1"}


def test_compact_fielded_search_identity(spark):
    """Compacting every sub-index leaves the fielded DSL run identical
    (the single-index compaction contract, looped per field)."""
    from openmatch_spark.query import compact_fielded_index

    # enough docs that both shards of every sub-index commit a segment
    many = [(f"{r[0]}x{i}", r[1], r[2]) for i in range(20) for r in ROWS]
    pages = spark.createDataFrame(
        many, "doc_id string, title string, body string")
    d = tempfile.mkdtemp(prefix="om_fdsl_cpt_")
    build_fielded_index(spark, pages, d, ["title", "body"], analyzer="simple",
                        num_shards=2, num_term_buckets=4, block_size=4)
    fx = load_fielded_index(spark, d)
    q = {"bool": {"should": [{"match": {"title": "spark"}},
                             {"match": {"body": "hash join"}}]}}
    before = sorted(map(tuple, search_dsl_fielded(fx, {"q": q}, k=100).collect()))
    res = compact_fielded_index(spark, d)
    assert set(res) == {"title", "body"}
    # a sub-index that committed a single segment records the no-op;
    # multi-segment ones merge
    assert all(r["merged"] in ([], [0, 1]) for r in res.values())
    assert any(r["merged"] == [0, 1] for r in res.values())
    fx2 = load_fielded_index(spark, d)
    after = sorted(map(tuple, search_dsl_fielded(fx2, {"q": q}, k=100).collect()))
    assert before == after and before
