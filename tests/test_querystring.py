"""query_string surface: parser units + execution parity against the
already-verified boolean/phrase/prefix/fuzzy/wildcard surfaces, plus
hand-computed mixed-clause cases on a tiny positional corpus."""

import os
import re
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmatch_spark.index import build_index, build_positions, load_index
from openmatch_spark.query import (
    parse_query_string,
    search_boolean,
    search_fuzzy,
    search_phrase,
    search_prefix,
    search_proximity,
    search_query_string,
    search_wildcard,
)
from openmatch_spark.query.querystring import Clause

DOCS = [
    ("doc://0", "spark hash join beats sort merge join on small tables"),
    ("doc://1", "the hash join and the sort merge join"),
    ("doc://2", "spark spark spark hash hash join"),
    ("doc://3", "merge sort is not sort merge"),
    ("doc://4", "join hash spark"),
    ("doc://5", "window functions rank rows per partition"),
    ("doc://6", ""),
]


def _tok(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


CORPUS = {u: _tok(t) for u, t in DOCS}


@pytest.fixture(scope="module")
def qs_index(spark):
    pages = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in DOCS],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    d = tempfile.mkdtemp(prefix="om_qs_idx_")
    build_index(
        spark, pages, d, analyzer="simple", num_shards=2,
        num_term_buckets=4, block_size=4,
    )
    build_positions(spark, pages, d)
    return load_index(spark, d)


def _q(spark, *texts):
    return spark.createDataFrame(
        [(f"q{i}", t) for i, t in enumerate(texts)], "query_id string, text string"
    )


def _rows(df):
    return sorted(
        (r["query_id"], r["doc_id"], round(r["score"], 9), r["rank"])
        for r in df.collect()
    )


# ------------------------------------------------------------------ parser

def test_parse_roles_and_kinds():
    cs = parse_query_string('+spark hash -window "sort merge"~2 jo?n pre* fuzz~1')
    assert cs[0] == Clause("must", "term", "spark")
    assert cs[1] == Clause("should", "term", "hash")
    assert cs[2] == Clause("must_not", "term", "window")
    assert cs[3].kind == "phrase" and cs[3].slop == 2 and cs[3].text == "sort merge"
    assert cs[4] == Clause("should", "wildcard", "jo?n")
    assert cs[5] == Clause("should", "prefix", "pre")
    assert cs[6].kind == "fuzzy" and cs[6].edits == 1


def test_parse_default_operator_and_boost():
    cs = parse_query_string("spark join^2.5", default_operator="and")
    assert all(c.role == "must" for c in cs)
    assert cs[1].boost == 2.5
    # boost on a phrase, default fuzzy edits, empty/garbage segments
    cs = parse_query_string('"a b"^3 x~ + - ""')
    assert cs[0].kind == "phrase" and cs[0].boost == 3.0
    assert cs[1].kind == "fuzzy" and cs[1].edits == 2
    assert len(cs) == 2
    with pytest.raises(ValueError, match="default_operator"):
        parse_query_string("x", default_operator="xor")
    with pytest.raises(ValueError, match="boost"):
        parse_query_string("x^0")


def test_parse_is_pure_text():
    assert parse_query_string("") == []
    assert parse_query_string(None) == []
    # stray quote tolerated as a term
    cs = parse_query_string('"unbalanced')
    assert cs == [Clause("should", "term", "unbalanced")]


# ----------------------------------------------------------------- parity

def test_parity_boolean(spark, qs_index):
    got = search_query_string(
        qs_index, _q(spark, "+spark +join -window"), k=10
    )
    bq = spark.createDataFrame(
        [("q0", "spark join", None, "window")],
        "query_id string, must string, should string, must_not string",
    )
    want = search_boolean(qs_index, bq, k=10)
    assert _rows(got) == _rows(want)


def test_parity_should_only_vs_boolean(spark, qs_index):
    got = search_query_string(qs_index, _q(spark, "hash merge"), k=10)
    bq = spark.createDataFrame(
        [("q0", None, "hash merge", None)],
        "query_id string, must string, should string, must_not string",
    )
    want = search_boolean(qs_index, bq, k=10)
    assert _rows(got) == _rows(want)


def test_parity_phrase(spark, qs_index):
    got = search_query_string(qs_index, _q(spark, '"sort merge join"'), k=10)
    want = search_phrase(
        qs_index,
        spark.createDataFrame([("q0", "sort merge join")], "query_id string, text string"),
        k=10,
    ).drop("phrase_freq")
    assert _rows(got) == _rows(want)


def test_parity_sloppy_phrase_vs_proximity(spark, qs_index):
    # slop S == unordered min-cover window <= n_tokens + S over distinct terms
    got = search_query_string(qs_index, _q(spark, '"merge hash"~3'), k=10)
    want = search_proximity(
        qs_index,
        spark.createDataFrame([("q0", "merge hash")], "query_id string, text string"),
        within=5,  # 2 tokens + slop 3
        k=10,
    ).drop("min_cover")
    assert _rows(got) == _rows(want)


def test_parity_prefix(spark, qs_index):
    got = search_query_string(qs_index, _q(spark, "jo*"), k=10)
    want = search_prefix(
        qs_index,
        spark.createDataFrame([("q0", "jo")], "query_id string, text string"),
        k=10,
    )
    assert _rows(got) == _rows(want)


def test_parity_wildcard(spark, qs_index):
    got = search_query_string(qs_index, _q(spark, "j??n"), k=10)
    want = search_wildcard(
        qs_index,
        spark.createDataFrame([("q0", "j??n")], "query_id string, text string"),
        k=10,
    )
    assert _rows(got) == _rows(want)


def test_parity_fuzzy(spark, qs_index):
    got = search_query_string(qs_index, _q(spark, "spakr~1"), k=10)
    want = search_fuzzy(
        qs_index,
        spark.createDataFrame([("q0", "spakr")], "query_id string, text string"),
        k=10, max_edits=1,
    )
    assert _rows(got) == _rows(want)


# ------------------------------------------------------------- composition

def test_must_phrase_restricts_and_scores(spark, qs_index):
    # docs containing "sort merge" consecutively: doc0, doc1, doc3
    got = search_query_string(qs_index, _q(spark, '+"sort merge" hash'), k=10)
    rows = got.collect()
    ids = {r["doc_id"] for r in rows}
    assert ids == {"doc://0", "doc://1", "doc://3"}
    # the should clause adds exactly the hash contribution on top of the
    # phrase-only score: strictly more for hash docs, identical for doc3
    by_doc = {r["doc_id"]: r["score"] for r in rows}
    base = {
        r["doc_id"]: r["score"]
        for r in search_query_string(qs_index, _q(spark, '+"sort merge"'), k=10).collect()
    }
    assert by_doc["doc://0"] > base["doc://0"]
    assert by_doc["doc://1"] > base["doc://1"]
    assert by_doc["doc://3"] == pytest.approx(base["doc://3"], rel=1e-12)


def test_boost_reweights(spark, qs_index):
    # unboosted: doc2 (spark x3) vs doc5 (window); boosting window^4 must
    # lift the window doc above every spark doc
    got = {r["doc_id"]: r["score"]
           for r in search_query_string(qs_index, _q(spark, "spark window^4"), k=10).collect()}
    base = {r["doc_id"]: r["score"]
            for r in search_query_string(qs_index, _q(spark, "spark window"), k=10).collect()}
    assert got["doc://5"] == pytest.approx(base["doc://5"] * 4.0, rel=1e-12)
    assert got["doc://2"] == pytest.approx(base["doc://2"], rel=1e-12)


def test_oov_must_kills_and_not_only_is_empty(spark, qs_index):
    assert search_query_string(qs_index, _q(spark, "+zzzz spark")).count() == 0
    assert search_query_string(qs_index, _q(spark, "-spark")).count() == 0
    # OOV should clause just drops
    got = search_query_string(qs_index, _q(spark, "zzzz spark"), k=10)
    assert got.count() > 0


def test_min_should_match(spark, qs_index):
    # msm=2 over three should clauses: docs with >= 2 of {spark, hash, merge}
    got = search_query_string(
        qs_index, _q(spark, "spark hash merge"), k=10, min_should_match=2
    )
    ids = {r["doc_id"] for r in got.collect()}
    want = {
        u for u, toks in CORPUS.items()
        if len({"spark", "hash", "merge"} & set(toks)) >= 2
    }
    assert ids == want


def test_must_not_phrase(spark, qs_index):
    # exclude docs containing the consecutive phrase "sort merge"
    got = search_query_string(qs_index, _q(spark, 'join -"sort merge"'), k=10)
    ids = {r["doc_id"] for r in got.collect()}
    assert ids == {"doc://2", "doc://4"}  # join docs minus doc0/doc1


def test_multi_token_segment_splits(spark, qs_index):
    # a segment that analyzes to two tokens = two clauses with the role
    got = search_query_string(qs_index, _q(spark, "+hash-join"), k=10)
    bq = spark.createDataFrame(
        [("q0", "hash join", None, None)],
        "query_id string, must string, should string, must_not string",
    )
    want = search_boolean(qs_index, bq, k=10)
    assert _rows(got) == _rows(want)


def test_and_default_operator(spark, qs_index):
    got = search_query_string(
        qs_index, _q(spark, "spark join"), default_operator="and", k=10
    )
    ids = {r["doc_id"] for r in got.collect()}
    want = {u for u, toks in CORPUS.items() if {"spark", "join"} <= set(toks)}
    assert ids == want


def test_batch_of_mixed_queries(spark, qs_index):
    qdf = spark.createDataFrame(
        [("a", "+spark join"), ("b", '"merge sort"'), ("c", "-spark"), ("d", "wind*")],
        "query_id string, text string",
    )
    got = search_query_string(qs_index, qdf, k=10)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert "c" not in by_q
    assert by_q["b"] == {"doc://3"}
    assert by_q["d"] == {"doc://5"}
    assert all({"spark"} <= set(CORPUS[d]) for d in by_q["a"])
