"""Round-5: field-prefixed query strings over the fielded index
(VERDICT r4 item 6): `title:x` scores on that field's sub-index,
`lang:en` / `-lang:de` / `n:[a TO b]` compile to filter context, bare
segments spread best_fields — all by compiling onto the already-verified
fielded DSL, so every expectation here is pinned against a hand-written
search_dsl_fielded query."""

import tempfile

import pytest

from openmatch_spark.query import (
    build_fielded_index,
    load_fielded_index,
    parse_query_string_fielded,
    search_dsl_fielded,
    search_query_string_fielded,
)

ROWS = [
    ("d0", "spark engine overview", "the spark engine builds hash join plans",
     "en", 120),
    ("d1", "merge sort deep dive", "sort merge join beats hash join",
     "de", 80),
    ("d2", "window functions", "rank rows per partition with window functions",
     "en", 200),
    ("d3", "spark windowing", "spark window aggregates and sessionization",
     "fr", 150),
    ("d4", "hash tables", "open addressing and chained hash tables",
     "en", 60),
    ("d5", "spark hash internals", "window merge spark spark", "de", 40),
]
SCHEMA = ("doc_id string, title string, body string, lang string,"
          " n_chars int")


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def fx(spark):
    import os

    import pyspark.sql.functions as F

    from openmatch_spark.index import build_positions

    d = tempfile.mkdtemp(prefix="om_r5d_")
    pages = spark.createDataFrame(ROWS, SCHEMA)
    build_fielded_index(spark, pages, d, ["title", "body"],
                        analyzer="simple", num_shards=2, num_term_buckets=4,
                        block_size=4, store_attrs=["lang", "n_chars"])
    for f in ("title", "body"):  # fielded phrase clauses need sidecars
        sub = pages.select("doc_id", F.col(f).alias("text"))
        build_positions(spark, sub, os.path.join(d, f"field={f}"))
    return load_fielded_index(spark, d)


def _q(spark, *texts):
    return spark.createDataFrame(
        [(f"q{i}", t) for i, t in enumerate(texts)],
        "query_id string, text string",
    )


def test_parse_shapes():
    d = parse_query_string_fielded(
        'title:spark +body:"hash join"~1 -lang:de n_chars:[100 TO 200]'
        " window^2",
        ["title", "body"], ["lang", "n_chars"],
    )
    b = d["bool"]
    assert {"match": {"title": {"query": "spark", "boost": 1.0}}} \
        in b["should"]
    assert {"match_phrase": {"body": {"query": "hash join", "slop": 1,
                                      "boost": 1.0}}} in b["must"]
    assert {"bool": {"filter": [{"term": {"lang": "de"}}]}} \
        in b["must_not"]
    assert {"range": {"n_chars": {"gte": 100, "lte": 200}}} in b["filter"]
    dm = [x for x in b["should"] if "dis_max" in x]
    assert dm and all(
        q["match"][f]["boost"] == 2.0
        for q in dm[0]["dis_max"]["queries"] for f in q["match"]
    )


def test_parse_unknown_prefix_stays_literal():
    d = parse_query_string_fielded(
        "https://x.example/1 title:spark", ["title", "body"], ["lang"]
    )
    texts = {
        q["match"][f]["query"]
        for x in d["bool"]["should"] if "dis_max" in x
        for q in x["dis_max"]["queries"] for f in q["match"]
    }
    assert "https://x.example/1" in texts


def test_parse_refusals():
    with pytest.raises(ValueError, match="grouping"):
        parse_query_string_fielded("(title:a OR b)", ["title"], [])
    with pytest.raises(ValueError, match="attribute field prefix"):
        parse_query_string_fielded("title:[a TO b]", ["title"], [])
    with pytest.raises(ValueError, match="at least one bound"):
        parse_query_string_fielded("n:[* TO *]", ["title"], ["n"])
    with pytest.raises(ValueError, match="empty query string"):
        parse_query_string_fielded("", ["title"], [])


def test_fielded_qs_equals_hand_dsl(spark, fx):
    run = search_query_string_fielded(
        fx, _q(spark, 'title:spark body:"hash join" -lang:fr'), k=10
    )
    want = search_dsl_fielded(fx, {"q0": {"bool": {
        "should": [
            {"match": {"title": {"query": "spark", "boost": 1.0}}},
            {"match_phrase": {"body": {"query": "hash join", "slop": 0,
                                       "boost": 1.0}}},
        ],
        "must_not": [{"bool": {"filter": [{"term": {"lang": "fr"}}]}}],
    }}}, k=10)
    assert _rows(run) == _rows(want)
    docs = {r["doc_id"] for r in run.collect()}
    assert docs and "d3" not in docs  # lang=fr excluded


def test_fielded_qs_range_and_term_filters(spark, fx):
    run = search_query_string_fielded(
        fx, _q(spark, "window n_chars:[100 TO 200] +lang:en"), k=10
    )
    docs = {r["doc_id"] for r in run.collect()}
    assert docs == {"d2"}  # window-ish, 100<=n<=200, en


def test_fielded_qs_bare_best_fields(spark, fx):
    run = search_query_string_fielded(fx, _q(spark, "merge"), k=10)
    want = search_dsl_fielded(fx, {"q0": {"dis_max": {"queries": [
        {"match": {"body": {"query": "merge", "boost": 1.0}}},
        {"match": {"title": {"query": "merge", "boost": 1.0}}},
    ]}}}, k=10)
    assert _rows(run) == _rows(want)
    assert {r["doc_id"] for r in run.collect()} == {"d1", "d5"}


def test_fielded_qs_prefix_fuzzy_wildcard(spark, fx):
    run = search_query_string_fielded(
        fx, _q(spark, "title:wind*", "body:sessionizatio~1",
               "title:w?ndow"), k=10
    )
    got = {(r["query_id"], r["doc_id"]) for r in run.collect()}
    assert ("q0", "d2") in got and ("q0", "d3") in got  # prefix wind*
    assert ("q1", "d3") in got  # fuzzy
    assert ("q2", "d2") in got  # wildcard
    # fuzzy budget clamps to 2 (lenient, like simple_query_string)
    d = parse_query_string_fielded("body:x~9", ["body"], [])
    assert d["bool"]["should"][0]["fuzzy"]["body"]["fuzziness"] == 2
