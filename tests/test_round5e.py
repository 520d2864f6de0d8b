"""Round-5: percolator filter-context rules (VERDICT r4 item 7) — a
stored rule can say "term X AND lang=en": its `filter` column holds
DSL-shape filter leaves evaluated against the DOC's own columns (the doc
frame is the doc-values store in percolation). Expectations are replayed
with plain Python set logic over the fixture docs."""

import json

import pytest

from openmatch_spark.query import percolate


DOCS = [
    ("d0", "spark engine builds plans", "en", 120),
    ("d1", "spark window aggregates", "de", 80),
    ("d2", "hash join beats sort", "en", 200),
    ("d3", "spark hash internals", "fr", 150),
    ("d4", "window functions rank rows", "en", 60),
]
DSCHEMA = "doc_id string, text string, lang string, n_chars int"


def _docs(spark):
    return spark.createDataFrame(DOCS, DSCHEMA)


def _matches(df):
    return sorted((r["doc_id"], r["query_id"]) for r in df.collect())


def test_percolate_term_filter(spark):
    stored = spark.createDataFrame(
        [
            ("r_en", "spark", None, None,
             json.dumps([{"term": {"lang": "en"}}])),
            ("r_any", "spark", None, None, None),
        ],
        "query_id string, must string, should string, must_not string,"
        " filter string",
    )
    got = _matches(percolate(_docs(spark), stored))
    spark_docs = {d for (d, t, _l, _n) in DOCS if "spark" in t.split()}
    want = sorted(
        [(d, "r_any") for d in spark_docs]
        + [(d, "r_en") for d in spark_docs
           if dict((x[0], x[2]) for x in DOCS)[d] == "en"]
    )
    assert got == want
    assert ("d1", "r_en") not in got  # lang=de gated out


def test_percolate_range_and_conjunction(spark):
    stored = spark.createDataFrame(
        [("r", "spark", None, None,
          json.dumps([{"term": {"lang": "en"}},
                      {"range": {"n_chars": {"gte": 100}}}]))],
        "query_id string, must string, should string, must_not string,"
        " filter string",
    )
    got = _matches(percolate(_docs(spark), stored))
    assert got == [("d0", "r")]  # spark AND en AND >=100 chars


def test_percolate_filter_composes_with_phrase_and_roles(spark):
    stored = spark.createDataFrame(
        [
            ("r", None, "window rank", "hash",
             json.dumps([{"terms": {"lang": ["en", "de"]}}]), None),
            ("p", None, None, None,
             json.dumps([{"range": {"n_chars": {"lt": 100}}}]),
             "window functions"),
        ],
        "query_id string, must string, should string, must_not string,"
        " filter string, must_phrase string",
    )
    got = _matches(percolate(_docs(spark), stored))
    # r: should-hit (window|rank), no 'hash', lang in {en,de}
    # p: phrase "window functions" consecutive, n_chars < 100
    assert got == [("d1", "r"), ("d4", "p"), ("d4", "r")]


def test_percolate_filter_errors_loud(spark):
    bad_field = spark.createDataFrame(
        [("r", "spark", None, None,
          json.dumps([{"term": {"nope": "x"}}]))],
        "query_id string, must string, should string, must_not string,"
        " filter string",
    )
    with pytest.raises(ValueError, match="not a stored doc-values column"):
        percolate(_docs(spark), bad_field).collect()
    bad_json = spark.createDataFrame(
        [("r", "spark", None, None, "{not json")],
        "query_id string, must string, should string, must_not string,"
        " filter string",
    )
    with pytest.raises(ValueError, match="JSON array"):
        percolate(_docs(spark), bad_json).collect()


def test_percolate_no_filter_column_unchanged(spark):
    stored = spark.createDataFrame(
        [("r", "spark", None, None)],
        "query_id string, must string, should string, must_not string",
    )
    got = _matches(percolate(_docs(spark), stored))
    assert got == [("d0", "r"), ("d1", "r"), ("d3", "r")]
