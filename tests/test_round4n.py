"""Fielded index: one packed sub-index per field + index-backed
multi_match, pinned row-identical against the ad-hoc dismax/cross_fields
surfaces on a corpus where every doc carries every field."""

import pytest

import pyspark.sql.functions as F

TITLES = [
    "fast table scan",
    "slow query plan",
    "spark join order",
    "hash merge join",
    "table scan cost",
    "query plan cache",
]
BODIES = [
    "the scan reads every row of the table quickly",
    "a slow plan hurts query latency and cost",
    "join order changes spark shuffle volume",
    "merge join beats hash join on sorted input",
    "cost models pick scan strategies for tables",
    "plan caches skip repeated query compilation",
]
QUERIES = [("q1", "table scan"), ("q2", "slow query plan"),
           ("q3", "join order"), ("q4", "zzznothing")]


@pytest.fixture(scope="module")
def fielded(spark, tmp_path_factory):
    from openmatch_spark.query import build_fielded_index, load_fielded_index

    pages = spark.createDataFrame(
        [(str(i), t, b) for i, (t, b) in enumerate(zip(TITLES, BODIES))],
        "doc_id string, title string, body string",
    )
    d = str(tmp_path_factory.mktemp("fielded_idx"))
    build_fielded_index(
        spark, pages, d, ["title", "body"],
        analyzer="simple", num_shards=2, num_term_buckets=4,
    )
    return load_fielded_index(spark, d)


def _adhoc_fields(spark):
    from openmatch_spark.analysis import tokenize_col

    pages = spark.createDataFrame(
        [(str(i), t, b) for i, (t, b) in enumerate(zip(TITLES, BODIES))],
        "doc_id string, title string, body string",
    )
    return pages.select(
        "doc_id",
        tokenize_col(F.col("title"), "simple").alias("title"),
        tokenize_col(F.col("body"), "simple").alias("body"),
    )


def _qdf(spark):
    return spark.createDataFrame(QUERIES, "query_id string, text string")


def _cmp(run_a, run_b):
    a = {(r["query_id"], r["doc_id"]): (r["rank"], r["score"])
         for r in run_a.collect()}
    b = {(r["query_id"], r["doc_id"]): (r["rank"], r["score"])
         for r in run_b.collect()}
    assert set(a) == set(b), (set(a) ^ set(b))
    for key in a:
        assert a[key][0] == b[key][0], (key, a[key], b[key])
        assert abs(a[key][1] - b[key][1]) < 1e-9, (key, a[key], b[key])


def test_best_fields_matches_adhoc(spark, fielded):
    from openmatch_spark.query import search_fielded
    from openmatch_spark.query.dismax import dismax_score_adhoc

    boosts = {"title": 2.0, "body": 1.0}
    idxd = search_fielded(
        fielded, _qdf(spark), match_type="best_fields",
        tie_breaker=0.3, field_boosts=boosts, k=10,
    )
    adhoc = dismax_score_adhoc(
        _adhoc_fields(spark), _qdf(spark), ["title", "body"],
        tie_breaker=0.3, k=10, analyzer="simple", field_boosts=boosts,
    )
    _cmp(idxd, adhoc)


def test_most_fields_is_tie1(spark, fielded):
    from openmatch_spark.query import search_fielded
    from openmatch_spark.query.dismax import dismax_score_adhoc

    idxd = search_fielded(fielded, _qdf(spark), match_type="most_fields")
    adhoc = dismax_score_adhoc(
        _adhoc_fields(spark), _qdf(spark), ["title", "body"],
        tie_breaker=1.0, k=10, analyzer="simple",
    )
    _cmp(idxd, adhoc)


def test_cross_fields_matches_adhoc(spark, fielded):
    from openmatch_spark.query import search_fielded
    from openmatch_spark.query.dismax import cross_fields_score_adhoc

    idxd = search_fielded(
        fielded, _qdf(spark), match_type="cross_fields", tie_breaker=0.15,
    )
    adhoc = cross_fields_score_adhoc(
        _adhoc_fields(spark), _qdf(spark), ["title", "body"],
        tie_breaker=0.15, k=10, analyzer="simple",
    )
    _cmp(idxd, adhoc)


def test_missing_field_doc_scores_from_present_field_only(spark, tmp_path):
    from openmatch_spark.query import (
        build_fielded_index, load_fielded_index, search_fielded,
    )

    pages = spark.createDataFrame(
        [("a", "rare topic", "common words here"),
         ("b", None, "rare topic in the body only")],
        "doc_id string, title string, body string",
    )
    d = str(tmp_path / "fx")
    build_fielded_index(spark, pages, d, ["title", "body"],
                        analyzer="simple", num_shards=1, num_term_buckets=2)
    fam = load_fielded_index(spark, d)
    # title sub-index holds only doc a (Lucene docCount semantics)
    assert fam["title"].docmap.count() == 1
    q = spark.createDataFrame([("q", "rare topic")],
                              "query_id string, text string")
    hits = {r["doc_id"] for r in
            search_fielded(fam, q, match_type="most_fields").collect()}
    assert hits == {"a", "b"}  # b matches via body alone


def test_search_fielded_validation(spark, fielded):
    from openmatch_spark.query import search_fielded

    q = _qdf(spark)
    with pytest.raises(ValueError):
        search_fielded(fielded, q, match_type="bm25f")
    with pytest.raises(ValueError):
        search_fielded(fielded, q, tie_breaker=1.5)
    with pytest.raises(ValueError):
        search_fielded(fielded, q, field_boosts={"title": 0.0})
    with pytest.raises(ValueError):
        search_fielded({}, q)
    # no in-vocabulary term anywhere -> empty frame with the run schema
    oov = spark.createDataFrame([("o", "zzz qqq")],
                                "query_id string, text string")
    out = search_fielded(fielded, oov)
    assert out.count() == 0
    assert out.columns == ["query_id", "doc_id", "score", "rank"]
