"""ES bool.filter context on the Query-DSL front door (query/dsl.py):
attribute predicates from the doc-values store gate the candidate set
before the top-k cut, never touching scores or corpus statistics;
filter-only bools are the match_all-in-filter shape (score 0.0, page =
first k docs by doc_id)."""

import pytest

import pyspark.sql.functions as F

from openmatch_spark.fixtures import PAGES_SCHEMA, QUERIES_SCHEMA, gen_pages_rows
from openmatch_spark.index import build_index, load_index
from openmatch_spark.query import compile_dsl, search_dsl, search_filtered
from openmatch_spark.query.dsl import _filter_sql


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def pages_rows():
    return gen_pages_rows(300)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory, pages_rows):
    d = str(tmp_path_factory.mktemp("dslfilter") / "idx")
    pages = spark.createDataFrame(pages_rows, PAGES_SCHEMA).withColumn(
        "n_chars", F.length("text").cast("int")
    )
    build_index(
        spark, pages, d, analyzer="simple", num_shards=4,
        num_term_buckets=4, store_attrs=["lang", "n_chars"],
    )
    return load_index(spark, d)


Q1 = "term0001 term0003"
Q2 = "term0002 term0010 term0040"


def _should(text, filters):
    return {"bool": {"should": [{"match": {"text": text}}],
                     "filter": filters}}


def test_term_filter_parity_with_search_filtered(spark, idx):
    """bool.should + term filter == the kernel path's where= route: same
    candidates, same scores (both gate candidates, neither touches
    statistics)."""
    dsl = {"q1": _should(Q1, [{"term": {"lang": "en"}}]),
           "q2": _should(Q2, [{"term": {"lang": "en"}}])}
    got = search_dsl(idx, dsl, k=10)
    queries = spark.createDataFrame(
        [("q1", Q1), ("q2", Q2)], QUERIES_SCHEMA
    )
    want = search_filtered(idx, queries, where="lang = 'en'", k=10)
    assert _rows(got) == _rows(want)
    assert _rows(got)


def test_filter_keeps_unfiltered_scores(spark, idx):
    """Lucene filter-context contract: a surviving doc's score is
    bit-identical to its unfiltered score."""
    unf = {r["doc_id"]: r["score"] for r in search_dsl(
        idx, {"q1": {"match": {"text": Q1}}}, k=300
    ).collect()}
    flt = search_dsl(
        idx, {"q1": _should(Q1, [{"term": {"lang": "de"}}])}, k=300
    ).collect()
    assert flt
    for r in flt:
        assert r["score"] == unf[r["doc_id"]]


def test_per_query_filters_stay_per_query(spark, idx):
    """Two queries with different predicates in ONE batch each equal
    their own single-query run."""
    batch = search_dsl(idx, {
        "a": _should(Q1, [{"term": {"lang": "en"}}]),
        "b": _should(Q1, [{"term": {"lang": "de"}}]),
    }, k=10)
    solo_a = search_dsl(idx, {"a": _should(Q1, [{"term": {"lang": "en"}}])}, k=10)
    solo_b = search_dsl(idx, {"b": _should(Q1, [{"term": {"lang": "de"}}])}, k=10)
    assert _rows(batch) == sorted(_rows(solo_a) + _rows(solo_b))
    langs = {r["doc_id"]: r["lang"]
             for r in idx.stored_attributes().collect()}
    for qid, _rk, doc, _s in _rows(batch):
        assert langs[doc] == ("en" if qid == "a" else "de")


def test_range_terms_exists_filters(spark, idx, pages_rows):
    """range/terms/exists compile to the documented predicates; results
    match an allowed_docs run computed independently from the raw rows."""
    lo, hi = 120, 600
    dsl = {"q": _should(Q2, [
        {"range": {"n_chars": {"gte": lo, "lt": hi}}},
        {"terms": {"lang": ["en", "de"]}},
        {"exists": {"field": "lang"}},
    ])}
    got = search_dsl(idx, dsl, k=10)
    allowed = spark.createDataFrame(
        [(u,) for (u, _ts, _h, t, lang) in pages_rows
         if lo <= len(t) < hi and lang in ("en", "de")],
        "doc_id string",
    )
    queries = spark.createDataFrame([("q", Q2)], QUERIES_SCHEMA)
    want = search_filtered(idx, queries, allowed, k=10)
    assert _rows(got) == _rows(want)
    assert _rows(got)


def test_ids_filter(spark, idx, pages_rows):
    hits = search_dsl(idx, {"q": {"match": {"text": Q1}}}, k=20).collect()
    ids = sorted(r["doc_id"] for r in hits)[:5]
    got = search_dsl(
        idx, {"q": _should(Q1, [{"ids": {"values": ids}}])}, k=20
    )
    got_ids = sorted(r["doc_id"] for r in got.collect())
    assert got_ids == ids
    by_doc = {r["doc_id"]: r["score"] for r in hits}
    for r in got.collect():
        assert r["score"] == by_doc[r["doc_id"]]


def test_filter_only_bool_is_match_all_filtered(spark, idx, pages_rows):
    """No scoring clause: every passing doc scores 0.0, page = first k
    docs by doc_id ascending."""
    k = 7
    got = search_dsl(
        idx, {"q": {"bool": {"filter": [{"term": {"lang": "en"}}]}}}, k=k
    ).collect()
    want = sorted(u for (u, _ts, _h, _t, lang) in pages_rows
                  if lang == "en")[:k]
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == want
    assert all(r["score"] == 0.0 for r in got)


def test_filter_only_plus_scoring_batch(spark, idx):
    """A filter-only query and a scoring query coexist in one batch."""
    got = search_dsl(idx, {
        "z": {"bool": {"filter": [{"term": {"lang": "de"}}]}},
        "s": {"match": {"text": Q1}},
    }, k=5)
    rows = got.collect()
    assert {r["query_id"] for r in rows} == {"z", "s"}
    assert all(r["score"] == 0.0 for r in rows if r["query_id"] == "z")
    assert any(r["score"] > 0.0 for r in rows if r["query_id"] == "s")


def test_compile_and_sql_normalization():
    cs, msm, flt = compile_dsl({"bool": {
        "must": [{"match": {"text": "spark"}}],
        "filter": [{"terms": {"lang": ["de", "en", "de"]}},
                   {"range": {"n": {"lt": 5, "gte": 1}}},
                   {"ids": {"values": ["b", "a", "b"]}}],
    }})
    assert len(cs) == 1 and msm == 0 and len(flt) == 3
    stored = ("lang", "n")
    assert _filter_sql(flt[0], stored) == "`lang` IN ('de', 'en')"
    assert _filter_sql(flt[1], stored) == "`n` >= 1 AND `n` < 5"
    assert _filter_sql(flt[2], stored) == "doc_id IN ('a', 'b')"
    # deterministic text is the batch-dedup key: order never matters
    cs2, _m, flt2 = compile_dsl({"bool": {
        "must": [{"match": {"text": "spark"}}],
        "filter": [{"terms": {"lang": ["en", "de"]}}],
    }})
    assert _filter_sql(flt2[0], stored) == _filter_sql(flt[0], stored)


def test_filter_validation(spark, idx, tmp_path_factory):
    with pytest.raises(ValueError, match="unsupported filter leaf"):
        compile_dsl({"bool": {"filter": [{"match": {"text": "x"}}]}})
    with pytest.raises(ValueError, match="range filter"):
        compile_dsl({"bool": {"filter": [{"range": {"n": {"between": 1}}}]}})
    with pytest.raises(ValueError, match="ids filter"):
        compile_dsl({"bool": {"filter": [{"ids": {"values": []}}]}})
    with pytest.raises(ValueError, match="no clauses"):
        compile_dsl({"bool": {}})
    # attribute leaves are filter-context only
    with pytest.raises(ValueError, match="unsupported query type"):
        compile_dsl({"bool": {"must_not": [{"range": {"n": {"lt": 5}}}]}})
    # unstored field fails loudly at execution
    with pytest.raises(ValueError, match="not a stored doc-values column"):
        search_dsl(idx, {"q": _should(Q1, [{"term": {"missing": 1}}])})
    # an index without store_attrs refuses attribute filters, allows ids
    d = str(tmp_path_factory.mktemp("noattrs") / "idx")
    pages = spark.createDataFrame(gen_pages_rows(60), PAGES_SCHEMA)
    build_index(spark, pages, d, analyzer="simple", num_shards=2,
                num_term_buckets=2)
    bare = load_index(spark, d)
    with pytest.raises(ValueError, match="without store_attrs"):
        search_dsl(bare, {"q": _should(Q1, [{"term": {"lang": "en"}}])})
    hits = search_dsl(bare, {"q": {"match": {"text": Q1}}}, k=5).collect()
    if hits:
        ids = [hits[0]["doc_id"]]
        got = search_dsl(
            bare, {"q": _should(Q1, [{"ids": {"values": ids}}])}, k=5
        ).collect()
        assert [r["doc_id"] for r in got] == ids
