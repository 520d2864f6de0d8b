"""ES Query-DSL front door (query/dsl.py): compilation units + execution
parity against the verified query_string / expand / regexp surfaces on the
same tiny positional corpus test_querystring.py uses."""

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmatch_spark.index import build_index, build_positions, load_index
from openmatch_spark.query import (
    compile_dsl,
    search,
    search_dsl,
    search_query_string,
    search_regexp,
)

DOCS = [
    ("doc://0", "spark hash join beats sort merge join on small tables"),
    ("doc://1", "the hash join and the sort merge join"),
    ("doc://2", "spark spark spark hash hash join"),
    ("doc://3", "merge sort is not sort merge"),
    ("doc://4", "join hash spark"),
    ("doc://5", "window functions rank rows per partition"),
    ("doc://6", ""),
]


@pytest.fixture(scope="module")
def idx(spark):
    pages = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in DOCS],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    d = tempfile.mkdtemp(prefix="om_dsl_idx_")
    build_index(
        spark, pages, d, analyzer="simple", num_shards=2,
        num_term_buckets=4, block_size=4,
    )
    build_positions(spark, pages, d)
    return load_index(spark, d)


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.collect()
    )


def _qs(spark, text):
    return spark.createDataFrame([("q", text)], "query_id string, text string")


def test_compile_units():
    cs, msm, flt = compile_dsl({"match": {"text": "hash join"}})
    assert [(c.role, c.kind, c.text) for c in cs] == [("should", "term", "hash join")]
    cs, msm, flt = compile_dsl({"bool": {
        "must": [{"match": {"text": "spark"}}],
        "should": [{"fuzzy": {"text": {"value": "joim", "fuzziness": 1}}}],
        "must_not": [{"term": {"text": "window"}}],
        "minimum_should_match": 1,
    }})
    assert msm == 1
    assert [(c.role, c.kind) for c in cs] == [
        ("must", "term"), ("should", "fuzzy"), ("must_not", "term")
    ]
    assert cs[1].edits == 1


@pytest.mark.parametrize("dsl,qstring", [
    ({"match": {"text": "hash join"}}, "hash join"),
    ({"match": {"text": {"query": "hash join", "operator": "and"}}},
     "+hash +join"),
    ({"bool": {"must": [{"match": {"text": "spark"}}],
               "should": [{"match": {"text": "merge"}}],
               "must_not": [{"term": {"text": "window"}}]}},
     "+spark merge -window"),
    ({"match_phrase": {"text": "sort merge join"}}, '"sort merge join"'),
    ({"match_phrase": {"text": {"query": "hash join", "slop": 2}}},
     '"hash join"~2'),
    ({"prefix": {"text": "jo"}}, "jo*"),
    ({"wildcard": {"text": "s?rt"}}, "s?rt"),
    ({"fuzzy": {"text": {"value": "joim", "fuzziness": 1}}}, "joim~1"),
    ({"bool": {"should": [{"match": {"text": {"query": "spark",
                                              "boost": 2.0}}}]}},
     "spark^2"),
])
def test_dsl_matches_query_string(spark, idx, dsl, qstring):
    got = _rows(search_dsl(idx, {"q": dsl}, k=10))
    want = _rows(search_query_string(idx, _qs(spark, qstring), k=10))
    assert got == want and got


def test_dsl_plain_match_equals_search(spark, idx):
    got = _rows(search_dsl(idx, {"q": {"match": {"text": "hash join"}}}, k=10))
    want = _rows(search(idx, _qs(spark, "hash join"), k=10))
    assert got == want and got


def test_dsl_regexp_parity(spark, idx):
    got = _rows(search_dsl(idx, {"q": {"regexp": {"text": "jo.n|merge"}}}, k=10))
    want = _rows(search_regexp(idx, _qs(spark, "jo.n|merge"), k=10))
    assert got == want and got


def test_dsl_per_query_msm(spark, idx):
    shoulds = [{"match": {"text": "spark"}}, {"match": {"text": "merge"}},
               {"match": {"text": "window"}}]
    loose = {"bool": {"should": shoulds, "minimum_should_match": 1}}
    tight = {"bool": {"should": shoulds, "minimum_should_match": 2}}
    out = search_dsl(idx, {"q1": loose, "q2": tight}, k=10).collect()
    d1 = {r["doc_id"] for r in out if r["query_id"] == "q1"}
    d2 = {r["doc_id"] for r in out if r["query_id"] == "q2"}
    assert d2 < d1  # tighter quota strictly shrinks the hit set
    # only doc0 carries two of {spark, merge, window}
    assert d2 == {"doc://0"}
    assert d1 == {"doc://0", "doc://1", "doc://2", "doc://3", "doc://4",
                  "doc://5"}


def test_dsl_json_dataframe_input(spark, idx):
    import json

    q = {"match": {"text": "hash join"}}
    df = spark.createDataFrame(
        [("q", json.dumps(q))], "query_id string, dsl string"
    )
    assert _rows(search_dsl(idx, df, k=10)) == _rows(
        search_dsl(idx, {"q": q}, k=10)
    )


def test_dsl_validation(spark, idx):
    with pytest.raises(ValueError, match="unknown field"):
        search_dsl(idx, {"q": {"match": {"title": "x"}}})
    # nested bool is supported now (test_dsl_nested.py); an EMPTY nested
    # bool still fails loudly
    with pytest.raises(ValueError, match="no clauses"):
        search_dsl(idx, {"q": {"bool": {"must": [{"bool": {}}]}}})
    with pytest.raises(ValueError, match="analyzes to 2 tokens"):
        search_dsl(idx, {"q": {"term": {"text": "hash join"}}})
    with pytest.raises(ValueError, match="unsupported query type"):
        search_dsl(idx, {"q": {"knn": {"text": "x"}}})
    with pytest.raises(ValueError, match="operator='and' inside"):
        search_dsl(idx, {"q": {"bool": {"should": [
            {"match": {"text": {"query": "a b", "operator": "and"}}}
        ]}}})
    with pytest.raises(ValueError, match="invalid regexp"):
        search_dsl(idx, {"q": {"regexp": {"text": "jo(n"}}})


def test_resolve_msm_forms():
    from openmatch_spark.query.dsl import resolve_msm

    assert resolve_msm(2, 5) == 2
    assert resolve_msm(-2, 5) == 3          # two may be missing
    assert resolve_msm("75%", 4) == 3       # floor(3.0)
    assert resolve_msm("75%", 5) == 3       # floor(3.75)
    assert resolve_msm("-25%", 4) == 3      # 4 - floor(1.0)
    assert resolve_msm("-30%", 5) == 4      # 5 - floor(1.5)
    assert resolve_msm(-9, 5) == 0          # floored at 0
    assert resolve_msm(9, 5) == 9           # unsatisfiable, kept as-is


def test_dsl_percentage_msm_matches_integer(spark, idx):
    shoulds = [{"match": {"text": "spark"}}, {"match": {"text": "merge"}},
               {"match": {"text": "window"}}, {"match": {"text": "hash"}}]
    pct = {"bool": {"should": shoulds, "minimum_should_match": "50%"}}
    fixed = {"bool": {"should": shoulds, "minimum_should_match": 2}}
    a = _rows(search_dsl(idx, {"q": pct}, k=10))
    b = _rows(search_dsl(idx, {"q": fixed}, k=10))
    assert a == b and a
    # quota above the should count matches nothing (Lucene rule)
    over = {"bool": {"should": shoulds, "minimum_should_match": 9}}
    assert not search_dsl(idx, {"q": over}, k=10).collect()


def test_dsl_msm_validation(spark, idx):
    with pytest.raises(ValueError, match="minimum_should_match"):
        compile_dsl({"bool": {"should": [{"match": {"text": "x"}}],
                              "minimum_should_match": "3<90%"}})
