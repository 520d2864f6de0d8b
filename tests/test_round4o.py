"""match_bool_prefix (term clauses + constant-score prefix tail) and the
moving_percentiles pipeline aggregation."""

import pytest


@pytest.fixture(scope="module")
def bp_index(spark, tmp_path_factory):
    from openmatch_spark.index import build_index, load_index

    pages = spark.createDataFrame(
        [("d1", "fast table scan"), ("d2", "tab stop here"),
         ("d3", "nothing else"), ("d4", "tab table tabs")],
        "doc_id string, text string",
    )
    d = str(tmp_path_factory.mktemp("bp_idx"))
    build_index(spark, pages, d, analyzer="simple", num_shards=2,
                num_term_buckets=4)
    return load_index(spark, d)


def test_bool_prefix_composes_term_and_prefix_clauses(spark, bp_index):
    from openmatch_spark.query import search, search_bool_prefix

    q = spark.createDataFrame([("q1", "fast tab")],
                              "query_id string, text string")
    out = {r["doc_id"]: (r["score"], r["rank"])
           for r in search_bool_prefix(bp_index, q).collect()}
    # the term clause alone, for reference
    base = {r["doc_id"]: r["score"] for r in search(
        bp_index, spark.createDataFrame([("q1", "fast")],
                                        "query_id string, text string"),
        k=10).collect()}
    # d1 matches 'fast' AND the tab* prefix (via 'table'): BM25 + 1.0
    assert abs(out["d1"][0] - (base["d1"] + 1.0)) < 1e-12
    # d2/d4 match the prefix only: constant 1.0 — and d4, which contains
    # THREE tab* expansions (tab, table, tabs), still gets 1.0 once
    # (Lucene CONSTANT_SCORE rewrite, not per-expansion scoring)
    assert out["d2"][0] == 1.0
    assert out["d4"][0] == 1.0
    assert "d3" not in out
    # ranking: d1 (term+prefix) first, then the constant-score pair by id
    assert out["d1"][1] == 1
    assert out["d2"][1] == 2 and out["d4"][1] == 3


def test_bool_prefix_single_token_and_edges(spark, bp_index):
    from openmatch_spark.query import search_bool_prefix

    one = spark.createDataFrame([("q1", "ta")],
                                "query_id string, text string")
    out = {r["doc_id"]: r["score"]
           for r in search_bool_prefix(bp_index, one).collect()}
    assert out == {"d1": 1.0, "d2": 1.0, "d4": 1.0}
    oov = spark.createDataFrame([("q2", "zzz qqq")],
                                "query_id string, text string")
    assert search_bool_prefix(bp_index, oov).count() == 0
    with pytest.raises(ValueError):
        search_bool_prefix(bp_index, one, prefix_boost=0.0)


def test_moving_percentiles_frames(spark):
    from openmatch_spark.operators.pipeline_aggs import moving_percentiles

    b = spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5])],
        "g string, i int, v double",
    )
    out = {r["i"]: r["p50"] for r in moving_percentiles(
        b, "v", "i", ["g"], window=2, percents=(50.0,)).collect()}
    # shift=0: the two buckets strictly before; empty frame -> NULL
    assert out == {0: None, 1: 1.0, 2: 1.5, 3: 2.5, 4: 3.5}
    sh = {r["i"]: (r["p0"], r["p100"]) for r in moving_percentiles(
        b, "v", "i", ["g"], window=3, percents=(0.0, 100.0), shift=1,
    ).collect()}
    # shift=1 includes the current bucket
    assert sh[0] == (1.0, 1.0)
    assert sh[4] == (3.0, 5.0)
    with pytest.raises(ValueError):
        moving_percentiles(b, "v", "i", ["g"], window=0)
    with pytest.raises(ValueError):
        moving_percentiles(b, "v", "i", ["g"], window=2, percents=())
    with pytest.raises(ValueError):
        moving_percentiles(b, "v", "i", ["g"], window=2, percents=(200.0,))
