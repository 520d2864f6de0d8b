"""Facet counts vs a pure-Python tally + null bucketing."""

import pyspark.sql.functions as F
import pytest

from openmatch_spark.operators.facets import facet_counts


def test_facet_counts_reference(spark):
    docs = spark.createDataFrame(
        [
            ("d0", "src0", "en"),
            ("d1", "src0", "de"),
            ("d2", "src1", "en"),
            ("d3", "src1", None),
            ("d4", "src2", "en"),
        ],
        "doc_id string, source string, lang string",
    )
    run = spark.createDataFrame(
        [("q0", "d0"), ("q0", "d1"), ("q0", "d3"), ("q1", "d2"), ("q1", "d4")],
        "query_id string, doc_id string",
    )
    out = {
        (r["query_id"], r["facet"], r["value"]): r["n_docs"]
        for r in facet_counts(run, docs, ["source", "lang"]).collect()
    }
    assert out == {
        ("q0", "source", "src0"): 2,
        ("q0", "source", "src1"): 1,
        ("q0", "lang", "en"): 1,
        ("q0", "lang", "de"): 1,
        ("q0", "lang", "(null)"): 1,
        ("q1", "source", "src1"): 1,
        ("q1", "source", "src2"): 1,
        ("q1", "lang", "en"): 2,
    }
    # per-query totals are consistent across facets (no silent drops)
    for qid, n in [("q0", 3), ("q1", 2)]:
        for facet in ["source", "lang"]:
            assert sum(v for (q, f, _), v in out.items() if q == qid and f == facet) == n


def test_facet_counts_requires_columns(spark):
    docs = spark.createDataFrame([("d0", "s")], "doc_id string, source string")
    run = spark.createDataFrame([("q", "d0")], "query_id string, doc_id string")
    with pytest.raises(ValueError):
        facet_counts(run, docs, [])


def test_rrf_reference(spark):
    from openmatch_spark.operators.fusion import reciprocal_rank_fusion

    r1 = spark.createDataFrame(
        [("q", "a", 1), ("q", "b", 2), ("q", "c", 3)],
        "query_id string, doc_id string, rank int",
    )
    r2 = spark.createDataFrame(
        [("q", "b", 1), ("q", "d", 2), ("q", "a", 3)],
        "query_id string, doc_id string, rank int",
    )
    out = {r["doc_id"]: (r["score"], r["rank"]) for r in
           reciprocal_rank_fusion([r1, r2], k=10, k0=60).collect()}
    expect = {
        "a": 1 / 61 + 1 / 63,
        "b": 1 / 62 + 1 / 61,
        "c": 1 / 63,
        "d": 1 / 62,
    }
    assert set(out) == set(expect)
    for d, s in expect.items():
        assert out[d][0] == pytest.approx(s, rel=1e-15)
    # b > a (1/62+1/61 > 1/61+1/63), then c > d is FALSE: 1/63 < 1/62
    order = [d for d, _ in sorted(out.items(), key=lambda kv: kv[1][1])]
    assert order == ["b", "a", "d", "c"]
    # depth cap drops rank-3 contributions
    capped = {r["doc_id"]: r["score"] for r in
              reciprocal_rank_fusion([r1, r2], k=10, k0=60, depth=2).collect()}
    assert capped["a"] == pytest.approx(1 / 61, rel=1e-15)
    assert "c" not in capped  # rank-3-only doc drops out entirely at depth 2


def test_phrase_positions_scan_is_pruned(spark, tmp_path_factory):
    """The positional sidecar scan must prune like the postings scan:
    bucket partition filters + term row-group pushdown."""
    from openmatch_spark.fixtures import pages_df
    from openmatch_spark.index import build_index, build_positions, load_index
    from openmatch_spark.plans.explain import capture_plan

    d = str(tmp_path_factory.mktemp("facet_pos_idx"))
    pages = pages_df(spark, 200)
    build_index(spark, pages, d, num_shards=2, num_term_buckets=8)
    build_positions(spark, pages, d)
    idx = load_index(spark, d)
    terms = ["term0001", "term0002"]
    buckets = sorted(set(idx.term_buckets(terms).values()))
    pruned = idx.positions.where(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
    )
    plan = capture_plan(pruned)
    assert "PushedFilters:" in plan and "In(term, [term0001,term0002])" in plan
    assert "PartitionFilters:" in plan
