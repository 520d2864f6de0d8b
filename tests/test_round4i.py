"""Round-4i: judged-pool metrics — bpref, R-precision, judged@k
(trec_eval m_bpref / Rprec / judged conventions)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmatch_spark.operators.metrics import (
    bpref,
    bpref_per_query,
    judged_at_k,
    r_precision,
)


@pytest.fixture(scope="module")
def run(spark):
    # q1: ranked c, a, b, x(unjudged), d, e ; q2: ranked f only
    return spark.createDataFrame(
        [
            ("q1", "c", 6.0, 1),
            ("q1", "a", 5.0, 2),
            ("q1", "b", 4.0, 3),
            ("q1", "x", 3.0, 4),
            ("q1", "d", 2.0, 5),
            ("q1", "e", 1.0, 6),
            ("q2", "f", 9.0, 1),
        ],
        "query_id string, doc_id string, score double, rank int",
    )


@pytest.fixture(scope="module")
def qrels(spark):
    # q1: rel a=1 b=2 e=1 (R=3), explicit nonrel c=0 d=0 (N=2)
    # q2: rel f=1 (R=1, N=0 -> the min(N,R)=0 guard path)
    return spark.createDataFrame(
        [
            ("q1", "a", 1),
            ("q1", "b", 2),
            ("q1", "c", 0),
            ("q1", "d", 0),
            ("q1", "e", 1),
            ("q2", "f", 1),
        ],
        "query_id string, doc_id string, rel int",
    )


def test_bpref_hand_math(spark, run, qrels):
    per_q = {r.query_id: r.bpref for r in bpref_per_query(run, qrels).collect()}
    # q1: a has 1 nonrel above (c) -> 1 - 1/min(2,3) = 0.5; b same;
    #     e has 2 above (c,d) -> 1 - 2/2 = 0.  (0.5+0.5+0)/R=3
    assert per_q["q1"] == pytest.approx(round(1.0 / 3, 6), abs=1e-9)
    # q2: N=0 -> guard contribution 1.0, R=1
    assert per_q["q2"] == 1.0
    agg = bpref(run, qrels).collect()[0]
    assert agg["n_queries"] == 2
    assert agg["bpref"] == pytest.approx((round(1 / 3, 6) + 1.0) / 2, abs=1e-9)


def test_bpref_depth_cut_and_validation(spark, run, qrels):
    # k=2 keeps only ranks 1-2: q1 retrieves just a (0.5 contribution)
    per_q = {r.query_id: r.bpref for r in bpref_per_query(run, qrels, k=2).collect()}
    assert per_q["q1"] == pytest.approx(round(0.5 / 3, 6), abs=1e-9)
    with pytest.raises(ValueError, match="k must"):
        bpref_per_query(run, qrels, k=0)


def test_bpref_skips_zero_relevant_queries(spark, run):
    # a query judged ONLY nonrelevant (R=0) is excluded, trec_eval-style
    qrels = spark.createDataFrame(
        [("q1", "a", 1), ("q2", "f", 0)],
        "query_id string, doc_id string, rel int",
    )
    rows = bpref_per_query(run, qrels).collect()
    assert {r.query_id for r in rows} == {"q1"}


def test_r_precision_hand_math(spark, run, qrels):
    # q1: R=3, top-3 = c,a,b -> 2 relevant -> 2/3; q2: R=1, top-1 = f -> 1
    got = r_precision(run, qrels).collect()[0]
    assert got["n_queries"] == 2
    assert got["rprec"] == pytest.approx((2 / 3 + 1.0) / 2, abs=1e-9)


def test_judged_at_k(spark, run, qrels):
    # k=5: q1 top-5 c,a,b,x,d -> 4 judged -> 0.8; q2 has 1 retrieved, judged -> 0.2
    got = judged_at_k(run, qrels, k=5).collect()[0]
    assert got["n_queries"] == 2
    assert got["judged"] == pytest.approx((0.8 + 0.2) / 2, abs=1e-9)
    with pytest.raises(ValueError, match="k must"):
        judged_at_k(run, qrels, k=0)


def test_judged_at_k_query_missing_from_run(spark, qrels):
    # universe is qrels' queries: q2 absent from the run scores 0
    run = spark.createDataFrame(
        [("q1", "a", 1.0, 1)], "query_id string, doc_id string, score double, rank int"
    )
    got = judged_at_k(run, qrels, k=1).collect()[0]
    assert got["n_queries"] == 2
    assert got["judged"] == pytest.approx(0.5, abs=1e-9)
