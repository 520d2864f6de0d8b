"""TREC I/O roundtrip, mining semantics vs dict reference, metrics goldens."""

import pytest

from openmatch_spark.operators.metrics import (
    accuracy_at_k,
    duplicate_docs,
    mrr_at_k,
    ndcg_at_k,
    recall_at_k,
)
from openmatch_spark.operators.mining import (
    add_ground_truth,
    build_hard_negatives,
    combine_negatives,
    depth_cut,
    mined_groups,
)
from openmatch_spark.operators.runio import load_from_trec, save_as_trec, with_rank

RUN_ROWS = [
    # qid, docid, score
    ("q1", "d1", 9.0),
    ("q1", "d2", 7.5),
    ("q1", "d3", 7.5),  # tie -> doc_id asc
    ("q1", "d4", 1.0),
    ("q2", "d9", 3.0),
    ("q2", "d1", 2.0),
]
QRELS_ROWS = [("q1", "d2", 1), ("q1", "d9", 2), ("q2", "d1", 1), ("q3", "d5", 1)]


@pytest.fixture()
def run(spark):
    return spark.createDataFrame(RUN_ROWS, "query_id string, doc_id string, score double")


@pytest.fixture()
def qrels(spark):
    return spark.createDataFrame(QRELS_ROWS, "query_id string, doc_id string, rel int")


def test_rank_tiebreak(run):
    r = {(x["query_id"], x["doc_id"]): x["rank"] for x in with_rank(run).collect()}
    assert r[("q1", "d1")] == 1 and r[("q1", "d2")] == 2 and r[("q1", "d3")] == 3


def test_trec_roundtrip(spark, run, tmp_path):
    p = str(tmp_path / "run.trec")
    save_as_trec(run, p, run_id="t")
    back = load_from_trec(spark, p)
    orig = sorted((r["query_id"], r["doc_id"], r["rank"]) for r in with_rank(run).collect())
    got = sorted((r["query_id"], r["doc_id"], r["rank"]) for r in back.collect())
    assert got == orig


def test_depth_cut(run):
    assert depth_cut(run, 2).count() == 4


def test_hard_negatives_exclude_positives(run, qrels):
    neg = build_hard_negatives(run, qrels, depth=200, n_sample=30)
    pairs = {(r["query_id"], r["doc_id"]) for r in neg.collect()}
    assert ("q1", "d2") not in pairs  # qrels positive excluded
    assert ("q2", "d1") not in pairs
    assert ("q1", "d1") in pairs and ("q2", "d9") in pairs


def test_hard_negatives_sample_deterministic(run, qrels):
    a = sorted(map(tuple, build_hard_negatives(run, qrels, n_sample=2).collect()))
    b = sorted(map(tuple, build_hard_negatives(run, qrels, n_sample=2).collect()))
    assert a == b
    per_q = {}
    for q, d, r in a:
        per_q.setdefault(q, 0)
        per_q[q] += 1
    assert all(v <= 2 for v in per_q.values())


def test_add_ground_truth(run, qrels):
    merged = add_ground_truth(run, qrels)
    rows = {(r["query_id"], r["doc_id"]): (r["score"], r["rank"]) for r in merged.collect()}
    # d2 and d9 both pinned to 1000.0 -> tie-break doc_id asc: d2=1, d9=2
    assert rows[("q1", "d9")][0] == 1000.0 and rows[("q1", "d9")][1] == 2
    assert rows[("q1", "d2")][0] == 1000.0  # keep-max dedupe
    assert rows[("q3", "d5")][0] == 1000.0  # qrels-only query appears


def test_combine_negatives(spark):
    g1 = spark.createDataFrame(
        [("q1", ["p1"], ["n1", "n2"]), ("q9", ["p9"], ["n9"])],
        "query_id string, positives array<string>, negatives array<string>",
    )
    g2 = spark.createDataFrame(
        [("q1", ["p1b"], ["m1"]), ("q2", ["p2"], ["m2"])],
        "query_id string, positives array<string>, negatives array<string>",
    )
    out = {r["query_id"]: (r["positives"], r["negatives"]) for r in combine_negatives(g1, g2).collect()}
    assert out["q1"] == (["p1b"], ["m1", "n1", "n2"])  # folder-2 kept, 1 appended
    assert out["q2"] == (["p2"], ["m2"])
    assert "q9" not in out  # outer-keep of folder 2 only


def test_mined_groups(run, qrels):
    neg = build_hard_negatives(run, qrels, n_sample=30)
    groups = {r["query_id"]: r for r in mined_groups(neg, qrels).collect()}
    assert groups["q1"]["positives"] == ["d2", "d9"]
    assert set(groups["q1"]["negatives"]) == {"d1", "d3", "d4"}


class TestMetrics:
    def test_mrr(self, run, qrels):
        # q1: first relevant d2 at rank 2 -> 0.5; q2: d1 rank 2 -> 0.5; q3: 0
        row = mrr_at_k(run, qrels, 10).collect()[0]
        assert row["mrr"] == pytest.approx((0.5 + 0.5 + 0.0) / 3)
        assert row["n_queries"] == 3

    def test_mrr_cutoff(self, run, qrels):
        row = mrr_at_k(run, qrels, 1).collect()[0]
        assert row["mrr"] == pytest.approx(0.0)

    def test_recall(self, run, qrels):
        # q1 finds d2 of {d2,d9} -> .5 ; q2 finds d1 -> 1 ; q3 -> 0
        row = recall_at_k(run, qrels, 100).collect()[0]
        assert row["recall"] == pytest.approx((0.5 + 1.0 + 0.0) / 3)

    def test_ndcg_hand_computed(self, run, qrels):
        import math

        # q1: d2(rel1)@2 -> dcg = 1/log2(3); ideal: rel2@1, rel1@2 -> 3 + 1/log2(3)
        dcg1 = 1 / math.log2(3)
        idcg1 = 3 / math.log2(2) + 1 / math.log2(3)
        # q2: d1(rel1)@2 -> dcg = 1/log2(3); ideal 1
        dcg2 = 1 / math.log2(3)
        expected = (dcg1 / idcg1 + dcg2 / 1.0 + 0.0) / 3
        row = ndcg_at_k(run, qrels, 10).collect()[0]
        assert row["ndcg"] == pytest.approx(expected)

    def test_duplicates(self, spark):
        r = spark.createDataFrame(
            [("q1", "d1", 1.0), ("q1", "d1", 0.5)],
            "query_id string, doc_id string, score double",
        )
        assert duplicate_docs(r).collect()[0]["n"] == 2

    def test_accuracy_at_k(self, spark, run):
        corpus = spark.createDataFrame(
            [("d1", "nothing here"), ("d2", "the answer is Paris actually"),
             ("d3", "x"), ("d4", "y"), ("d9", "z"), ],
            "doc_id string, text string",
        )
        answers = spark.createDataFrame(
            [("q1", ["paris"]), ("q2", ["tokyo"])],
            "query_id string, answers array<string>",
        )
        rows = {r["k"]: r["accuracy"] for r in accuracy_at_k(run, corpus, answers, ks=[1, 5]).collect()}
        assert rows[1] == pytest.approx(0.0)  # d2 is rank 2 for q1
        assert rows[5] == pytest.approx(0.5)  # q1 hits, q2 never

    def test_accuracy_at_k_simple_mode_matches_dpr(self, spark, run):
        corpus = spark.createDataFrame(
            [("d1", "nothing here"), ("d2", "the answer is Paris actually"),
             ("d3", "x"), ("d4", "y"), ("d9", "z")],
            "doc_id string, text string",
        )
        answers = spark.createDataFrame(
            [("q1", ["paris"]), ("q2", ["tokyo"])],
            "query_id string, answers array<string>",
        )
        dpr = {r["k"]: r["accuracy"] for r in accuracy_at_k(
            run, corpus, answers, ks=[1, 5]).collect()}
        simple = {r["k"]: r["accuracy"] for r in accuracy_at_k(
            run, corpus, answers, ks=[1, 5], match_mode="simple").collect()}
        assert dpr == simple

    def test_accuracy_at_k_regex_mode(self, spark, run):
        corpus = spark.createDataFrame(
            [("d1", "nothing here"), ("d2", "the answer is Paris, actually"),
             ("d3", "x"), ("d4", "y"), ("d9", "z")],
            "doc_id string, text string",
        )
        answers = spark.createDataFrame(
            [("q1", [r"par.s,"]), ("q2", ["(unclosed"])],  # bad regex -> no match
            "query_id string, answers array<string>",
        )
        rows = {r["k"]: r["accuracy"] for r in accuracy_at_k(
            run, corpus, answers, ks=[5], match_mode="regex").collect()}
        assert rows[5] == pytest.approx(0.5)  # q1 regex hits d2; q2 pattern invalid
