"""Passage chunking + MaxP/FirstP/SumP aggregation (operators/chunking.py)."""

import pytest

from openmatch_spark.operators import chunk_passages, score_aggregate


def _py_chunks(tokens, size, stride):
    return [
        (i, tokens[s : s + size])
        for i, s in enumerate(range(0, len(tokens), stride))
    ]


def test_chunk_windows_match_python(spark):
    text = " ".join(f"tok{i:02d}" for i in range(10))
    docs = spark.createDataFrame([("d1", text)], "doc_id string, text string")
    got = {
        r["passage_idx"]: (r["passage_id"], r["text"], r["n_tokens"])
        for r in chunk_passages(docs, size=4, stride=3).collect()
    }
    toks = text.split()
    exp = _py_chunks(toks, 4, 3)
    assert len(got) == len(exp) == 4  # starts 0,3,6,9
    for i, chunk in exp:
        pid, ptext, n = got[i]
        assert pid == f"d1#{i}"
        assert ptext == " ".join(chunk)
        assert n == len(chunk)


def test_chunk_short_doc_single_window(spark):
    docs = spark.createDataFrame([("d1", "a b c")], "doc_id string, text string")
    rows = chunk_passages(docs, size=8, stride=4).collect()
    assert len(rows) == 1 and rows[0]["text"] == "a b c" and rows[0]["n_tokens"] == 3


def test_chunk_empty_doc_emits_nothing(spark):
    docs = spark.createDataFrame(
        [("d1", ""), ("d2", None), ("d3", "x")], "doc_id string, text string"
    )
    rows = chunk_passages(docs, size=4, stride=2).collect()
    assert {r["doc_id"] for r in rows} == {"d3"}


def test_chunk_validates_params(spark):
    docs = spark.createDataFrame([("d", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        chunk_passages(docs, size=0)
    with pytest.raises(ValueError):
        chunk_passages(docs, stride=0)


@pytest.fixture()
def passage_run(spark):
    # (query, passage, score): doc A peaks in passage 1, doc B in passage 0
    rows = [
        ("q1", "A#0", 1.0), ("q1", "A#1", 3.0), ("q1", "A#2", 2.0),
        ("q1", "B#0", 2.5), ("q1", "B#1", 0.5),
        ("q2", "B#0", 1.0),
    ]
    return spark.createDataFrame(rows, "query_id string, doc_id string, score double")


def test_maxp(spark, passage_run):
    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in score_aggregate(passage_run, k=10, agg="max").collect()
    }
    assert got == {
        ("q1", "A"): (3.0, 1),
        ("q1", "B"): (2.5, 2),
        ("q2", "B"): (1.0, 1),
    }


def test_sump_and_firstp(spark, passage_run):
    sump = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in score_aggregate(passage_run, k=10, agg="sum").collect()
    }
    assert sump[("q1", "A")] == 6.0 and sump[("q1", "B")] == 3.0
    firstp = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in score_aggregate(passage_run, k=10, agg="first").collect()
    }
    assert firstp == {("q1", "A"): 1.0, ("q1", "B"): 2.5, ("q2", "B"): 1.0}


def test_aggregate_doc_id_with_hash_inside(spark):
    """Only the TRAILING #<digits> is the passage marker; a doc id that
    itself contains '#' survives round-tripping."""
    run = spark.createDataFrame(
        [("q1", "ns#7/doc#3", 2.0), ("q1", "ns#7/doc#4", 1.0)],
        "query_id string, doc_id string, score double",
    )
    rows = score_aggregate(run, k=10, agg="max").collect()
    assert {r["doc_id"] for r in rows} == {"ns#7/doc"}  # both passages of one doc
    assert rows[0]["score"] == 2.0


def test_e2e_maxp_beats_passage_loss(spark):
    """A long doc whose relevant window is in the MIDDLE outranks a doc with
    weak scattered matches only under chunked MaxP — the operator's reason
    to exist."""
    from openmatch_spark.query.bm25_df import bm25_score_adhoc

    filler = " ".join(f"pad{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            ("mid", f"{filler} needle needle haystack needle {filler}"),
            ("scatter", "needle " + " ".join(f"junk{i}" for i in range(80))),
        ],
        "doc_id string, text string",
    )
    passages = chunk_passages(docs, size=8, stride=4)
    q = spark.createDataFrame([("q", "needle haystack")], "query_id string, text string")
    prun = bm25_score_adhoc(
        passages.selectExpr("passage_id as doc_id", "text"), q, k=1_000_000
    )
    doc_run = score_aggregate(prun, k=2, agg="max").collect()
    best = min(doc_run, key=lambda r: r["rank"])
    assert best["doc_id"] == "mid"
