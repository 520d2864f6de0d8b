"""ES combined_fields (Lucene CombinedFieldQuery) semantics, isolated from
the oracle entry: one-field w=1 degenerates to plain per-field BM25; the
Lucene w >= 1 contract is enforced; weighting a field raises both its tf
contribution AND its share of the combined length norm (the "one big
field" semantic that distinguishes it from BM25F)."""

import pytest

from openmatch_spark.query import bm25f_score_adhoc, combined_fields_score_adhoc


def _fields(spark):
    rows = [
        ("d1", ["apple", "pie"], ["apple", "tart", "recipe", "apple"]),
        ("d2", ["banana", "bread"], ["banana", "banana", "loaf"]),
        ("d3", ["apple", "banana"], ["fruit", "salad", "mix", "apple"]),
        ("d4", ["cherry"], ["cherry", "jam", "toast", "cherry", "jam"]),
    ]
    return spark.createDataFrame(
        rows, "doc_id string, title array<string>, body array<string>"
    )


def _queries(spark):
    return spark.createDataFrame(
        [("q1", "apple"), ("q2", "banana bread"), ("q3", "cherry jam")],
        "query_id string, text string",
    )


def test_weight_contract(spark):
    with pytest.raises(ValueError):
        combined_fields_score_adhoc(
            _fields(spark), _queries(spark), {"title": 0.5, "body": 1.0}
        )


def test_single_field_unit_weight_is_plain_bm25(spark):
    """With one field at w=1 the pseudo-field IS that field, so the score
    must equal BM25F restricted to the same field with b_f = b (BM25F with
    one field and w=1 reduces to ordinary BM25 too)."""
    fields = _fields(spark).select("doc_id", "body")
    cf = combined_fields_score_adhoc(
        fields, _queries(spark), {"body": 1.0}, k=10, round_to=6
    )
    bf = bm25f_score_adhoc(
        fields, _queries(spark), {"body": (1.0, 0.75)}, k=10, round_to=6,
    )
    got = {(r["query_id"], r["doc_id"]): (r["score"], r["rank"]) for r in cf.collect()}
    want = {(r["query_id"], r["doc_id"]): (r["score"], r["rank"]) for r in bf.collect()}
    assert got == want and got


def test_title_weight_lifts_title_hits(spark):
    """q1=apple: d1 has a title hit + 2 body hits, d3 a title hit + 1 body
    hit. Raising the title weight must not hurt title-hitting docs'
    relative order, and the weighted run still ranks d1 (most combined
    occurrences) first."""
    fields = _fields(spark)
    r = combined_fields_score_adhoc(
        fields, _queries(spark), {"title": 3.0, "body": 1.0}, k=10
    )
    q1 = {x["doc_id"]: x["rank"] for x in r.where("query_id = 'q1'").collect()}
    assert q1["d1"] == 1
    assert set(q1) == {"d1", "d3"}


def test_length_norm_is_combined(spark):
    """The combined length must be Sum_f w_f * len_f: with title w=2, d2's
    combined length is 2*2 + 3 = 7. We verify indirectly: two docs with
    identical weighted tf for a term but different combined lengths must
    score differently (shorter wins)."""
    rows = [
        ("a", ["x"], ["x"]),            # tfw(x) = 2*1 + 1 = 3, len = 2*1+1 = 3
        ("b", ["x"], ["x", "pad", "pad", "pad"]),  # tfw = 3, len = 2+4 = 6
    ]
    fields = spark.createDataFrame(
        rows, "doc_id string, title array<string>, body array<string>"
    )
    qs = spark.createDataFrame([("q", "x")], "query_id string, text string")
    out = combined_fields_score_adhoc(fields, qs, {"title": 2.0, "body": 1.0})
    sc = {r["doc_id"]: r["score"] for r in out.collect()}
    assert sc["a"] > sc["b"]
