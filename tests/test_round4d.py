"""Round-4d surfaces: minimum_should_match (query/boolean.py), dis-max
multi-field scoring (query/dismax.py), Jelinek-Mercer QLD
(query/bm25_df.py), range/histogram facets (operators/facets.py),
int8-quantized dense retrieval (query/quantize.py), and the
"english" minimal-stemming analyzer (analysis.py)."""

import math

import numpy as np
import pytest

import pyspark.sql.functions as F

from openmatch_spark.analysis import (
    stem_english_minimal_col,
    stem_english_minimal_py,
    tokenize_col,
    tokenize_py,
)
from openmatch_spark.fixtures import PAGES_SCHEMA, QUERIES_SCHEMA
from openmatch_spark.index import build_index, load_index
from openmatch_spark.query.boolean import search_boolean
from openmatch_spark.query.bm25_df import qld_jm_score_adhoc
from openmatch_spark.query.dismax import dismax_score_adhoc
from openmatch_spark.query.quantize import (
    quantization_error,
    quantize_embeddings,
    quantized_topk,
)
from openmatch_spark.operators.facets import histogram_facets, range_facets
from openmatch_spark.query.dense import brute_force_topk


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------------- min_should_match

MSM_DOCS = [
    # doc, text (one token each of the listed words)
    ("https://d/1", "alpha beta gamma delta"),
    ("https://d/2", "alpha beta filler words"),
    ("https://d/3", "alpha filler words here"),
    ("https://d/4", "beta gamma filler words"),
]


@pytest.fixture(scope="module")
def msm_idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("msm") / "idx")
    rows = [(u, None, b"", t, "en") for u, t in MSM_DOCS]
    build_index(
        spark, spark.createDataFrame(rows, PAGES_SCHEMA), d,
        analyzer="simple", num_shards=1, num_term_buckets=2,
    )
    return load_index(spark, d)


BOOL_SCHEMA = "query_id string, must string, should string, must_not string"


def _bool_hits(idx, spark, must, should, msm, threshold=None):
    q = spark.createDataFrame([("q", must, should, None)], BOOL_SCHEMA)
    kw = {} if threshold is None else {"distributed_threshold": threshold}
    return sorted(
        r["doc_id"]
        for r in search_boolean(
            idx, q, k=10, min_should_match=msm, **kw
        ).collect()
    )


def test_msm_quota_filters(spark, msm_idx):
    # must=alpha, should=beta gamma: msm=0 -> docs 1,2,3; msm=1 -> 1,2;
    # msm=2 -> only doc 1 (matches both should terms)
    assert _bool_hits(msm_idx, spark, "alpha", "beta gamma", 0) == [
        "https://d/1", "https://d/2", "https://d/3"]
    assert _bool_hits(msm_idx, spark, "alpha", "beta gamma", 1) == [
        "https://d/1", "https://d/2"]
    assert _bool_hits(msm_idx, spark, "alpha", "beta gamma", 2) == [
        "https://d/1"]


def test_msm_unsatisfiable_quota_returns_empty(spark, msm_idx):
    # only one should term exists; msm=2 can never be met
    assert _bool_hits(msm_idx, spark, "alpha", "beta", 2) == []
    # OOV should term can't help satisfy the quota
    assert _bool_hits(msm_idx, spark, "alpha", "beta zzzoov", 2) == []


def test_msm_pure_should_query(spark, msm_idx):
    # no must: msm=2 keeps docs matching >= 2 of the three should terms
    assert _bool_hits(msm_idx, spark, None, "alpha beta gamma", 2) == [
        "https://d/1", "https://d/2", "https://d/4"]


def test_msm_dual_role_term_counts_as_must(spark, msm_idx):
    # beta is must AND should -> merges into must, doesn't fill the quota:
    # with should="beta gamma" and msm=1, gamma must match
    assert _bool_hits(msm_idx, spark, "beta", "beta gamma", 1) == [
        "https://d/1", "https://d/4"]


def test_msm_distributed_branch_identical(spark, msm_idx):
    for msm in (0, 1, 2):
        a = _bool_hits(msm_idx, spark, "alpha", "beta gamma", msm)
        b = _bool_hits(msm_idx, spark, "alpha", "beta gamma", msm, threshold=0)
        assert a == b, msm


# ----------------------------------------------------------------- dismax

DM_DOCS = [
    # (doc_id, title tokens, body tokens)
    ("d1", "apple pie", "a long body about other fruit entirely banana"),
    ("d2", "banana bread", "apple apple apple apple filler filler filler"),
    ("d3", "unrelated title", "apple mentioned once in a longer body text"),
]
FIELDS_SCHEMA = "doc_id string, title array<string>, body array<string>"


@pytest.fixture(scope="module")
def dm_fields(spark):
    rows = [(d, t.split(), b.split()) for d, t, b in DM_DOCS]
    return spark.createDataFrame(rows, FIELDS_SCHEMA)


def _dismax_py(query_terms, tie, k1=0.9, b=0.4):
    """Pure-python dis-max reference over DM_DOCS."""
    fields = {"title": 1, "body": 2}
    toks = {d: {"title": t.split(), "body": bd.split()} for d, t, bd in DM_DOCS}
    n = len(DM_DOCS)
    avg = {f: sum(len(toks[d][f]) for d in toks) / n for f in fields}
    out = {}
    for d in toks:
        score = 0.0
        for term in query_terms:
            per_field = []
            for f in fields:
                tf = toks[d][f].count(term)
                if tf == 0:
                    continue
                df = sum(1 for dd in toks if term in toks[dd][f])
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                norm = k1 * (1 - b + b * len(toks[d][f]) / avg[f])
                per_field.append(idf * tf / (tf + norm))
            if per_field:
                score += max(per_field) + tie * (sum(per_field) - max(per_field))
        if score > 0:
            out[d] = score
    return out


@pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
def test_dismax_matches_python_reference(spark, dm_fields, tie):
    qs = spark.createDataFrame([("q", "apple banana")], QUERIES_SCHEMA)
    got = {
        r["doc_id"]: r["score"]
        for r in dismax_score_adhoc(
            dm_fields, qs, ["title", "body"], tie_breaker=tie, k=10
        ).collect()
    }
    want = _dismax_py(["apple", "banana"], tie)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12), (d, tie)


def test_dismax_best_field_wins_at_zero_tiebreak(spark, dm_fields):
    # tie=0: d2's four body apples saturate; d1's single TITLE apple in a
    # 2-token field gets a much better length norm -> d1 must outrank d3
    qs = spark.createDataFrame([("q", "apple")], QUERIES_SCHEMA)
    run = dismax_score_adhoc(dm_fields, qs, ["title", "body"], 0.0, k=10)
    order = [r["doc_id"] for r in run.orderBy("rank").collect()]
    assert order[0] == "d1"


def test_dismax_rejects_bad_tiebreaker(spark, dm_fields):
    qs = spark.createDataFrame([("q", "apple")], QUERIES_SCHEMA)
    with pytest.raises(ValueError, match="tie_breaker"):
        dismax_score_adhoc(dm_fields, qs, ["title", "body"], 1.5)


# ----------------------------------------------------------- cross_fields


def _cross_fields_py(query_terms, tie, boosts=None, k1=0.9, b=0.4):
    """Pure-python cross_fields reference over DM_DOCS: same per-field
    tf/length-norm as dis-max but ONE blended idf per term (max df across
    the fields — Lucene BlendedTermQuery)."""
    boosts = boosts or {}
    fields = ["title", "body"]
    toks = {d: {"title": t.split(), "body": bd.split()} for d, t, bd in DM_DOCS}
    n = len(DM_DOCS)
    avg = {f: sum(len(toks[d][f]) for d in toks) / n for f in fields}
    out = {}
    for d in toks:
        score = 0.0
        for term in query_terms:
            df = max(
                sum(1 for dd in toks if term in toks[dd][f]) for f in fields
            )
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5)) if df else 0.0
            per_field = []
            for f in fields:
                tf = toks[d][f].count(term)
                if tf == 0:
                    continue
                norm = k1 * (1 - b + b * len(toks[d][f]) / avg[f])
                per_field.append(
                    boosts.get(f, 1.0) * idf * tf / (tf + norm))
            if per_field:
                score += max(per_field) + tie * (sum(per_field) - max(per_field))
        if score > 0:
            out[d] = score
    return out


@pytest.mark.parametrize("tie", [0.0, 0.3])
def test_cross_fields_matches_python_reference(spark, dm_fields, tie):
    from openmatch_spark.query.dismax import cross_fields_score_adhoc

    qs = spark.createDataFrame([("q", "apple banana")], QUERIES_SCHEMA)
    boosts = {"title": 2.0, "body": 1.0}
    got = {
        r["doc_id"]: r["score"]
        for r in cross_fields_score_adhoc(
            dm_fields, qs, ["title", "body"], tie_breaker=tie, k=10,
            field_boosts=boosts,
        ).collect()
    }
    want = _cross_fields_py(["apple", "banana"], tie, boosts)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12), (d, tie)


def test_cross_fields_blends_df_across_fields(spark, dm_fields):
    # "banana" appears in 1 title but also 1 body -> blended df is the MAX
    # across fields, so the title contribution uses the same (lower) idf
    # as best_fields here; use "apple": title-df=1, body-df=2 -> under
    # cross_fields the title hit for d1 is scored with df=2, strictly
    # below its dis-max (per-field df=1) score.
    from openmatch_spark.query.dismax import cross_fields_score_adhoc

    qs = spark.createDataFrame([("q", "apple")], QUERIES_SCHEMA)
    bf = {r["doc_id"]: r["score"] for r in dismax_score_adhoc(
        dm_fields, qs, ["title", "body"], 0.0, k=10).collect()}
    xf = {r["doc_id"]: r["score"] for r in cross_fields_score_adhoc(
        dm_fields, qs, ["title", "body"], 0.0, k=10).collect()}
    assert xf["d1"] < bf["d1"]
    # d3's body hit already used df=2 under best_fields -> unchanged
    assert xf["d3"] == pytest.approx(bf["d3"], rel=1e-12)


# ----------------------------------------------------------------- QLD-JM

def test_qld_jm_matches_closed_form(spark):
    docs = [("a", "x x y"), ("b", "x z z z")]
    corpus = spark.createDataFrame(docs, "doc_id string, text string")
    qs = spark.createDataFrame([("q", "x z")], QUERIES_SCHEMA)
    lam = 0.25
    run = {
        r["doc_id"]: r["score"]
        for r in qld_jm_score_adhoc(corpus, qs, k=10, lam=lam).collect()
    }
    total = 7.0
    cf = {"x": 3.0, "y": 1.0, "z": 3.0}
    def w(tf, dl, t):
        return math.log(1 + ((1 - lam) * tf / dl) / (lam * cf[t] / total))
    assert run["a"] == pytest.approx(w(2, 3, "x"), rel=1e-12)
    assert run["b"] == pytest.approx(w(1, 4, "x") + w(3, 4, "z"), rel=1e-12)


def test_qld_jm_no_clamp_all_matches_rank(spark):
    # every doc containing any query term must appear (no zero-clamp drop)
    docs = [(f"d{i}", ("common " * (i + 1)).strip()) for i in range(5)]
    corpus = spark.createDataFrame(docs, "doc_id string, text string")
    qs = spark.createDataFrame([("q", "common")], QUERIES_SCHEMA)
    run = qld_jm_score_adhoc(corpus, qs, k=10)
    assert run.count() == 5
    assert run.where(F.col("score") <= 0).count() == 0


def test_qld_jm_rejects_bad_lambda(spark):
    corpus = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    qs = spark.createDataFrame([("q", "x")], QUERIES_SCHEMA)
    with pytest.raises(ValueError, match="lambda"):
        qld_jm_score_adhoc(corpus, qs, lam=1.0).collect()


# ----------------------------------------------------------------- facets

@pytest.fixture(scope="module")
def facet_fixture(spark):
    run = spark.createDataFrame(
        [("q1", "a"), ("q1", "b"), ("q1", "c"), ("q2", "a")],
        "query_id string, doc_id string",
    )
    docs = spark.createDataFrame(
        [("a", 5.0), ("b", 15.0), ("c", None), ("d", 99.0)],
        "doc_id string, price double",
    )
    return run, docs


def test_range_facets_counts(spark, facet_fixture):
    run, docs = facet_fixture
    out = _rows(
        range_facets(run, docs, {"price": [(0, 10), (10, None)]})
    )
    assert out == sorted([
        ("q1", "price", "(other)", 1),       # c has NULL price
        ("q1", "price", "[0,10)", 1),        # a
        ("q1", "price", "[10,*)", 1),        # b
        ("q2", "price", "[0,10)", 1),        # a
    ])


def test_range_facets_overlapping_buckets_count_twice(spark, facet_fixture):
    run, docs = facet_fixture
    out = _rows(range_facets(run, docs, {"price": [(0, 20), (10, 20)]}))
    # b (15.0) falls in both buckets — ES overlap semantics
    assert ("q1", "price", "[0,20)", 2) in out
    assert ("q1", "price", "[10,20)", 1) in out


def test_histogram_facets(spark, facet_fixture):
    run, docs = facet_fixture
    out = _rows(histogram_facets(run, docs, {"price": 10.0}))
    # NULL price (c) skipped; sparse buckets only
    assert out == sorted([
        ("q1", "price", 0.0, 1),
        ("q1", "price", 10.0, 1),
        ("q2", "price", 0.0, 1),
    ])


def test_facets_validation(spark, facet_fixture):
    run, docs = facet_fixture
    with pytest.raises(ValueError):
        range_facets(run, docs, {})
    with pytest.raises(ValueError):
        range_facets(run, docs, {"price": []})
    with pytest.raises(ValueError):
        histogram_facets(run, docs, {"price": 0})


# -------------------------------------------------------------- quantized

@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    m = rng.standard_normal((200, 16))
    rows = [(str(i), [float(x) for x in m[i]]) for i in range(200)]
    return spark.createDataFrame(rows, "vec_id string, embedding array<double>")


def test_quantized_topk_recovers_exact_topk(spark, emb):
    queries = emb.where(F.col("vec_id").isin("0", "1", "2")).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = _rows(
        quantized_topk(emb, queries, k=5, rescore_factor=8, round_to=6)
    )
    qlist = [(r["query_id"], r["embedding"]) for r in queries.collect()]
    want = _rows(
        brute_force_topk(emb, qlist, k=5, metric="cosine", round_to=6)
        .select(
            "query_id", "vec_id", "score", "rank"
        )
    )
    assert got == want


def test_quantized_scores_are_exact_cosines(spark, emb):
    # phase-2 rescore is exact: score == float cosine, not the int8 approx
    queries = emb.limit(1).select(F.col("vec_id").alias("query_id"), "embedding")
    out = quantized_topk(emb, queries, k=1, rescore_factor=2).collect()
    assert out[0]["vec_id"] == out[0]["query_id"]
    assert out[0]["score"] == pytest.approx(1.0, abs=1e-12)


def test_quantize_zero_vector_safe(spark):
    rows = [("z", [0.0] * 4), ("a", [1.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    q = {r["vec_id"]: (r["scale"], r["codes"])
         for r in quantize_embeddings(df).collect()}
    assert q["z"] == (0.0, [0, 0, 0, 0])
    assert q["a"][1] == [127, 0, 0, 0]


def test_quantization_error_bounds(spark, emb):
    row = quantization_error(emb).collect()[0]
    # int8 max-abs quantization of a unit vector: per-dim error <= scale/2
    # <= 1/254; self-cosine should be essentially 1
    assert row["max_abs_err"] <= 0.5 / 127 + 1e-12
    assert row["avg_self_cosine"] > 0.9999


def test_quantized_rejects_bad_factor(spark, emb):
    queries = emb.limit(1).select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="rescore_factor"):
        quantized_topk(emb, queries, rescore_factor=0)


# -------------------------------------------------------- english analyzer

STEM_CASES = [
    ("dogs", "dog"), ("cats", "cat"), ("queries", "querie"),
    ("boss", "boss"), ("virus", "virus"), ("as", "as"), ("is", "is"),
    ("gas", "ga"),  # Lucene minimal stem is aggressive here, by spec
    ("s", "s"), ("ss", "ss"), ("us", "us"), ("xs", "xs"),
    ("123s", "123"), ("dog", "dog"), ("", ""),
]


def test_english_minimal_stem_python_golden():
    for raw, want in STEM_CASES:
        assert stem_english_minimal_py(raw) == want, raw


def test_english_minimal_stem_col_matches_python(spark):
    df = spark.createDataFrame(
        [(r,) for r, _ in STEM_CASES if r], "tok string"
    ).select("tok", stem_english_minimal_col(F.col("tok")).alias("stemmed"))
    for r in df.collect():
        assert r["stemmed"] == stem_english_minimal_py(r["tok"]), r["tok"]


def test_english_tokenize_py_vs_col_identity(spark):
    texts = [
        "The dogs chase cats across fields",
        "Viruses and bosses! Plus gas, classes, focus",
        "numbers 123s and 45s work too",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string").select(
        "text", tokenize_col(F.col("text"), "english").alias("toks")
    )
    for r in df.collect():
        assert r["toks"] == tokenize_py(r["text"], "english"), r["text"]


def test_unknown_analyzer_rejected(spark):
    with pytest.raises(ValueError, match="unknown analyzer"):
        tokenize_py("x", "porter")
    with pytest.raises(ValueError, match="unknown analyzer"):
        tokenize_col(F.lit("x"), "porter")


def test_english_index_matches_plural_variants(spark, tmp_path):
    d = str(tmp_path / "en_idx")
    rows = [
        ("https://e/1", None, b"", "the dog chases three cats", "en"),
        ("https://e/2", None, b"", "unrelated filler words entirely", "en"),
    ]
    build_index(
        spark, spark.createDataFrame(rows, PAGES_SCHEMA), d,
        analyzer="english", num_shards=1, num_term_buckets=2,
    )
    idx = load_index(spark, d)
    from openmatch_spark.query import search

    # plural query matches singular doc text and vice versa
    for qtext in ("dogs", "dog", "cat", "cats"):
        qs = spark.createDataFrame([("q", qtext)], QUERIES_SCHEMA)
        hits = [r["doc_id"] for r in search(idx, qs, k=5).collect()]
        assert hits == ["https://e/1"], qtext
