"""Round-4e surfaces: hit counting + stats aggregation
(query/aggregates.py), sort-by-attribute search (query/sorted.py), and
the n-gram LM perplexity scorer (operators/lm_score.py)."""

import math

import pytest

import pyspark.sql.functions as F

from openmatch_spark.fixtures import PAGES_SCHEMA, QUERIES_SCHEMA
from openmatch_spark.index import build_index, load_index
from openmatch_spark.index.deletes import delete_docs
from openmatch_spark.operators.lm_score import ngram_lm_scores
from openmatch_spark.query import count_hits, hit_stats, search, search_sorted

DOCS = [
    ("https://s/1", "alpha beta gamma"),
    ("https://s/2", "alpha beta"),
    ("https://s/3", "alpha delta"),
    ("https://s/4", "epsilon zeta"),
]


@pytest.fixture(scope="module")
def idx_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("r4e") / "idx")
    rows = [(u, None, b"", t, "en") for u, t in DOCS]
    build_index(
        spark, spark.createDataFrame(rows, PAGES_SCHEMA), d,
        analyzer="simple", num_shards=2, num_term_buckets=2,
    )
    return d


@pytest.fixture(scope="module")
def idx(spark, idx_dir):
    return load_index(spark, idx_dir)


# ------------------------------------------------------------- count_hits

def test_count_hits(spark, idx):
    qs = spark.createDataFrame(
        [("q1", "alpha"), ("q2", "beta delta"), ("q3", "zzznope"),
         ("q4", "epsilon alpha")],
        QUERIES_SCHEMA,
    )
    got = {r["query_id"]: r["n_hits"] for r in count_hits(idx, qs).collect()}
    # OR semantics, distinct docs; OOV-only query reports 0 (not absent)
    assert got == {"q1": 3, "q2": 3, "q3": 0, "q4": 4}


def test_count_hits_matches_deep_search(spark, idx):
    qs = spark.createDataFrame([("q", "alpha beta")], QUERIES_SCHEMA)
    n = count_hits(idx, qs).collect()[0]["n_hits"]
    assert n == search(idx, qs, k=1000).count()


def test_count_hits_masks_tombstones(spark, idx_dir):
    import shutil, tempfile

    d = tempfile.mkdtemp(prefix="r4e_del_")
    shutil.rmtree(d)
    shutil.copytree(idx_dir, d)
    delete_docs(spark, d, ["https://s/1"])
    idx2 = load_index(spark, d)
    qs = spark.createDataFrame([("q1", "alpha")], QUERIES_SCHEMA)
    assert count_hits(idx2, qs).collect()[0]["n_hits"] == 2


# -------------------------------------------------------------- hit_stats

def test_hit_stats(spark):
    run = spark.createDataFrame(
        [("q1", "a"), ("q1", "b"), ("q1", "c"), ("q2", "a")],
        "query_id string, doc_id string",
    )
    docs = spark.createDataFrame(
        [("a", 10.0), ("b", 30.0), ("c", None), ("d", 99.0)],
        "doc_id string, price double",
    )
    got = {
        (r["query_id"], r["facet"]): (r["n"], r["min"], r["max"], r["avg"], r["sum"])
        for r in hit_stats(run, docs, ["price"]).collect()
    }
    # NULL excluded from stats but the row count reflects non-null only
    assert got[("q1", "price")] == (2, 10.0, 30.0, 20.0, 40.0)
    assert got[("q2", "price")] == (1, 10.0, 10.0, 10.0, 10.0)


def test_hit_stats_validation(spark):
    run = spark.createDataFrame([("q", "a")], "query_id string, doc_id string")
    with pytest.raises(ValueError):
        hit_stats(run, run, [])


# ----------------------------------------------------------- search_sorted

@pytest.fixture(scope="module")
def attrs(spark):
    return spark.createDataFrame(
        [("https://s/1", 30.0), ("https://s/2", 10.0), ("https://s/4", 20.0)],
        "doc_id string, price double",
    )


def test_search_sorted_ascending(spark, idx, attrs):
    qs = spark.createDataFrame([("q", "alpha epsilon")], QUERIES_SCHEMA)
    out = [
        (r["doc_id"], r["sort_value"])
        for r in search_sorted(idx, qs, attrs, "price", k=10)
        .orderBy("rank").collect()
    ]
    # docs 1,2,3 match alpha; 4 matches epsilon; 3 has no price -> NULL last
    assert out == [
        ("https://s/2", 10.0), ("https://s/4", 20.0),
        ("https://s/1", 30.0), ("https://s/3", None),
    ]


def test_search_sorted_descending_and_k(spark, idx, attrs):
    qs = spark.createDataFrame([("q", "alpha epsilon")], QUERIES_SCHEMA)
    out = [
        r["doc_id"]
        for r in search_sorted(idx, qs, attrs, "price", ascending=False, k=2)
        .orderBy("rank").collect()
    ]
    # NULLs last in BOTH directions; k cuts after ordering
    assert out == ["https://s/1", "https://s/4"]


def test_search_sorted_oov_returns_empty(spark, idx, attrs):
    qs = spark.createDataFrame([("q", "zzznope")], QUERIES_SCHEMA)
    assert search_sorted(idx, qs, attrs, "price").count() == 0


# ------------------------------------------------------------- LM scoring

LM_DOCS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the cat sat"),
    ("d3", "mat the on cat"),   # same words, scrambled order
    ("d4", ""),                 # empty
]


def _lm_reference(lam=0.9):
    """Pure-python replica of the interpolated bigram model over LM_DOCS
    (self-scoring mode)."""
    import collections

    toks = {d: t.split() for d, t in LM_DOCS}
    c1 = collections.Counter(w for t in toks.values() for w in t)
    total = sum(c1.values())
    c2 = collections.Counter(
        (t[i], t[i + 1]) for t in toks.values() for i in range(len(t) - 1)
    )
    cp = collections.Counter()
    for (v, _), c in c2.items():
        cp[v] += c
    out = {}
    for d, t in toks.items():
        if not t:
            out[d] = (0, None)
            continue
        lp = math.log(c1[t[0]] / total)
        for i in range(1, len(t)):
            v, w = t[i - 1], t[i]
            p = (lam * c2[(v, w)] / cp[v] if (v, w) in c2 else 0.0) + (
                1 - lam
            ) * c1[w] / total
            lp += math.log(p)
        out[d] = (len(t), lp)
    return out


def test_lm_scores_match_python_reference(spark):
    corpus = spark.createDataFrame(LM_DOCS, "doc_id string, text string")
    got = {r["doc_id"]: r for r in ngram_lm_scores(corpus).collect()}
    want = _lm_reference()
    for d, (n, lp) in want.items():
        assert got[d]["n_tokens"] == n, d
        if lp is None:
            assert got[d]["log_prob"] is None
            assert got[d]["perplexity"] is None
        else:
            assert got[d]["log_prob"] == pytest.approx(lp, rel=1e-12), d
            assert got[d]["perplexity"] == pytest.approx(
                math.exp(-lp / n), rel=1e-12
            ), d
    # self-scoring sanity: in-order prose beats the scrambled doc
    assert got["d1"]["perplexity"] < got["d3"]["perplexity"]
    # no OOV in self-scoring mode
    assert all(r["n_oov"] == 0 for r in got.values())


def test_lm_scores_external_reference_oov(spark):
    ref = spark.createDataFrame(
        [("r1", "the cat sat on the mat")], "doc_id string, text string"
    )
    corpus = spark.createDataFrame(
        [("x", "the cat zorp")], "doc_id string, text string"
    )
    row = ngram_lm_scores(corpus, reference=ref).collect()[0]
    # 'zorp' is OOV: floored, counted, score still finite
    assert row["n_oov"] == 1
    assert row["log_prob"] is not None and math.isfinite(row["log_prob"])
    assert row["perplexity"] > 1.0


def test_lm_rejects_bad_lambda_and_empty_reference(spark):
    corpus = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(ValueError, match="lambda"):
        ngram_lm_scores(corpus, lam=1.0)
    empty_ref = spark.createDataFrame([("r", "")], "doc_id string, text string")
    with pytest.raises(ValueError, match="no tokens"):
        ngram_lm_scores(corpus, reference=empty_ref)
