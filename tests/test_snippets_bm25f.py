"""Snippet extraction and BM25F vs pure-Python references."""

import math
import re

import pytest
import pyspark.sql.functions as F

from openmatch_spark.analysis import tokenize_col
from openmatch_spark.operators.snippets import extract_snippets
from openmatch_spark.query import bm25f_score_adhoc

DOCS = [
    ("d0", "spark hash join beats sort merge join on small tables"),
    ("d1", "the hash join and the sort merge join and hash again"),
    ("d2", "alpha beta gamma delta hash epsilon zeta eta join theta"),
    ("d3", "no relevant terms at all here"),
    ("d4", ""),
]


def _tok(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


def _best_window(toks, qterms, width):
    occ = [(i, t) for i, t in enumerate(toks) if t in qterms]
    if not occ:
        return 0, 0
    best = None
    for i, (s, _) in enumerate(occ):
        terms_in = {t for p, t in occ if s <= p < s + width}
        cand = (-len(terms_in), s)
        if best is None or cand < best:
            best = cand
    return best[1], -best[0]


@pytest.mark.parametrize("width", [3, 5, 12])
def test_snippets_reference(spark, width):
    corpus = spark.createDataFrame(DOCS, "doc_id string, text string")
    run = spark.createDataFrame(
        [("q", d) for d, _ in DOCS], "query_id string, doc_id string"
    )
    queries = spark.createDataFrame([("q", "hash join")], "query_id string, text string")
    out = {
        r["doc_id"]: r
        for r in extract_snippets(corpus, run, queries, width=width).collect()
    }
    assert set(out) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        toks = _tok(text)
        start, nhit = _best_window(toks, {"hash", "join"}, width)
        r = out[doc_id]
        assert (r["start"], r["n_hit_terms"]) == (start, nhit), doc_id
        assert r["snippet"] == " ".join(toks[start : start + width])


def test_snippets_no_query_terms(spark):
    corpus = spark.createDataFrame(DOCS, "doc_id string, text string")
    run = spark.createDataFrame([("q", "d0")], "query_id string, doc_id string")
    queries = spark.createDataFrame([("q", "zzz")], "query_id string, text string")
    r = extract_snippets(corpus, run, queries, width=4).collect()[0]
    assert (r["start"], r["n_hit_terms"]) == (0, 0)
    assert r["snippet"] == "spark hash join beats"


def _bm25f_reference(docs, query_terms, params, k1):
    toks = {d: _tok(t) for d, t in docs}
    fields = {
        d: {"title": ts[:8], "body": ts[8:]} for d, ts in toks.items()
    }
    n = len(docs)
    avg = {
        f: sum(len(fields[d][f]) for d in fields) / n for f in ("title", "body")
    }
    scores = {}
    for t in set(query_terms):
        qtf = query_terms.count(t)
        df = sum(
            1 for d in fields if any(t in fields[d][f] for f in ("title", "body"))
        )
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d in fields:
            tfn = 0.0
            for f in ("title", "body"):
                w, b = params[f]
                tf = fields[d][f].count(t)
                if tf and avg[f] > 0:
                    tfn += w * tf / (1 - b + b * len(fields[d][f]) / avg[f])
            if tfn > 0:
                scores[d] = scores.get(d, 0.0) + qtf * idf * tfn / (tfn + k1)
    return scores


def test_bm25f_reference(spark):
    params = {"title": (2.0, 0.75), "body": (1.0, 0.4)}
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    toks = docs.select(
        "doc_id", tokenize_col(F.col("text"), "simple").alias("toks")
    )
    fields = toks.select(
        "doc_id",
        F.slice("toks", 1, 8).alias("title"),
        F.slice("toks", 9, 1 << 30).alias("body"),
    )
    queries = spark.createDataFrame(
        [("q", "hash join hash"), ("r", "zzz")], "query_id string, text string"
    )
    out = bm25f_score_adhoc(fields, queries, params, k=10, k1=0.9).collect()
    expect = _bm25f_reference(DOCS, ["hash", "join", "hash"], params, 0.9)
    got = {r["doc_id"]: r["score"] for r in out if r["query_id"] == "q"}
    assert set(got) == set(expect)
    for d in expect:
        assert got[d] == pytest.approx(expect[d], rel=1e-12)
    assert not [r for r in out if r["query_id"] == "r"]  # OOV query: no rows


def test_bm25f_title_beats_body(spark):
    """The same single hit scores higher in the (short, boosted) title."""
    rows = [
        ("t", "needle filler filler filler", ),
        ("b", "filler filler filler filler filler filler filler filler needle filler"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    toks = docs.select("doc_id", tokenize_col(F.col("text"), "simple").alias("toks"))
    fields = toks.select(
        "doc_id",
        F.slice("toks", 1, 8).alias("title"),
        F.slice("toks", 9, 1 << 30).alias("body"),
    )
    out = bm25f_score_adhoc(
        fields,
        spark.createDataFrame([("q", "needle")], "query_id string, text string"),
        {"title": (2.0, 0.75), "body": (1.0, 0.4)},
        k=10,
    ).collect()
    scores = {r["doc_id"]: r["score"] for r in out}
    assert scores["t"] > scores["b"]
