"""RM3 expansion vs a from-scratch pure-Python replica."""

import math
import re

import pytest

from openmatch_spark.query import rm3_rescore_adhoc

DOCS = [
    ("d0", "spark hash join beats sort merge join on small tables"),
    ("d1", "the hash join and the sort merge join and hash again"),
    ("d2", "alpha beta gamma hash epsilon join theta hash"),
    ("d3", "sort merge window partition rank rows"),
    ("d4", "completely unrelated words here nothing shared"),
    ("d5", "hash tables and hash maps and hash sets"),
]


def _tok(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


def _rm3_reference(docs, qtoks, k, fb_docs, fb_terms, alpha, k1=0.9, b=0.4):
    toks = {d: _tok(t) for d, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for t in {w for ts in toks.values() for w in ts}:
        df[t] = sum(1 for ts in toks.values() if t in ts)

    def bm25_term(t, d):
        tf = toks[d].count(t)
        if not tf:
            return 0.0
        idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
        return idf * tf / (tf + k1 * (1 - b + b * len(toks[d]) / avgdl))

    def run(weights, cut):
        scores = {}
        for d in toks:
            s = sum(w * bm25_term(t, d) for t, w in weights.items())
            if s > 0:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:cut]
        return ranked

    qw = {}
    for t in qtoks:
        qw[t] = qw.get(t, 0.0) + 1.0
    fb = run(qw, fb_docs)
    total = sum(s for _, s in fb)
    rm = {}
    for d, s in fb:
        for t in set(toks[d]):
            rm[t] = rm.get(t, 0.0) + (s / total) * toks[d].count(t) / len(toks[d])
    rm = {t: round(w, 9) for t, w in rm.items()}
    top = sorted(rm.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
    tsum = sum(w for _, w in top)
    rmn = {t: w / tsum for t, w in top}
    qsum = sum(qw.values())
    final = {}
    for t in set(qw) | set(rmn):
        final[t] = round(
            alpha * qw.get(t, 0.0) / qsum + (1 - alpha) * rmn.get(t, 0.0), 9
        )
    final = {t: w for t, w in final.items() if w > 0}
    return run(final, k)


@pytest.mark.parametrize(
    "query,fb_docs,fb_terms,alpha",
    [("hash join", 3, 5, 0.5), ("sort merge", 2, 4, 0.3), ("hash hash join", 3, 3, 0.7)],
)
def test_rm3_matches_reference(spark, query, fb_docs, fb_terms, alpha):
    corpus = spark.createDataFrame(DOCS, "doc_id string, text string")
    queries = spark.createDataFrame([("q", query)], "query_id string, text string")
    out = rm3_rescore_adhoc(
        corpus, queries, k=10, fb_docs=fb_docs, fb_terms=fb_terms,
        alpha=alpha, analyzer="simple",
    ).collect()
    got = [(r["doc_id"], r["score"]) for r in sorted(out, key=lambda r: r["rank"])]
    expect = _rm3_reference(DOCS, _tok(query), 10, fb_docs, fb_terms, alpha)
    assert [d for d, _ in got] == [d for d, _ in expect]
    for (_, gs), (_, es) in zip(got, expect):
        assert gs == pytest.approx(es, rel=1e-9)


def test_rm3_oov_query_empty(spark):
    corpus = spark.createDataFrame(DOCS, "doc_id string, text string")
    queries = spark.createDataFrame([("q", "zzzz qqqq")], "query_id string, text string")
    assert rm3_rescore_adhoc(corpus, queries, k=5).count() == 0


def test_rm3_expansion_recalls_unqueried_doc(spark):
    """The point of RM3: d5 shares no ORIGINAL query term with 'join sort'
    but is pulled in through expansion terms mined from feedback docs."""
    corpus = spark.createDataFrame(DOCS, "doc_id string, text string")
    queries = spark.createDataFrame([("q", "join sort")], "query_id string, text string")
    base = {r["doc_id"] for r in rm3_rescore_adhoc(
        corpus, queries, k=10, fb_docs=3, fb_terms=0, alpha=1.0
    ).collect()}
    expanded = {r["doc_id"] for r in rm3_rescore_adhoc(
        corpus, queries, k=10, fb_docs=3, fb_terms=8, alpha=0.5
    ).collect()}
    assert "d5" not in base  # no 'join'/'sort' in d5
    assert "d5" in expanded  # reached via expansion term 'hash'
