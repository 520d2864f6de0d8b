"""Phrase suggester: noisy-channel whole-phrase did-you-mean checked
against an independent pure-Python replica of the documented model."""

import math
import re

import pytest


def _lev(a, b):
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _py_suggest(texts, query, max_edits=1, prefix_len=1, num_candidates=3,
                n_suggest=3, rwel=0.95, discount=0.4, alpha=0.5):
    """Independent reference: same documented model, pure Python."""
    tok = lambda s: [t for t in re.split("[^a-z0-9]+", s.lower()) if t]
    uni, bi = {}, {}
    for t in texts:
        ts = tok(t)
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    n = sum(uni.values())
    v = len(uni)
    denom = n + alpha * v

    def p_uni(w):
        return (uni.get(w, 0) + alpha) / denom

    def cands(token):
        cs = [(token, 0)]
        pool = sorted(
            (t for t in uni
             if t != token
             and t[:prefix_len] == token[:prefix_len]
             and abs(len(t) - len(token)) <= max_edits
             and _lev(t, token) <= max_edits),
            key=lambda t: (_lev(t, token), -uni[t], t),
        )
        cs += [(t, _lev(t, token)) for t in pool[:num_candidates]]
        return cs

    def chan(edits):
        return math.log10(rwel) if edits == 0 else (
            edits * math.log10(1.0 - rwel))

    qts = tok(query)
    if not qts:
        return []
    phrases = [([], None, 0.0)]
    for i, token in enumerate(qts):
        nxt = []
        for words, prev, ls in phrases:
            for c, e in cands(token):
                if i == 0:
                    inc = math.log10(p_uni(c)) + chan(e)
                else:
                    b = bi.get((prev, c))
                    p = (b / uni[prev]) if b else discount * p_uni(c)
                    inc = math.log10(p) + chan(e)
                nxt.append((words + [c], c, ls + inc))
        phrases = nxt
    scored = sorted(
        ((" ".join(w), s) for w, _, s in phrases),
        key=lambda x: (-x[1], x[0]),
    )
    return scored[:n_suggest]


CORPUS = [
    "fast table scan runs",
    "fast table scan",
    "table scan wins",
    "slow query plan",
    "slow query",
    "fast query plan",
]


def test_phrase_suggest_matches_python_replica(spark):
    from openmatch_spark.query import suggest_phrases

    docs = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(CORPUS)],
        "doc_id string, text string",
    )
    queries = spark.createDataFrame(
        [("p1", "fast tble scan"), ("p2", "slow"), ("p3", "zzz qqq")],
        "query_id string, text string",
    )
    out = {}
    for r in suggest_phrases(docs, queries).collect():
        out.setdefault(r["query_id"], []).append(
            (r["rank"], r["suggestion"], r["score"])
        )
    for qid, text in [("p1", "fast tble scan"), ("p2", "slow"),
                      ("p3", "zzz qqq")]:
        exp = _py_suggest(CORPUS, text)
        got = sorted(out.get(qid, []))
        assert len(got) == len(exp), (qid, got, exp)
        for (rank, sug, score), (esug, escore) in zip(got, exp):
            assert sug == esug, (qid, rank, sug, esug)
            assert abs(score - escore) < 1e-9, (qid, sug, score, escore)
    # the headline behavior: the typo phrase corrects to the common one
    assert out["p1"][0][1] == "fast table scan"
    # OOV tokens with no candidates fall through as themselves
    assert out["p3"][0][1] == "zzz qqq"


def test_phrase_suggest_edges(spark):
    from openmatch_spark.query import suggest_phrases

    docs = spark.createDataFrame(
        [("0", "fast table")], "doc_id string, text string"
    )
    empty_q = spark.createDataFrame(
        [("e", "  ...  ")], "query_id string, text string"
    )
    assert suggest_phrases(docs, empty_q).count() == 0
    long_q = spark.createDataFrame(
        [("l", "a b c")], "query_id string, text string"
    )
    with pytest.raises(ValueError):
        suggest_phrases(docs, long_q, max_positions=2)
    with pytest.raises(ValueError):
        suggest_phrases(docs, long_q, max_edits=0)
    with pytest.raises(ValueError):
        suggest_phrases(docs, long_q, real_word_error_likelihood=1.0)
    with pytest.raises(ValueError):
        suggest_phrases(docs, long_q, discount=0.0)
