"""Randomized adversarial battery for the FIELDED DSL executor: random
trees with field-annotated leaves (title/body), nested bools, dis_max,
msm, boosts, and lang filters, compared against an independent Python
reference built from per-field single-leaf runs."""

import os
import random
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmatch_spark.query import (
    build_fielded_index,
    load_fielded_index,
    search_dsl_fielded,
)

ROWS = [
    ("d0", "spark engine overview", "the spark engine builds hash join plans quickly", "en"),
    ("d1", "merge sort deep dive", "sort merge join beats hash join on sorted input", "de"),
    ("d2", "window functions", "rank rows per partition with window functions", "en"),
    ("d3", "spark windowing", "spark window aggregates and sessionization", "fr"),
    ("d4", "hash tables", "open addressing and chained hash tables", "en"),
    ("d5", "spark hash internals", "window merge spark spark", "de"),
]
TERMS = ["spark", "hash", "join", "merge", "window", "sort"]
FIELDS = ["title", "body"]
LANG = {r[0]: r[3] for r in ROWS}


@pytest.fixture(scope="module")
def fx(spark):
    pages = spark.createDataFrame(
        ROWS, "doc_id string, title string, body string, lang string"
    )
    d = tempfile.mkdtemp(prefix="om_fdsl_rand_")
    build_fielded_index(spark, pages, d, FIELDS, analyzer="simple",
                        num_shards=2, num_term_buckets=4, block_size=4,
                        store_attrs=["lang"])
    return load_fielded_index(spark, d)


@pytest.fixture(scope="module")
def leaf(fx):
    out = {}
    for f in FIELDS:
        out[f] = {}
        for t in TERMS:
            run = search_dsl_fielded(fx, {"q": {"match": {f: t}}}, k=1000)
            out[f][t] = {r["doc_id"]: r["score"] for r in run.collect()}
    return out


def _gen_leaf(rng):
    f = rng.choice(FIELDS)
    t = rng.choice(TERMS)
    boost = rng.choice([1.0, 2.0, 0.5])
    return {"match": {f: {"query": t, "boost": boost}}}


def _gen_bool(rng, depth):
    def entry():
        if depth < 3 and rng.random() < 0.35:
            return (_gen_dismax(rng, depth + 1) if rng.random() < 0.3
                    else _gen_bool(rng, depth + 1))
        return _gen_leaf(rng)

    body = {}
    n_should = rng.randint(0, 3)
    n_must = rng.randint(0, 2)
    if n_should == 0 and n_must == 0:
        n_should = 1
    if n_should:
        body["should"] = [entry() for _ in range(n_should)]
    if n_must:
        body["must"] = [entry() for _ in range(n_must)]
    if rng.random() < 0.4:
        body["must_not"] = [entry() for _ in range(rng.randint(1, 2))]
    if n_should >= 2 and rng.random() < 0.5:
        body["minimum_should_match"] = rng.randint(1, n_should)
    if rng.random() < 0.3:
        body["filter"] = [{"term": {"lang": rng.choice(["en", "de", "fr"])}}]
    if rng.random() < 0.25:
        body["boost"] = rng.choice([2.0, 0.5])
    return {"bool": body}


def _gen_dismax(rng, depth):
    qs = []
    for _ in range(rng.randint(1, 3)):
        if depth < 3 and rng.random() < 0.3:
            qs.append(_gen_bool(rng, depth + 1))
        else:
            qs.append(_gen_leaf(rng))
    return {"dis_max": {"queries": qs,
                        "tie_breaker": rng.choice([0.0, 0.3, 1.0])}}


def _eval(q, leaf):
    kind, body = next(iter(q.items()))
    if kind == "match":
        f, spec = next(iter(body.items()))
        t, b = spec["query"], spec.get("boost", 1.0)
        return {d: s * b for d, s in leaf[f][t].items()}
    if kind == "dis_max":
        branches = [_eval(e, leaf) for e in body["queries"]]
        tb = body.get("tie_breaker", 0.0)
        out = {}
        universe = set().union(*[set(b) for b in branches]) if branches else set()
        for d in universe:
            vals = [b[d] for b in branches if d in b]
            out[d] = max(vals) + tb * (sum(vals) - max(vals))
        return out
    assert kind == "bool"
    musts = [_eval(e, leaf) for e in body.get("must", [])]
    shoulds = [_eval(e, leaf) for e in body.get("should", [])]
    nots = [_eval(e, leaf) for e in body.get("must_not", [])]
    msm = body.get("minimum_should_match", 0)
    boost = body.get("boost", 1.0)
    allowed = None
    for flt in body.get("filter", []):
        v = next(iter(flt["term"].values()))
        s = {d for d in LANG if LANG[d] == v}
        allowed = s if allowed is None else (allowed & s)
    docs = set()
    for m in musts + shoulds:
        docs |= set(m)
    out = {}
    for d in docs:
        if any(d not in m for m in musts):
            continue
        n_hit = sum(1 for s in shoulds if d in s)
        if n_hit < msm:
            continue
        if not musts and shoulds and n_hit == 0:
            continue
        if any(d in n for n in nots):
            continue
        if allowed is not None and d not in allowed:
            continue
        out[d] = (sum(m[d] for m in musts)
                  + sum(s[d] for s in shoulds if d in s)) * boost
    return out


@pytest.mark.parametrize("seed", range(16))
def test_random_fielded_tree_matches_reference(fx, leaf, seed):
    rng = random.Random(7000 + seed)
    q = _gen_bool(rng, 0) if rng.random() < 0.8 else _gen_dismax(rng, 0)
    got = {
        r["doc_id"]: r["score"]
        for r in search_dsl_fielded(fx, {"q": q}, k=1000).collect()
    }
    exp = _eval(q, leaf)
    assert set(got) == set(exp), (q, sorted(set(got) ^ set(exp)))
    for d in got:
        assert abs(got[d] - exp[d]) < 1e-9, (q, d, got[d], exp[d])
