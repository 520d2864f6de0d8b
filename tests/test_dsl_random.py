"""Randomized adversarial battery for the nested-DSL executor: a seeded
generator produces random bool/dis_max trees (depths to 3, mixed roles,
per-node minimum_should_match, leaf and node boosts, lang filters), and
every tree is evaluated BOTH by search_dsl and by an independent pure-
Python reference evaluator working from single-leaf flat-path runs. Any
compositional bug (msm counting, must gating, must_not scope, dis_max
math, boost application, filter gating) shows up as a mismatch."""

import os
import random
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmatch_spark.index import build_index, load_index
from openmatch_spark.query import search_dsl

DOCS = [
    ("doc://0", "spark hash join beats sort merge join on small tables", "en"),
    ("doc://1", "the hash join and the sort merge join", "de"),
    ("doc://2", "spark spark spark hash hash join", "en"),
    ("doc://3", "merge sort is not sort merge", "fr"),
    ("doc://4", "join hash spark", "de"),
    ("doc://5", "window functions rank rows per partition", "en"),
    ("doc://6", "spark window merge", "fr"),
    ("doc://7", "hash window sort tables", "en"),
]
TERMS = ["spark", "hash", "join", "merge", "window", "sort", "tables",
         "functions"]
LANG = {u: lg for u, _, lg in DOCS}


@pytest.fixture(scope="module")
def idx(spark):
    pages = spark.createDataFrame(
        [(u, None, None, t, lg) for u, t, lg in DOCS],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    d = tempfile.mkdtemp(prefix="om_dsl_rand_")
    build_index(spark, pages, d, analyzer="simple", num_shards=2,
                num_term_buckets=4, block_size=4, store_attrs=["lang"])
    return load_index(spark, d)


@pytest.fixture(scope="module")
def leaf(idx):
    out = {}
    for t in TERMS:
        run = search_dsl(idx, {"q": {"match": {"text": t}}}, k=1000)
        out[t] = {r["doc_id"]: r["score"] for r in run.collect()}
    return out


# ---- random tree generator (pure function of the rng) ----

def _gen_leaf(rng):
    t = rng.choice(TERMS)
    boost = rng.choice([1.0, 2.0, 0.5])
    return {"match": {"text": {"query": t, "boost": boost}}}


def _gen_filter(rng):
    kind = rng.choice(["term", "terms"])
    if kind == "term":
        return {"term": {"lang": rng.choice(["en", "de", "fr"])}}
    return {"terms": {"lang": rng.sample(["en", "de", "fr"], 2)}}


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
        body["filter"] = [_gen_filter(rng)]
    if rng.random() < 0.25:
        body["boost"] = rng.choice([2.0, 0.5])
    return {"bool": body}


def _gen_dismax(rng, depth):
    n = rng.randint(1, 3)
    qs = []
    for _ in range(n):
        if depth < 3 and rng.random() < 0.3:
            qs.append(_gen_bool(rng, depth + 1))
        else:
            qs.append(_gen_leaf(rng))
    return {"dis_max": {"queries": qs,
                        "tie_breaker": rng.choice([0.0, 0.3, 1.0])}}


# ---- independent reference evaluator ----

def _eval_filter(flt):
    kind, body = next(iter(flt.items()))
    attr, spec = next(iter(body.items()))
    assert attr == "lang"
    ok = (lambda v: v == spec) if kind == "term" else (lambda v: v in spec)
    return {d for d in LANG if ok(LANG[d])}


def _eval(q, leaf):
    """dict query -> {doc: score} of MATCHING docs (module semantics:
    a doc must match at least one scoring clause)."""
    kind, body = next(iter(q.items()))
    if kind == "match":
        spec = body["text"]
        t, b = spec["query"], spec.get("boost", 1.0)
        return {d: s * b for d, s in leaf[t].items()}
    if kind == "dis_max":
        branches = [_eval(e, leaf) for e in body["queries"]]
        tb = body.get("tie_breaker", 0.0)
        out = {}
        for d in set().union(*[set(b) for b in branches]) if branches else set():
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
        s = _eval_filter(flt)
        allowed = s if allowed is None else (allowed & s)
    docs = set()
    for m in musts + shoulds:
        docs |= set(m)
    out = {}
    for d in docs:
        if any(d not in m for m in musts):
            continue
        n_should_hit = sum(1 for s in shoulds if d in s)
        if n_should_hit < msm:
            continue
        if not musts and shoulds and n_should_hit == 0:
            continue
        if any(d in n for n in nots):
            continue
        if allowed is not None and d not in allowed:
            continue
        score = sum(m[d] for m in musts) + sum(s[d] for s in shoulds if d in s)
        out[d] = score * boost
    return out


@pytest.mark.parametrize("seed", range(24))
def test_random_tree_matches_reference(idx, leaf, seed):
    rng = random.Random(1000 + seed)
    q = _gen_bool(rng, 0) if rng.random() < 0.8 else _gen_dismax(rng, 0)
    got = {
        r["doc_id"]: r["score"]
        for r in search_dsl(idx, {"q": q}, k=1000).collect()
    }
    exp = _eval(q, leaf)
    # filter-only shapes can arise when every scoring entry is pruned by
    # the generator's randomness — those take zero-page semantics the
    # reference does not model; the generator guarantees >= 1 scoring
    # entry, so exp is comparable directly
    assert set(got) == set(exp), (
        q, sorted(set(got) ^ set(exp))
    )
    for d in got:
        assert abs(got[d] - exp[d]) < 1e-9, (q, d, got[d], exp[d])
