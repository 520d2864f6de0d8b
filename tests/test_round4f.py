"""Round-4f surfaces: percolation (query/percolate.py), function-score
decay rescoring (query/decay.py), term vectors + significant terms
(query/significant.py), hit percentiles (query/aggregates.py), and DSIR
importance weights (operators/dsir.py)."""

import math

import pytest

from openmatch_spark.operators.dsir import dsir_weights
from openmatch_spark.query import (
    decay_rescore,
    hit_percentiles,
    percolate,
    significant_terms,
    term_vectors,
)

# ---------------------------------------------------------------- percolate

DOCS = [
    ("d1", "alpha beta gamma"),
    ("d2", "alpha beta"),
    ("d3", "alpha delta"),
    ("d4", "epsilon zeta"),
    ("d5", ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def _stored(spark, rows):
    return spark.createDataFrame(
        rows, "query_id string, must string, should string, must_not string"
    )


def test_percolate_roles(spark, docs):
    stored = _stored(spark, [
        ("q_must", "alpha beta", None, None),        # both required
        ("q_should", None, "delta epsilon", None),   # any-of
        ("q_not", "alpha", None, "delta"),           # alpha but not delta
        ("q_dead", None, None, "alpha"),             # exclusion-only: never
        ("q_oov", "alpha zzznope", None, None),      # unsatisfiable must
    ])
    got = {
        (r["query_id"], r["doc_id"])
        for r in percolate(docs, stored).collect()
    }
    assert got == {
        ("q_must", "d1"), ("q_must", "d2"),
        ("q_should", "d3"), ("q_should", "d4"),
        ("q_not", "d1"), ("q_not", "d2"),
    }


def test_percolate_min_should_match(spark, docs):
    stored = _stored(spark, [("q", None, "beta gamma delta", None)])
    one = {r["doc_id"] for r in percolate(docs, stored).collect()}
    two = {
        r["doc_id"]
        for r in percolate(docs, stored, min_should_match=2).collect()
    }
    assert one == {"d1", "d2", "d3"}
    assert two == {"d1"}  # only d1 has two of {beta, gamma, delta}


def test_percolate_must_should_merge(spark, docs):
    # 'alpha' in both roles merges into must and leaves the should quota:
    # with msm=1 the doc must ALSO match a real should term (beta/gamma)
    stored = _stored(spark, [("q", "alpha", "alpha beta gamma", None)])
    got = {
        r["doc_id"]
        for r in percolate(docs, stored, min_should_match=1).collect()
    }
    assert got == {"d1", "d2"}


# ------------------------------------------------------------ decay_rescore

@pytest.fixture(scope="module")
def run(spark):
    return spark.createDataFrame(
        [("q", "a", 10.0), ("q", "b", 10.0), ("q", "c", 10.0)],
        "query_id string, doc_id string, score double",
    )


@pytest.fixture(scope="module")
def attrs(spark):
    # distances from origin 0: a=0, b=5 (= scale), c missing
    return spark.createDataFrame(
        [("a", 0.0), ("b", 5.0), ("d", 1.0)], "doc_id string, ts double"
    )


@pytest.mark.parametrize("kind", ["gauss", "exp", "linear"])
def test_decay_at_scale_distance_is_decay(spark, run, attrs, kind):
    out = {
        r["doc_id"]: r["score"]
        for r in decay_rescore(
            run, attrs, "ts", origin=0.0, scale=5.0, decay=0.5, kind=kind
        ).collect()
    }
    # at the origin: untouched; at |v-origin| == scale: exactly decay×
    assert out["a"] == pytest.approx(10.0, rel=1e-12)
    assert out["b"] == pytest.approx(5.0, rel=1e-12)
    # missing attribute -> multiplier 1.0 (ES missing-field rule)
    assert out["c"] == pytest.approx(10.0, rel=1e-12)


def test_decay_offset_and_rank(spark, run, attrs):
    out = decay_rescore(
        run, attrs, "ts", origin=0.0, scale=5.0, decay=0.5, offset=5.0,
        kind="gauss",
    ).orderBy("rank").collect()
    # offset swallows b's distance -> all three tie at 10.0, doc_id breaks
    assert [r["doc_id"] for r in out] == ["a", "b", "c"]
    assert all(r["score"] == pytest.approx(10.0) for r in out)


def test_decay_validation(spark, run, attrs):
    with pytest.raises(ValueError, match="kind"):
        decay_rescore(run, attrs, "ts", 0.0, 5.0, kind="boxcar")
    with pytest.raises(ValueError, match="scale"):
        decay_rescore(run, attrs, "ts", 0.0, 0.0)
    with pytest.raises(ValueError, match="decay"):
        decay_rescore(run, attrs, "ts", 0.0, 5.0, decay=1.0)


# ------------------------------------------------------------- term_vectors

def test_term_vectors(spark, docs):
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["first_pos"], r["df"])
        for r in term_vectors(docs).collect()
    }
    assert got[("d1", "alpha")] == (1, 1, 3)   # alpha in d1,d2,d3
    assert got[("d1", "gamma")] == (1, 3, 1)
    assert got[("d3", "delta")] == (1, 2, 1)
    assert ("d5", "") not in got  # empty doc contributes nothing


def test_term_vectors_tf_and_positions(spark):
    d = spark.createDataFrame(
        [("x", "ho ho ho santa")], "doc_id string, text string"
    )
    got = {r["term"]: (r["tf"], r["first_pos"]) for r in term_vectors(d).collect()}
    assert got["ho"] == (3, 1)
    assert got["santa"] == (1, 4)


# -------------------------------------------------------- significant_terms

def test_significant_terms(spark, docs):
    # hit set for q = {d1, d2}: alpha/beta are in every hit but alpha is
    # corpus-common (bg 3) while beta is hit-only (bg 2) — beta wins on lift
    run = spark.createDataFrame(
        [("q", "d1"), ("q", "d2")], "query_id string, doc_id string"
    )
    rows = significant_terms(run, docs, min_doc_count=2).orderBy("rank").collect()
    assert [r["term"] for r in rows] == ["beta", "alpha"]
    beta = rows[0]
    # lift = (2/2) / (2/5) = 2.5
    assert beta["score"] == pytest.approx(2.5, rel=1e-12)
    assert (beta["fg_df"], beta["bg_df"]) == (2, 2)


def test_significant_terms_min_doc_count(spark, docs):
    run = spark.createDataFrame([("q", "d1")], "query_id string, doc_id string")
    terms = {r["term"] for r in significant_terms(run, docs, min_doc_count=2).collect()}
    assert terms == set()  # every term appears in only 1 foreground doc


# ---------------------------------------------------------- hit_percentiles

def test_hit_percentiles_linear_interpolation(spark):
    run = spark.createDataFrame(
        [("q", d) for d in "abcd"], "query_id string, doc_id string"
    )
    docs = spark.createDataFrame(
        [("a", 10.0), ("b", 20.0), ("c", 30.0), ("d", 40.0), ("e", 999.0)],
        "doc_id string, v double",
    )
    got = {
        r["p"]: r["value"]
        for r in hit_percentiles(run, docs, "v", (0.0, 0.5, 1.0)).collect()
    }
    # PERCENTILE_CONT over [10,20,30,40]
    assert got[0.0] == pytest.approx(10.0)
    assert got[0.5] == pytest.approx(25.0)
    assert got[1.0] == pytest.approx(40.0)


def test_hit_percentiles_validation(spark, run):
    with pytest.raises(ValueError):
        hit_percentiles(run, run, "v", ())
    with pytest.raises(ValueError):
        hit_percentiles(run, run, "v", (1.5,))


# ------------------------------------------------------------- DSIR weights

def test_dsir_prefers_target_like_docs(spark):
    target = spark.createDataFrame(
        [("t1", "clean prose text"), ("t2", "clean text")],
        "doc_id string, text string",
    )
    raw = spark.createDataFrame(
        [("r1", "clean prose"), ("r2", "spam spam pills"), ("r3", "")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in dsir_weights(raw, target).collect()}
    assert got["r1"]["avg_log_weight"] > got["r2"]["avg_log_weight"]
    assert got["r3"]["n_tokens"] == 0
    assert got["r3"]["log_weight"] == 0.0
    assert got["r3"]["avg_log_weight"] is None


def test_dsir_matches_python_reference(spark):
    target_rows = [("t1", "a b a"), ("t2", "b c")]
    raw_rows = [("r1", "a b"), ("r2", "c d d")]
    target = spark.createDataFrame(target_rows, "doc_id string, text string")
    raw = spark.createDataFrame(raw_rows, "doc_id string, text string")

    import collections
    ct = collections.Counter(w for _, t in target_rows for w in t.split())
    cr = collections.Counter(w for _, t in raw_rows for w in t.split())
    tt, tr = sum(ct.values()), sum(cr.values())
    vocab = set(ct) | set(cr)
    v = len(vocab)

    def ref_weight(text):
        return sum(
            math.log((ct[w] + 1) / (tt + v)) - math.log((cr[w] + 1) / (tr + v))
            for w in text.split()
        )

    got = {r["doc_id"]: r["log_weight"] for r in dsir_weights(raw, target).collect()}
    for did, text in raw_rows:
        assert got[did] == pytest.approx(ref_weight(text), rel=1e-12), did


def test_dsir_rejects_empty_pools(spark):
    empty = spark.createDataFrame([("e", "")], "doc_id string, text string")
    some = spark.createDataFrame([("s", "x")], "doc_id string, text string")
    with pytest.raises(ValueError, match="target"):
        dsir_weights(some, empty)
    with pytest.raises(ValueError, match="raw"):
        dsir_weights(empty, some)


# ------------------------------------------------------------- plan shapes

def test_percolate_plan_broadcasts_rules(spark, docs):
    """The rule table reaches the doc-term stream via broadcast (both the
    role table and the per-rule requirement counts) — the doc side must
    never shuffle on its own bulk, only on the bounded (doc, rule) hits."""
    from openmatch_spark.plans.explain import plan_summary

    stored = _stored(spark, [("q", "alpha", "beta", None)])
    s = plan_summary(percolate(docs, stored))
    assert s["broadcasts"] >= 2
    # pure column algebra end-to-end: no Python evaluation points
    assert s["python_evals"] == 0


# -------------------------------------------------------- perplexity buckets

def test_perplexity_buckets(spark):
    from openmatch_spark.operators.lm_score import perplexity_buckets

    corpus = spark.createDataFrame(
        [
            ("d1", "the cat sat on the mat and the cat sat again"),
            ("d2", "the cat sat on the mat"),
            ("d3", "the cat sat"),
            ("d4", "mat the on cat sat the"),
            ("d5", "cat mat sat on and again the"),
            ("d6", "again and mat on sat the cat"),
            ("empty", ""),
        ],
        "doc_id string, text string",
    )
    rows = {r["doc_id"]: r for r in perplexity_buckets(corpus).collect()}
    assert rows["empty"]["bucket"] is None  # no evidence != gibberish
    scored = sorted(
        (r["perplexity"], d) for d, r in rows.items()
        if r["perplexity"] is not None
    )
    order = [rows[d]["bucket"] for _, d in scored]
    # buckets are monotone in perplexity and all three appear
    idx = {"head": 0, "middle": 1, "tail": 2}
    assert order == sorted(order, key=idx.__getitem__)
    assert set(order) == {"head", "middle", "tail"}


def test_perplexity_buckets_validation(spark):
    from openmatch_spark.operators.lm_score import perplexity_buckets

    corpus = spark.createDataFrame([("a", "x y")], "doc_id string, text string")
    with pytest.raises(ValueError, match="fractions"):
        perplexity_buckets(corpus, fractions=(0.5, 0.5))


# --------------------------------------------------------- boosting_rescore

def test_boosting_demotes_but_keeps(spark, run):
    from openmatch_spark.query import boosting_rescore

    neg = spark.createDataFrame([("a",)], "doc_id string")
    out = {r["doc_id"]: (r["score"], r["rank"])
           for r in boosting_rescore(run, neg, 0.5).collect()}
    # 'a' demoted to 5.0 but still present (unlike must_not); others keep 10
    assert out["a"] == (5.0, 3)
    assert out["b"][0] == 10.0 and out["c"][0] == 10.0


def test_boosting_per_query_keys_and_validation(spark, run):
    from openmatch_spark.query import boosting_rescore

    negq = spark.createDataFrame(
        [("q", "b"), ("other", "c")], "query_id string, doc_id string"
    )
    out = {r["doc_id"]: r["score"]
           for r in boosting_rescore(run, negq, 0.25).collect()}
    assert out["b"] == 2.5
    assert out["c"] == 10.0  # (other, c) does not touch query q
    with pytest.raises(ValueError, match="negative_boost"):
        boosting_rescore(run, negq, 1.0)


# --------------------------------------------------------------- MMR rerank

def _mmr_reference(cands, vecs, lam, k, round_to=6):
    """Pure-python greedy MMR replica; cands = {doc: rel}, vecs = {doc: np
    vector}; returns [(doc, mmr, rank)]."""
    import numpy as np

    docs = sorted(cands)
    v = np.array([vecs[d] for d in docs], dtype=np.float64)
    norms = np.linalg.norm(v, axis=1)
    norms[norms == 0.0] = 1.0
    sims = np.round((v @ v.T) / np.outer(norms, norms), round_to)
    rel = np.array([round(cands[d], round_to) for d in docs])
    sel, maxsim, out = [], np.zeros(len(docs)), []
    for rank in range(1, min(k, len(docs)) + 1):
        mmr = lam * rel - (1.0 - lam) * maxsim
        best = min(
            (i for i in range(len(docs)) if i not in sel),
            key=lambda i: (-mmr[i], docs[i]),
        )
        sel.append(best)
        out.append((docs[best], round(float(mmr[best]), round_to), rank))
        maxsim = np.maximum(maxsim, sims[:, best])
    return out


def test_mmr_matches_reference_and_diversifies(spark):
    import numpy as np
    from openmatch_spark.query.diversify import mmr_rerank

    # two near-identical high-rel docs + one orthogonal lower-rel doc:
    # plain ranking keeps both twins adjacent; MMR interleaves
    vecs = {
        "a": [1.0, 0.0, 0.0],
        "b": [0.999, 0.001, 0.0],
        "c": [0.0, 1.0, 0.0],
        "d": [0.0, 0.9, 0.1],
    }
    cands = {"a": 0.95, "b": 0.94, "c": 0.80, "d": 0.78}
    run = spark.createDataFrame(
        [("q", d, s) for d, s in cands.items()],
        "query_id string, doc_id string, score double",
    )
    emb = spark.createDataFrame(
        [(d, v) for d, v in vecs.items()], "vec_id string, embedding array<double>"
    )
    got = [
        (r["doc_id"], r["mmr_score"], r["rank"])
        for r in mmr_rerank(run, emb, lam=0.5, k=4).orderBy("rank").collect()
    ]
    want = _mmr_reference(cands, {d: np.array(v) for d, v in vecs.items()}, 0.5, 4)
    assert got == want
    # diversification property: the orthogonal doc jumps ahead of the twin
    assert [d for d, _, _ in got][:2] == ["a", "c"]


def test_mmr_drops_vectorless_candidates_and_validates(spark):
    from openmatch_spark.query.diversify import mmr_rerank

    run = spark.createDataFrame(
        [("q", "a", 1.0), ("q", "ghost", 0.99)],
        "query_id string, doc_id string, score double",
    )
    emb = spark.createDataFrame(
        [("a", [1.0, 0.0])], "vec_id string, embedding array<double>"
    )
    rows = mmr_rerank(run, emb, k=5).collect()
    assert [r["doc_id"] for r in rows] == ["a"]
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(run, emb, lam=1.5)
    with pytest.raises(ValueError, match="k"):
        mmr_rerank(run, emb, k=0)


# ------------------------------------------------------------ facet_top_hits

def test_facet_top_hits(spark):
    from openmatch_spark.operators.facets import facet_top_hits

    run = spark.createDataFrame(
        [("q", "a", 3.0), ("q", "b", 2.0), ("q", "c", 1.0), ("q", "d", 4.0)],
        "query_id string, doc_id string, score double",
    )
    docs = spark.createDataFrame(
        [("a", "en"), ("b", "en"), ("c", "de"), ("d", None)],
        "doc_id string, lang string",
    )
    got = {
        (r["value"], r["pos"]): r["doc_id"]
        for r in facet_top_hits(run, docs, "lang", n=1).collect()
    }
    # one top hit per language bucket; NULL attr buckets explicitly
    assert got[("en", 1)] == "a"
    assert got[("de", 1)] == "c"
    assert len([v for (v, _) in got if v not in ("en", "de")]) == 1  # NULL bucket
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n must"):
        facet_top_hits(run, docs, "lang", n=0)


# ------------------------------------------------------------ collocations

def test_pmi_collocations_math(spark):
    from openmatch_spark.operators.collocations import pmi_collocations

    # 'x y' always adjacent (strong collocation); 'a'/'b' frequent but
    # never adjacent to each other consistently
    corpus = spark.createDataFrame(
        [("d1", "x y a x y b"), ("d2", "x y b a"), ("d3", "a b x y")],
        "doc_id string, text string",
    )
    rows = pmi_collocations(corpus, n=10, min_count=2).collect()
    got = {(r["term_a"], r["term_b"]): r for r in rows}
    assert ("x", "y") in got
    xy = got[("x", "y")]
    # counts: tokens T=14, bigram slots B=11, c2(x y)=4, c1(x)=4, c1(y)=4
    want = math.log((4 / 11) / ((4 / 14) * (4 / 14)))
    assert xy["n_pair"] == 4
    assert xy["pmi"] == pytest.approx(round(want, 6), abs=1e-9)
    # the consistent pair outranks everything else
    assert xy["rank"] == 1


def test_pmi_collocations_gates_and_validation(spark):
    from openmatch_spark.operators.collocations import pmi_collocations

    corpus = spark.createDataFrame(
        [("d", "p q p q r s")], "doc_id string, text string"
    )
    pairs = {
        (r["term_a"], r["term_b"])
        for r in pmi_collocations(corpus, min_count=2).collect()
    }
    assert pairs == {("p", "q")}  # hapax bigrams gated out
    with pytest.raises(ValueError, match="n must"):
        pmi_collocations(corpus, n=0)
    with pytest.raises(ValueError, match="min_count"):
        pmi_collocations(corpus, min_count=0)
    empty = spark.createDataFrame([("d", "solo")], "doc_id string, text string")
    with pytest.raises(ValueError, match="bigrams"):
        pmi_collocations(empty)


# ------------------------------------------------------- fuzzy decontam

def test_decontaminate_fuzzy(spark):
    from openmatch_spark.operators.decontam import decontaminate_fuzzy

    bench = spark.createDataFrame(
        [("b1", "the quick brown fox jumps over the lazy dog")],
        "bench_id string, text string",
    )
    corpus = spark.createDataFrame(
        [
            # verbatim copy -> jaccard 1.0
            ("c1", "the quick brown fox jumps over the lazy dog"),
            # light edit, most shingles shared -> above 0.5
            ("c2", "the quick brown fox jumps over the lazy cat"),
            # unrelated -> clean, zero candidates
            ("c3", "completely different text about spark engines"),
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: r
        for r in decontaminate_fuzzy(corpus, bench, threshold=0.5).collect()
    }
    assert got["c1"]["contaminated"] and got["c1"]["best_jaccard"] == 1.0
    assert got["c2"]["contaminated"] and 0.5 <= got["c2"]["best_jaccard"] < 1.0
    assert not got["c3"]["contaminated"]
    assert got["c3"]["n_candidates"] == 0 and got["c3"]["best_bench_id"] is None


def test_decontaminate_fuzzy_validation(spark):
    from openmatch_spark.operators.decontam import decontaminate_fuzzy

    d = spark.createDataFrame([("a", "x y z w")], "doc_id string, text string")
    b = spark.createDataFrame([("b", "x y z w")], "bench_id string, text string")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="threshold"):
        decontaminate_fuzzy(d, b, threshold=0.0)


def test_curate_fuzzy_decontam_gate(spark):
    from openmatch_spark.operators.curate import curate_corpus

    bench = spark.createDataFrame(
        [("b1", "the quick brown fox jumps over the lazy dog at dawn today")],
        "bench_id string, text string",
    )
    base = "this is a perfectly ordinary english document with plenty of words "
    corpus = spark.createDataFrame(
        [
            # paraphrase of the benchmark: one word changed -> fuzzy catches
            # it, the exact 8-gram rule does NOT (no verbatim 8-gram run)
            ("p1", "the quick brown fox leaps over the lazy dog at dawn today"),
            ("ok", base * 3),
        ],
        "doc_id string, text string",
    )
    # exact-only: the paraphrase survives
    exact_only = {
        r["doc_id"]: r["keep"]
        for r in curate_corpus(
            corpus, langs=("en",), min_quality=0.0, benchmark=bench,
            decontam_n=8,
        ).collect()
    }
    assert exact_only["p1"] == 1
    # with the fuzzy gate: the paraphrase is dropped as decontam
    rows = {
        r["doc_id"]: r
        for r in curate_corpus(
            corpus, langs=("en",), min_quality=0.0, benchmark=bench,
            decontam_n=8, decontam_fuzzy_threshold=0.5,
        ).collect()
    }
    assert rows["p1"]["keep"] == 0 and rows["p1"]["reason"] == "decontam"
    assert rows["ok"]["keep"] == 1


# --------------------------------------------------------------- keywords

def test_doc_keywords(spark, docs):
    from openmatch_spark.query.significant import doc_keywords

    # gamma appears only in d1 (rare -> high idf); alpha is corpus-common
    rows = doc_keywords(docs, n=2).collect()
    d1 = sorted(
        (r["rank"], r["term"]) for r in rows if r["doc_id"] == "d1"
    )
    assert d1[0][1] == "gamma"  # the rare term wins the top slot
    assert all(r["rank"] <= 2 for r in rows)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n must"):
        doc_keywords(docs, n=0)


# ------------------------------------------------------------------ ERR@k

def test_err_at_k_matches_hand_computation(spark):
    from openmatch_spark.operators.metrics import err_at_k

    run = spark.createDataFrame(
        [("q", "a", 3.0, 1), ("q", "b", 2.0, 2), ("q", "c", 1.0, 3)],
        "query_id string, doc_id string, score double, rank int",
    )
    qrels = spark.createDataFrame(
        [("q", "a", 3), ("q", "c", 1)], "query_id string, doc_id string, rel int"
    )
    got = err_at_k(run, qrels, k=3).collect()[0]["err"]
    # R(a)=7/8, R(b)=0, R(c)=1/8
    r_a, r_c = 7 / 8, 1 / 8
    want = r_a / 1 + 0.0 + (1 - r_a) * (1 - 0.0) * r_c / 3
    assert got == pytest.approx(round(want, 6), abs=1e-9)


def test_err_at_k_unjudged_and_validation(spark):
    from openmatch_spark.operators.metrics import err_at_k

    run = spark.createDataFrame(
        [("q", "x", 1.0, 1)], "query_id string, doc_id string, score double, rank int"
    )
    qrels = spark.createDataFrame(
        [], "query_id string, doc_id string, rel int"
    )
    assert err_at_k(run, qrels).collect()[0]["err"] == 0.0
    with pytest.raises(ValueError, match="k must"):
        err_at_k(run, qrels, k=0)


# -------------------------------------------------------------------- QPP

def test_qpp_signals(spark):
    from openmatch_spark.query.qpp import qpp_signals

    docs = spark.createDataFrame(
        [("d1", "common rare"), ("d2", "common"), ("d3", "common")],
        "doc_id string, text string",
    )
    queries = spark.createDataFrame(
        [("q1", "common rare"), ("q2", "zzznope")],
        "query_id string, text string",
    )
    run = spark.createDataFrame(
        [("q1", "d1", 2.0), ("q1", "d2", 1.0)],
        "query_id string, doc_id string, score double",
    )
    got = {r["query_id"]: r for r in qpp_signals(docs, queries, run).collect()}
    q1 = got["q1"]
    # idf(common: df=3, N=3) < idf(rare: df=1, N=3); max is the rare term
    assert q1["n_terms"] == 2
    assert q1["max_idf"] > q1["mean_idf"] > 0
    assert q1["score_mean"] == pytest.approx(1.5)
    assert q1["score_cv"] == pytest.approx(
        round((0.5**0.5 * 1.0) / 1.5, 6), abs=1e-6
    ) or q1["score_cv"] is not None
    # OOV-only query: zero in-vocab terms, NULL signals
    q2 = got["q2"]
    assert q2["n_terms"] == 0 and q2["mean_idf"] is None
    assert q2["score_mean"] is None  # no run rows


def test_qpp_single_hit_std_is_null(spark):
    from openmatch_spark.query.qpp import qpp_signals

    docs = spark.createDataFrame([("d", "x")], "doc_id string, text string")
    queries = spark.createDataFrame([("q", "x")], "query_id string, text string")
    run = spark.createDataFrame(
        [("q", "d", 1.0)], "query_id string, doc_id string, score double"
    )
    row = qpp_signals(docs, queries, run).collect()[0]
    assert row["score_std"] is None and row["score_cv"] is None


# -------------------------------------------------- temperature weights

def test_temperature_weights(spark):
    from openmatch_spark.operators.sampling import temperature_weights

    corpus = spark.createDataFrame(
        [("a", "en")] * 8 + [("b", "de")] * 2, "doc_id string, lang string"
    )
    got = {r["domain"]: r for r in temperature_weights(corpus, "lang", alpha=0.5).collect()}
    # p = (0.8, 0.2); p^0.5 = (0.894.., 0.447..); weights (2/3, 1/3)
    assert got["en"]["p_raw"] == pytest.approx(0.8)
    assert got["en"]["weight"] == pytest.approx(2 / 3, abs=1e-6)
    assert got["de"]["weight"] == pytest.approx(1 / 3, abs=1e-6)
    # alpha = 1 keeps natural proportions
    nat = {r["domain"]: r["weight"]
           for r in temperature_weights(corpus, "lang", alpha=1.0).collect()}
    assert nat["en"] == pytest.approx(0.8)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="alpha"):
        temperature_weights(corpus, "lang", alpha=0.0)


# ----------------------------------------------------------- snapshot/restore

def test_snapshot_restore_search_identical(spark, tmp_path):
    import os
    import shutil

    from openmatch_spark.fixtures import PAGES_SCHEMA, QUERIES_SCHEMA, gen_pages_rows
    from openmatch_spark.index import build_index, load_index
    from openmatch_spark.index.snapshot import restore_index, snapshot_index
    from openmatch_spark.query import search

    src = str(tmp_path / "idx")
    pages = spark.createDataFrame(gen_pages_rows(120), PAGES_SCHEMA)
    build_index(spark, pages, src, analyzer="simple", num_shards=2,
                num_term_buckets=2)
    qs = spark.createDataFrame([("q", "term0001 term0002")], QUERIES_SCHEMA)
    want = sorted(
        (r["doc_id"], r["rank"], round(r["score"], 9))
        for r in search(load_index(spark, src), qs, k=5).collect()
    )

    snap = str(tmp_path / "snap")
    info = snapshot_index(src, snap)
    assert info["copied"][-1] == "manifest"  # commit point is last

    # the original can vanish entirely; the snapshot serves identically
    shutil.rmtree(src)
    got = sorted(
        (r["doc_id"], r["rank"], round(r["score"], 9))
        for r in search(load_index(spark, snap), qs, k=5).collect()
    )
    assert got == want

    # restore is the same crash-safe copy; restored index identical too
    rest = str(tmp_path / "restored")
    restore_index(snap, rest)
    got2 = sorted(
        (r["doc_id"], r["rank"], round(r["score"], 9))
        for r in search(load_index(spark, rest), qs, k=5).collect()
    )
    assert got2 == want

    # a partial copy (payloads but NO manifest) must not load as an index
    partial = str(tmp_path / "partial")
    os.makedirs(partial)
    for kind in ("stats.json", "dictionary", "docmap", "postings"):
        s = os.path.join(snap, kind)
        d = os.path.join(partial, kind)
        (shutil.copytree if os.path.isdir(s) else shutil.copy2)(s, d)
    with pytest.raises(Exception):
        load_index(spark, partial).postings.collect()

    # refuse to clobber without overwrite
    with pytest.raises(FileExistsError):
        snapshot_index(snap, rest)
    # non-index source refuses
    with pytest.raises(FileNotFoundError, match="manifest"):
        snapshot_index(str(tmp_path / "nothing"), str(tmp_path / "x"))


# ------------------------------------------------------------ interleaving

def _td_reference(a, b, qid, k=10, seed=42):
    """Pure-python team-draft replica over two doc lists."""
    from openmatch_spark.functions.hashing import md5_rank_py

    lists = {"A": list(a), "B": list(b)}
    picked, counts, out, pos = set(), {"A": 0, "B": 0}, [], 0
    while pos < k:
        pos += 1
        if counts["A"] < counts["B"]:
            pref = "A"
        elif counts["B"] < counts["A"]:
            pref = "B"
        else:
            u = int(md5_rank_py(qid, pos, seed=seed)[:8], 16) / 4294967296.0
            pref = "A" if u < 0.5 else "B"
        team = doc = None
        for t in (pref, "B" if pref == "A" else "A"):
            cand = [d for d in lists[t] if d not in picked]
            if cand:
                team, doc = t, cand[0]
                break
        if doc is None:
            break
        picked.add(doc)
        counts[team] += 1
        out.append((pos, doc, team))
    return out


def test_team_draft_matches_reference(spark):
    from openmatch_spark.operators.interleave import team_draft_interleave

    a_docs = ["d1", "d2", "d3", "d4"]
    b_docs = ["d3", "d5", "d1", "d6"]
    run_a = spark.createDataFrame(
        [("q", d, i + 1) for i, d in enumerate(a_docs)],
        "query_id string, doc_id string, rank int",
    )
    run_b = spark.createDataFrame(
        [("q", d, i + 1) for i, d in enumerate(b_docs)],
        "query_id string, doc_id string, rank int",
    )
    got = [
        (r["pos"], r["doc_id"], r["team"])
        for r in team_draft_interleave(run_a, run_b, k=10)
        .orderBy("pos").collect()
    ]
    assert got == _td_reference(a_docs, b_docs, "q")
    # every doc at most once, positions consecutive from 1
    assert len({d for _, d, _ in got}) == len(got)
    assert [p for p, _, _ in got] == list(range(1, len(got) + 1))
    # balanced attribution: |nA - nB| <= 1
    na = sum(1 for _, _, t in got if t == "A")
    assert abs(na - (len(got) - na)) <= 1


def test_interleave_credit(spark):
    from openmatch_spark.operators.interleave import interleave_credit

    inter = spark.createDataFrame(
        [("q", 1, "x", "A"), ("q", 2, "y", "B"), ("q", 3, "z", "A")],
        "query_id string, pos int, doc_id string, team string",
    )
    clicks = spark.createDataFrame(
        [("q", "x"), ("q", "z")], "query_id string, doc_id string"
    )
    row = interleave_credit(inter, clicks).collect()[0]
    assert (row["clicks_a"], row["clicks_b"], row["winner"]) == (2, 0, "A")
    # no clicks -> tie, zero counts (not absent)
    none = interleave_credit(
        inter, spark.createDataFrame([], "query_id string, doc_id string")
    ).collect()[0]
    assert (none["clicks_a"], none["clicks_b"], none["winner"]) == (0, 0, "tie")
