"""Round-4 additions: date_histogram facets and CombSUM/CombMNZ fusion."""

import datetime

import pyspark.sql.functions as F
import pytest

from openmatch_spark.operators.facets import NULL_BUCKET, date_histogram_facets
from openmatch_spark.operators.fusion import comb_fusion


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def hist_inputs(spark):
    docs = spark.createDataFrame(
        [
            ("d1", _ts("2024-01-03 10:00:00")),
            ("d2", _ts("2024-01-28 23:59:59")),
            ("d3", _ts("2024-02-01 00:00:00")),
            ("d4", _ts("2024-02-15 12:30:00")),
            ("d5", None),
        ],
        "doc_id string, warc_ts timestamp",
    )
    run = spark.createDataFrame(
        [("q1", "d1"), ("q1", "d2"), ("q1", "d3"), ("q1", "d5"),
         ("q2", "d4")],
        "query_id string, doc_id string",
    )
    return run, docs


def test_date_histogram_month(spark, hist_inputs):
    run, docs = hist_inputs
    out = date_histogram_facets(run, docs, "warc_ts", "month")
    rows = {(r.query_id, r.bucket): r.n_docs for r in out.collect()}
    assert rows == {
        ("q1", "2024-01-01 00:00:00"): 2,
        ("q1", "2024-02-01 00:00:00"): 1,
        ("q1", NULL_BUCKET): 1,
        ("q2", "2024-02-01 00:00:00"): 1,
    }
    assert out.columns == ["query_id", "facet", "bucket", "n_docs"]
    assert {r.facet for r in out.collect()} == {"warc_ts"}


def test_date_histogram_day_and_week(spark, hist_inputs):
    run, docs = hist_inputs
    day = date_histogram_facets(run, docs, "warc_ts", "day")
    rows = {(r.query_id, r.bucket) for r in day.collect()}
    assert ("q1", "2024-01-03 00:00:00") in rows
    assert ("q2", "2024-02-15 00:00:00") in rows
    # ISO Monday-start weeks: 2024-01-03 is a Wednesday -> week of Jan 1
    week = date_histogram_facets(run, docs, "warc_ts", "week")
    wrows = {(r.query_id, r.bucket) for r in week.collect()}
    assert ("q1", "2024-01-01 00:00:00") in wrows


def test_date_histogram_rejects_unknown_interval(spark, hist_inputs):
    run, docs = hist_inputs
    with pytest.raises(ValueError, match="interval"):
        date_histogram_facets(run, docs, "warc_ts", "fortnight")


@pytest.fixture(scope="module")
def fusion_runs(spark):
    # run A: scores 10..6 for q1; run B overlaps on d2/d3 only
    a = spark.createDataFrame(
        [("q1", "d1", 10.0, 1), ("q1", "d2", 8.0, 2), ("q1", "d3", 6.0, 3)],
        "query_id string, doc_id string, score double, rank int",
    )
    b = spark.createDataFrame(
        [("q1", "d3", 2.0, 1), ("q1", "d2", 1.0, 2), ("q1", "d9", 0.5, 3)],
        "query_id string, doc_id string, score double, rank int",
    )
    return a, b


def test_combsum_hand_math(spark, fusion_runs):
    a, b = fusion_runs
    out = comb_fusion([a, b], k=10, method="sum").collect()
    got = {r.doc_id: (r.score, r.rank) for r in out}
    # minmax A: d1=1.0, d2=0.5, d3=0.0 ; minmax B: d3=1.0, d2=1/3, d9=0.0
    assert got["d1"] == (1.0, 1)
    assert got["d3"] == (1.0, 2)  # tie with d1 broken by doc_id
    assert got["d2"] == (round(0.5 + 1 / 3, 6), 3)
    assert got["d9"] == (0.0, 4)


def test_combmnz_multiplies_by_match_count(spark, fusion_runs):
    a, b = fusion_runs
    out = {r.doc_id: r.score for r in comb_fusion([a, b], method="mnz").collect()}
    # d2 appears in both runs -> 2x its sum; d1/d9 single-run -> 1x
    assert out["d2"] == round(2 * (0.5 + 1 / 3), 6)
    assert out["d1"] == 1.0
    assert out["d9"] == 0.0
    # mnz promotes the doubly-retrieved d2 above the single-run d3
    ranks = {r.doc_id: r.rank for r in comb_fusion([a, b], method="mnz").collect()}
    assert ranks["d2"] < ranks["d3"] or out["d2"] > 1.0


def test_comb_degenerate_run_normalizes_to_one(spark):
    solo = spark.createDataFrame(
        [("q1", "d1", 42.0, 1)],
        "query_id string, doc_id string, score double, rank int",
    )
    flat = spark.createDataFrame(
        [("q1", "d1", 5.0, 1), ("q1", "d2", 5.0, 2)],
        "query_id string, doc_id string, score double, rank int",
    )
    assert comb_fusion([solo]).collect()[0].score == 1.0
    got = {r.doc_id: r.score for r in comb_fusion([flat]).collect()}
    assert got == {"d1": 1.0, "d2": 1.0}


def test_comb_depth_cap_and_validation(spark, fusion_runs):
    a, b = fusion_runs
    capped = comb_fusion([a, b], depth=2)
    assert {r.doc_id for r in capped.collect()} == {"d1", "d2", "d3"}
    with pytest.raises(ValueError, match="method"):
        comb_fusion([a], method="max")
    with pytest.raises(ValueError, match="at least one"):
        comb_fusion([])


# ---------------------------------------------------------------------------
# Ordered proximity (span_near in_order) vs a brute-force reference
# ---------------------------------------------------------------------------

import itertools
import re
import tempfile


def _tok(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


SPAN_DOCS = [
    ("doc://0", "spark hash join beats sort merge join on small tables"),
    ("doc://1", "the hash join and the sort merge join"),
    ("doc://2", "spark spark spark hash hash join"),
    ("doc://3", "merge sort is not sort merge"),
    ("doc://4", "join hash spark"),
    ("doc://5", "window functions rank rows per partition"),
    ("doc://6", ""),
]
SPAN_CORPUS = {u: _tok(t) for u, t in SPAN_DOCS}


def _min_window_ordered(toks, seq):
    """Brute-force minimum ordered-window reference (exhaustive over all
    strictly-increasing slot assignments — fine at this corpus size)."""
    if not seq:
        return None
    cand = [[i for i, t in enumerate(toks) if t == s] for s in seq]
    if any(not c for c in cand):
        return None
    best = None
    for combo in itertools.product(*cand):
        if all(combo[i] > combo[i - 1] for i in range(1, len(combo))):
            w = combo[-1] - combo[0] + 1
            best = w if best is None or w < best else best
    return best


@pytest.fixture(scope="module")
def span_index(spark):
    from openmatch_spark.index import build_index, build_positions, load_index

    pages = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in SPAN_DOCS],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    d = tempfile.mkdtemp(prefix="om_span_idx_")
    build_index(spark, pages, d, analyzer="simple", num_shards=2,
                num_term_buckets=4, block_size=4)
    build_positions(spark, pages, d)
    return load_index(spark, d)


SPAN_QUERIES = [
    ("a", "spark join"),     # order matters: doc4 'join hash spark' must NOT match
    ("b", "join spark"),     # ...and DOES match here
    ("c", "sort merge"),
    ("d", "spark spark"),    # duplicate tokens need two occurrences
    ("e", "hash join tables"),
    ("f", "nosuchterm join"),
]


@pytest.mark.parametrize("within", [2, 3, 6, 10])
def test_span_near_matches_reference(spark, span_index, within):
    from openmatch_spark.query import search_span_near

    q = spark.createDataFrame(SPAN_QUERIES, "query_id string, text string")
    out = search_span_near(span_index, q, within=within, k=20).collect()
    for qid, text in SPAN_QUERIES:
        expect = {
            u: w
            for u, toks in SPAN_CORPUS.items()
            if (w := _min_window_ordered(toks, _tok(text))) is not None
            and w <= within
        }
        got = {r["doc_id"]: r["min_window"] for r in out if r["query_id"] == qid}
        assert got == expect, (qid, within)


def test_span_near_order_sensitivity(spark, span_index):
    from openmatch_spark.query import search_span_near

    q = spark.createDataFrame(
        [("a", "spark join"), ("b", "join spark")],
        "query_id string, text string",
    )
    got = {
        (r["query_id"], r["doc_id"])
        for r in search_span_near(span_index, q, within=10, k=20).collect()
    }
    assert ("a", "doc://4") not in got       # 'join hash spark': wrong order
    assert ("b", "doc://4") in got
    assert ("a", "doc://0") in got
    assert ("b", "doc://0") not in got       # no spark after a join in doc0


def test_span_near_distributed_branch_identity(spark, span_index):
    from openmatch_spark.query import search_span_near

    q = spark.createDataFrame(SPAN_QUERIES, "query_id string, text string")
    a = search_span_near(span_index, q, within=6, k=20)
    b = search_span_near(span_index, q, within=6, k=20, distributed_threshold=0)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) > 0


# ---------------------------------------------------------------------------
# hit_cardinality (ES cardinality agg) + cap_per_group (per-host cap)
# ---------------------------------------------------------------------------

import hashlib


def test_hit_cardinality_exact_and_null_semantics(spark):
    from openmatch_spark.query import hit_cardinality

    docs = spark.createDataFrame(
        [("d1", "en", "a.com"), ("d2", "en", "b.com"),
         ("d3", "de", None), ("d4", "fr", "a.com")],
        "doc_id string, lang string, host string",
    )
    run = spark.createDataFrame(
        [("q1", "d1"), ("q1", "d2"), ("q1", "d3"),
         ("q2", "d3"), ("q2", "d4")],
        "query_id string, doc_id string",
    )
    out = {
        (r.query_id, r.facet): r.cardinality
        for r in hit_cardinality(run, docs, ["lang", "host"]).collect()
    }
    # q1: langs {en, de} -> 2; hosts {a.com, b.com} (d3 NULL excluded) -> 2
    # q2: langs {de, fr} -> 2; hosts {a.com} -> 1
    assert out == {
        ("q1", "lang"): 2, ("q1", "host"): 2,
        ("q2", "lang"): 2, ("q2", "host"): 1,
    }
    with pytest.raises(ValueError, match="at least one"):
        hit_cardinality(run, docs, [])


def test_hit_cardinality_approx_close(spark):
    from openmatch_spark.query import hit_cardinality

    docs = spark.createDataFrame(
        [(f"d{i}", f"v{i % 40}") for i in range(200)],
        "doc_id string, attr string",
    )
    run = spark.createDataFrame(
        [("q1", f"d{i}") for i in range(200)], "query_id string, doc_id string"
    )
    exact = hit_cardinality(run, docs, ["attr"]).collect()[0].cardinality
    approx = hit_cardinality(run, docs, ["attr"], approx=True).collect()[0].cardinality
    assert exact == 40
    assert abs(approx - 40) <= 8  # HLL++ at rsd=0.05 is far tighter than this


def _py_u(doc_id, seed=42):
    h = hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) / 2**32


def test_cap_per_group_matches_python_replica(spark):
    from openmatch_spark.operators.sampling import cap_per_group

    rows = [(f"d{i}", f"g{i % 3}") for i in range(30)] + [("dx", None)]
    df = spark.createDataFrame(rows, "doc_id string, grp string")
    out = cap_per_group(df, "grp", n=4).collect()
    got = {(r.doc_id, r.grp, r.sample_rank) for r in out}
    # python replica: per group, sort by (u, doc_id), take 4
    expect = set()
    groups = {}
    for d, g in rows:
        groups.setdefault(g, []).append(d)
    for g, ds in groups.items():
        picked = sorted(ds, key=lambda d: (_py_u(d), d))[:4]
        for i, d in enumerate(picked, 1):
            expect.add((d, g, i))
    assert got == expect
    # NULL group forms its own capped group (1 row here)
    assert ("dx", None, 1) in got


def test_cap_per_group_unbiased_and_deterministic(spark):
    from openmatch_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(f"d{i}", "g") for i in range(100)], "doc_id string, grp string"
    )
    a = {r.doc_id for r in cap_per_group(df, "grp", n=10).collect()}
    b = {r.doc_id for r in cap_per_group(df.repartition(7), "grp", n=10).collect()}
    assert a == b and len(a) == 10          # partitioning-invariant
    c = {r.doc_id for r in cap_per_group(df, "grp", n=10, seed=7).collect()}
    assert c != a                            # seed actually steers the draw
    with pytest.raises(ValueError, match="positive"):
        cap_per_group(df, "grp", n=0)


# ---------------------------------------------------------------------------
# highlight_fragments (ES highlighter) vs a pure-python greedy reference
# ---------------------------------------------------------------------------


def _py_highlight(toks, qts, width, n_frags):
    """Greedy reference: candidate starts = occurrence positions; score =
    distinct query terms in [start, start+width); pick best (score desc,
    start asc), drop overlapping candidates, repeat."""
    occ = [i for i, t in enumerate(toks) if t in qts]
    cands = {
        s: len({toks[i] for i in occ if s <= i < s + width}) for s in occ
    }
    picks = []
    avail = dict(cands)
    for _ in range(n_frags):
        if not avail:
            break
        s = min(avail, key=lambda x: (-avail[x], x))
        picks.append((s, avail[s]))
        avail = {x: v for x, v in avail.items() if abs(x - s) >= width}
    return picks


def test_highlight_fragments_reference_and_marking(spark):
    from openmatch_spark.operators.snippets import highlight_fragments

    docs = [
        ("d1", "alpha beta gamma delta alpha beta zeta eta theta beta alpha"),
        ("d2", "nothing relevant here at all"),
        ("d3", "alpha alpha alpha"),
    ]
    corpus = spark.createDataFrame(docs, "doc_id string, text string")
    run = spark.createDataFrame(
        [("q1", "d1"), ("q1", "d2"), ("q1", "d3")],
        "query_id string, doc_id string",
    )
    queries = spark.createDataFrame(
        [("q1", "alpha beta")], "query_id string, text string"
    )
    out = highlight_fragments(
        corpus, run, queries, width=4, n_fragments=2
    ).collect()
    got = {
        (r.doc_id, r.frag_idx): (r.start, r.n_hit_terms, r.fragment)
        for r in out
    }
    for doc_id, text in docs:
        toks = text.split()
        expect = _py_highlight(toks, {"alpha", "beta"}, 4, 2)
        for i, (s, nh) in enumerate(expect, 1):
            st, gn, frag = got[(doc_id, i)]
            assert (st, gn) == (s, nh), (doc_id, i)
            # fragment text is the sliced window with query terms tagged
            want = " ".join(
                f"<em>{t}</em>" if t in {"alpha", "beta"} else t
                for t in toks[s : s + 4]
            )
            assert frag == want, (doc_id, i)
        assert (doc_id, len(expect) + 1) not in got
    # d2 (no occurrences) emits nothing — ES omits non-matching docs
    assert not any(d == "d2" for d, _ in got)


def test_highlight_fragments_non_overlap_and_validation(spark):
    from openmatch_spark.operators.snippets import highlight_fragments

    corpus = spark.createDataFrame(
        [("d1", " ".join(["x"] * 3 + ["hit"] + ["x"] * 3 + ["hit"] + ["x"] * 3))],
        "doc_id string, text string",
    )
    run = spark.createDataFrame([("q1", "d1")], "query_id string, doc_id string")
    queries = spark.createDataFrame([("q1", "hit")], "query_id string, text string")
    out = highlight_fragments(corpus, run, queries, width=5, n_fragments=3).collect()
    starts = sorted(r.start for r in out)
    assert starts == [3]  # second occurrence at 7 overlaps [3, 8) window
    with pytest.raises(ValueError, match="positive"):
        highlight_fragments(corpus, run, queries, n_fragments=0)


# ---------------------------------------------------------------------------
# rescore_window (ES rescore)
# ---------------------------------------------------------------------------


def test_rescore_window_semantics(spark):
    from openmatch_spark.operators.fusion import rescore_window

    run = spark.createDataFrame(
        [("q1", "d1", 10.0, 1), ("q1", "d2", 9.0, 2), ("q1", "d3", 8.0, 3),
         ("q1", "d4", 7.0, 4), ("q1", "d5", 6.0, 5)],
        "query_id string, doc_id string, score double, rank int",
    )
    # rescorer loves d3, ignores d1 (no row) and everything below the window
    rs = spark.createDataFrame(
        [("q1", "d3", 5.0), ("q1", "d2", 0.5), ("q1", "d5", 99.0)],
        "query_id string, doc_id string, score double",
    )
    out = rescore_window(run, rs, window_size=3, k=10).collect()
    got = {r.doc_id: (r.score, r.rank, r.in_window) for r in out}
    # window: d3 = 8+5 = 13 beats d1 = 10+0 beats d2 = 9.5
    assert got["d3"] == (13.0, 1, True)
    assert got["d1"] == (10.0, 2, True)
    assert got["d2"] == (9.5, 3, True)
    # below-window docs keep score AND original order, after the window —
    # even though the rescorer scored d5 huge (ES: window only)
    assert got["d4"] == (7.0, 4, False)
    assert got["d5"] == (6.0, 5, False)


def test_rescore_window_weights_and_validation(spark):
    from openmatch_spark.operators.fusion import rescore_window

    run = spark.createDataFrame(
        [("q1", "d1", 4.0, 1), ("q1", "d2", 3.0, 2)],
        "query_id string, doc_id string, score double, rank int",
    )
    rs = spark.createDataFrame(
        [("q1", "d2", 10.0)], "query_id string, doc_id string, score double"
    )
    out = {
        r.doc_id: r.score
        for r in rescore_window(
            run, rs, window_size=2, query_weight=0.5, rescore_weight=0.1
        ).collect()
    }
    assert out == {"d1": 2.0, "d2": 2.5}
    with pytest.raises(ValueError, match="window_size"):
        rescore_window(run, rs, window_size=0)


# ---------------------------------------------------------------------------
# RBP@k
# ---------------------------------------------------------------------------


def test_rbp_hand_math(spark):
    from openmatch_spark.operators.metrics import rbp_at_k

    run = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3),
         ("q2", "d1", 1)],
        "query_id string, doc_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", "d1", 2), ("q1", "d3", 1), ("q2", "dX", 1)],
        "query_id string, doc_id string, rel int",
    )
    out = {r.query_id: (r.rbp, r.rbp_residual) for r in rbp_at_k(run, qrels, k=3, p=0.5).collect()}
    # q1: rel at ranks 1 and 3 -> 0.5 * (0.5^0 + 0.5^2) = 0.625; residual 0.5^3
    assert out["q1"] == (0.625, 0.125)
    # q2: nothing relevant retrieved -> 0
    assert out["q2"] == (0.0, 0.125)
    with pytest.raises(ValueError, match="p must be"):
        rbp_at_k(run, qrels, k=3, p=1.0)
    with pytest.raises(ValueError, match="k must be"):
        rbp_at_k(run, qrels, k=0)


# ---------------------------------------------------------------------------
# Product quantization vs a numpy reference of the same algorithm
# ---------------------------------------------------------------------------

import numpy as np


def _pq_ref(vecs, ids, m, ksub, iters, sub, seed=42, r=6):
    """Pure-python replica of pq_train/pq_encode: md5 bucket init,
    rounded means, rounded distances, cid tie-break."""
    def bucket(i):
        h = hashlib.md5(f"{seed}|{i}".encode()).hexdigest()
        return int(h[:8], 16) % ksub

    subv = {(i, j): np.array(vecs[n][j * sub:(j + 1) * sub])
            for n, i in enumerate(ids) for j in range(m)}
    assign = {(i, j): bucket(i) for i in ids for j in range(m)}
    def means():
        cents = {}
        for j in range(m):
            for c in range(ksub):
                mem = [subv[(i, j)] for i in ids if assign[(i, j)] == c]
                if mem:
                    cents[(j, c)] = np.round(np.mean(mem, axis=0), r)
        return cents
    def reassign():
        for i in ids:
            for j in range(m):
                ds = sorted(
                    (round(float(((subv[(i, j)] - v) ** 2).sum()), r), c)
                    for (jj, c), v in cents.items() if jj == j
                )
                assign[(i, j)] = ds[0][1]

    cents = means()
    for _ in range(iters):
        reassign()
        cents = means()
    # the encode step assigns against the FINAL codebook
    reassign()
    return cents, assign


@pytest.fixture(scope="module")
def pq_data(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 8)).round(3)
    ids = [str(i) for i in range(60)]
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in zip(ids, vecs)],
        "vec_id string, embedding array<double>",
    )
    return df, vecs, ids


def test_pq_train_encode_match_reference(spark, pq_data):
    from openmatch_spark.query.pq import pq_encode, pq_train

    df, vecs, ids = pq_data
    m, ksub, sub = 2, 4, 4
    cents = pq_train(df, m=m, ksub=ksub, iters=1)
    codes = pq_encode(df, cents)
    ref_cents, ref_assign = _pq_ref(vecs, ids, m, ksub, 1, sub)
    got_c = {(r.j, r.cid): np.array(r.centroid) for r in cents.collect()}
    assert set(got_c) == set(ref_cents)
    for key in ref_cents:
        assert np.allclose(got_c[key], ref_cents[key], atol=1e-9), key
    got_a = {(r.vec_id, r.j): r.code for r in codes.collect()}
    assert got_a == ref_assign


def test_pq_topk_exact_rescore_and_recall(spark, pq_data):
    from openmatch_spark.query.pq import pq_encode, pq_topk, pq_train

    df, vecs, ids = pq_data
    cents = pq_train(df, m=2, ksub=4, iters=1)
    codes = pq_encode(df, cents)
    queries = df.limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq_topk(queries, codes, cents, df, k=5, rescore_factor=4)
    rows = out.collect()
    byq = {}
    for r in rows:
        byq.setdefault(r.query_id, []).append(r)
    qvecs = {i: v for i, v in zip(ids, vecs)}
    for qid, rs in byq.items():
        # reported scores are EXACT dots of the survivors
        for r in rs:
            assert abs(r.score - round(float(qvecs[qid] @ qvecs[r.vec_id]), 6)) < 1e-9
        # ranks dense from 1
        assert sorted(r.rank for r in rs) == list(range(1, len(rs) + 1))
    # with an exhaustive candidate cut the two-phase path IS brute force
    full = pq_topk(queries, codes, cents, df, k=5, rescore_factor=20).collect()
    fbyq = {}
    for r in full:
        fbyq.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    for qid, rs in fbyq.items():
        truth = sorted(
            ids, key=lambda d: (-round(float(qvecs[qid] @ qvecs[d]), 6), d)
        )[:5]
        assert [v for _, v in sorted(rs)] == truth, qid
    # brute-force recall@5 of the two-phase path is decent even at ksub=4
    hits = tot = 0
    for qid in byq:
        truth = sorted(
            ids, key=lambda d: (-round(float(qvecs[qid] @ qvecs[d]), 6), d)
        )[:5]
        got5 = {r.vec_id for r in byq[qid]}
        hits += len(got5 & set(truth)); tot += 5
    assert hits / tot >= 0.5


def test_pq_validation(spark, pq_data):
    from openmatch_spark.query.pq import pq_train

    df, _, _ = pq_data
    with pytest.raises(ValueError, match="divisible"):
        pq_train(df, m=3, ksub=4)
    with pytest.raises(ValueError, match="positive"):
        pq_train(df, m=0, ksub=4)


# ---------------------------------------------------------------------------
# Static index pruning (compact_index(prune_keep_per_term=))
# ---------------------------------------------------------------------------


def _decode_all(idx):
    from openmatch_spark.index.compact import _decode_blocks_arrow

    return (
        idx.postings.mapInArrow(
            _decode_blocks_arrow,
            "shard int, term string, term_bucket int, doc_ord long, weight double",
        )
        .join(idx.docmap.select("shard", "doc_ord", "doc_id"), ["shard", "doc_ord"])
        .select("term", "doc_id", "weight")
        .collect()
    )


def test_prune_keeps_global_top_n_per_term(spark):
    from openmatch_spark.index import build_index, compact_index, load_index

    pages = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in SPAN_DOCS],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    d = tempfile.mkdtemp(prefix="om_prune_")
    build_index(spark, pages, d, analyzer="simple", num_shards=2,
                num_term_buckets=4, block_size=4)
    before = _decode_all(load_index(spark, d))
    res = compact_index(spark, d, prune_keep_per_term=2)
    assert res["new_shard"] >= 2
    after = _decode_all(load_index(spark, d))
    # python replica: per term keep top-2 by (round(w,6) DESC, doc_id ASC)
    byterm = {}
    for r in before:
        byterm.setdefault(r.term, []).append((round(r.weight, 6), r.doc_id, r.weight))
    expect = set()
    for term, rows in byterm.items():
        rows.sort(key=lambda x: (-x[0], x[1]))
        for w6, doc, w in rows[:2]:
            expect.add((term, doc, round(w, 9)))
    got = {(r.term, r.doc_id, round(r.weight, 9)) for r in after}
    assert got == expect
    # weights are untouched for survivors (Carmel: no rescoring)
    assert all(c <= 2 for c in
               __import__("collections").Counter(t for t, _, _ in got).values())


def test_prune_guards(spark):
    from openmatch_spark.index import build_index, compact_index

    pages = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in SPAN_DOCS],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    d = tempfile.mkdtemp(prefix="om_prune_g_")
    build_index(spark, pages, d, analyzer="simple", num_shards=3,
                num_term_buckets=4, block_size=4)
    with pytest.raises(ValueError, match="ALL committed shards"):
        compact_index(spark, d, shards=[0, 1], prune_keep_per_term=2)
    with pytest.raises(ValueError, match="positive"):
        compact_index(spark, d, prune_keep_per_term=0)
    # pruning an ALREADY single-segment index is a meaningful rewrite
    compact_index(spark, d, prune_keep_per_term=3)
    compact_index(spark, d, prune_keep_per_term=2)


def test_prune_search_rare_terms_unaffected(spark):
    from openmatch_spark.index import build_index, compact_index, load_index
    from openmatch_spark.query import search

    pages = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in SPAN_DOCS],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    d = tempfile.mkdtemp(prefix="om_prune_s_")
    build_index(spark, pages, d, analyzer="simple", num_shards=2,
                num_term_buckets=4, block_size=4)
    q = spark.createDataFrame(
        [("r", "beats"), ("f", "join")], "query_id string, text string"
    )
    pre = {(r.query_id, r.doc_id, round(r.score, 6))
           for r in search(load_index(spark, d), q, k=20).collect()}
    compact_index(spark, d, prune_keep_per_term=2)
    idx = load_index(spark, d)
    post = {(r.query_id, r.doc_id, round(r.score, 6))
            for r in search(idx, q, k=20).collect()}
    # 'beats' occurs once (df=1 <= keep) -> its result rows identical
    assert {x for x in pre if x[0] == "r"} == {x for x in post if x[0] == "r"}
    # 'join' (df=4): survivors are a subset with unchanged scores
    fpre = {x for x in pre if x[0] == "f"}
    fpost = {x for x in post if x[0] == "f"}
    assert fpost < fpre and len(fpost) == 2


# ---------------------------------------------------------------------------
# MAP@k
# ---------------------------------------------------------------------------


def test_map_hand_math(spark):
    from openmatch_spark.operators.metrics import map_at_k, map_at_k_per_query

    run = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3), ("q1", "d4", 4),
         ("q2", "d1", 1)],
        "query_id string, doc_id string, rank int",
    )
    # q1: relevant at ranks 1, 3; R = 3 (one judged doc never retrieved)
    # AP = (1/1 + 2/3) / 3 = 0.555556
    qrels = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d3", 1), ("q1", "dZ", 1), ("q2", "dX", 1)],
        "query_id string, doc_id string, rel int",
    )
    per = {r.query_id: r.ap for r in map_at_k_per_query(run, qrels, k=10).collect()}
    assert per["q1"] == round((1.0 + 2 / 3) / 3, 6)
    assert per["q2"] == 0.0  # judged query, nothing relevant retrieved
    agg = map_at_k(run, qrels, k=10).collect()[0]
    assert agg.n_queries == 2
    assert abs(agg["map"] - (per["q1"] + per["q2"]) / 2) < 1e-9
    # k cuts the sum: at k=1 only the rank-1 hit counts
    per1 = {r.query_id: r.ap for r in map_at_k_per_query(run, qrels, k=1).collect()}
    assert per1["q1"] == round(1.0 / 3, 6)
    with pytest.raises(ValueError, match="k must be"):
        map_at_k_per_query(run, qrels, k=0)


# ---------------------------------------------------------------------------
# field_value_factor (ES function_score)
# ---------------------------------------------------------------------------


def test_field_value_factor_modes(spark):
    import math

    from openmatch_spark.query import field_value_factor_rescore

    run = spark.createDataFrame(
        [("q1", "d1", 2.0), ("q1", "d2", 3.0), ("q1", "d3", 1.0)],
        "query_id string, doc_id string, score double",
    )
    docs = spark.createDataFrame(
        [("d1", 100.0), ("d2", 0.0), ("d3", None)],
        "doc_id string, views double",
    )
    out = {
        r.doc_id: r.score
        for r in field_value_factor_rescore(
            run, docs, "views", factor=0.1, modifier="log1p",
            missing=0.0, boost_mode="multiply",
        ).collect()
    }
    assert out["d1"] == round(2.0 * math.log1p(10.0), 6)
    assert out["d2"] == 0.0           # log1p(0) = 0 -> multiply kills it
    assert out["d3"] == 0.0           # missing -> 0.0 field value
    plus = {
        r.doc_id: r.score
        for r in field_value_factor_rescore(
            run, docs, "views", factor=0.1, modifier="log1p",
            missing=0.0, boost_mode="sum",
        ).collect()
    }
    assert plus["d2"] == 3.0 and plus["d3"] == 1.0
    with pytest.raises(ValueError, match="modifier"):
        field_value_factor_rescore(run, docs, "views", modifier="exp")
    with pytest.raises(ValueError, match="boost_mode"):
        field_value_factor_rescore(run, docs, "views", boost_mode="max")


def test_field_value_factor_rejects_undefined(spark):
    from openmatch_spark.query import field_value_factor_rescore

    run = spark.createDataFrame(
        [("q1", "d1", 2.0)], "query_id string, doc_id string, score double"
    )
    docs = spark.createDataFrame([("d1", -5.0)], "doc_id string, v double")
    with pytest.raises(ValueError, match="undefined"):
        field_value_factor_rescore(run, docs, "v", modifier="sqrt").collect()


# ---------------------------------------------------------------------------
# terms_facets (ES terms aggregation with sum_other_doc_count)
# ---------------------------------------------------------------------------


def test_terms_facets_top_and_other(spark):
    from openmatch_spark.operators.facets import OTHER_BUCKET, terms_facets

    docs = spark.createDataFrame(
        [(f"d{i}", f"v{i % 4}") for i in range(10)] + [("dn", None)],
        "doc_id string, src string",
    )
    run = spark.createDataFrame(
        [("q1", f"d{i}") for i in range(10)] + [("q1", "dn")],
        "query_id string, doc_id string",
    )
    out = terms_facets(run, docs, ["src"], size=2).collect()
    top = {(r.value, r.n_docs, r.pos) for r in out if r.pos is not None}
    # counts: v0=3,v1=3,v2=2,v3=2,(null)=1 -> top2 = v0,v1 (count desc, value asc)
    assert top == {("v0", 3, 1), ("v1", 3, 2)}
    other = [r for r in out if r.pos is None]
    assert len(other) == 1 and other[0].value == OTHER_BUCKET
    assert other[0].n_docs == 2 + 2 + 1  # v2 + v3 + (null)
    # no tail -> no other row
    out8 = terms_facets(run, docs, ["src"], size=8).collect()
    assert not any(r.pos is None for r in out8)
    with pytest.raises(ValueError, match="size"):
        terms_facets(run, docs, ["src"], size=0)


# ---------------------------------------------------------------------------
# maintain_index(rebuild_positions_from=) — sidecar survives the cycle
# ---------------------------------------------------------------------------


def test_maintain_rebuilds_positions(spark, tmp_path):
    import os

    from openmatch_spark.index import build_index, build_positions, load_index
    from openmatch_spark.query import search_phrase
    from openmatch_spark.streaming.incremental import maintain_index

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    base = [(u, None, None, t, "en") for u, t in SPAN_DOCS if t]
    new = [("doc://new", None, None, "a brand new quick brown fox page", "en")]
    idx_dir, watch, ckpt = (str(tmp_path / d) for d in ("idx", "in", "ckpt"))
    os.makedirs(watch)
    build_index(spark, spark.createDataFrame(base, schema), idx_dir,
                analyzer="simple", num_shards=2, num_term_buckets=4)
    build_positions(spark, spark.createDataFrame(base, schema), idx_dir)
    spark.createDataFrame(new, schema).write.parquet(watch + "/b1.parquet")

    full = spark.createDataFrame(base + new, schema)
    res = maintain_index(
        spark, watch, idx_dir, ckpt, rebaseline=True,
        rebuild_positions_from=full,
    )
    assert res["batches"] >= 1 and res["positions"] is not None

    idx = load_index(spark, idx_dir)
    q = spark.createDataFrame(
        [("p1", "quick brown fox"), ("p2", "sort merge join")],
        "query_id string, text string",
    )
    got = {(r.query_id, r.doc_id) for r in search_phrase(idx, q, k=10).collect()}
    assert ("p1", "doc://new") in got        # NEW doc phrase-searchable
    assert ("p2", "doc://0") in got          # old docs still covered


# ---------------------------------------------------------------------------
# LTR feature extraction
# ---------------------------------------------------------------------------


def test_ltr_features_consistent_with_scorers(spark):
    from openmatch_spark.operators.ltr import ltr_features
    from openmatch_spark.query.bm25_df import bm25_score_adhoc

    corpus = spark.createDataFrame(
        [(u.replace("doc://", ""), t) for u, t in SPAN_DOCS if t],
        "doc_id string, text string",
    )
    queries = spark.createDataFrame(
        [("q1", "hash join"), ("q2", "sort merge join")],
        "query_id string, text string",
    )
    feats = ltr_features(corpus, queries, k=5).collect()
    # bm25 feature == the ad-hoc BM25 scorer, and the candidate ranking
    ref = {
        (r.query_id, r.doc_id): (round(r.score, 6), r.rank)
        for r in bm25_score_adhoc(corpus, queries, k=5, analyzer="simple").collect()
    }
    got = {(r.query_id, r.doc_id): (r.bm25, r.rank) for r in feats}
    assert got == ref
    byrow = {(r.query_id, r.doc_id): r for r in feats}
    # doc0 'spark hash join beats sort merge join ...' matches both q1 terms
    r = byrow[("q1", "0")]
    assert r.n_matched == 2 and r.matched_qtf == 1.0
    assert r.doclen == 10.0 and r.qlen == 2.0
    assert r.qld_jm != r.qld_dir  # distinct scorer columns actually differ
    # doc3 'merge sort is not sort merge' matches only 2 of q2's 3 terms
    r3 = byrow[("q2", "3")]
    assert r3.n_matched == 2 and abs(r3.matched_qtf - 2 / 3) < 1e-6
    assert r3.sum_idf > 0
    with pytest.raises(ValueError, match="k must be"):
        ltr_features(corpus, queries, k=0)


# ---------------------------------------------------------------------------
# english_stop analyzer (Lucene classic stopword set) end-to-end
# ---------------------------------------------------------------------------


def test_english_stop_tokenizers_agree_and_drop(spark):
    from openmatch_spark.analysis import (
        LUCENE_ENGLISH_STOPWORDS,
        tokenize_col,
        tokenize_py,
    )

    texts = [
        "The quick brown fox and the lazy dog",
        "to be or not to be that is the question",
        "no stopwords here whatsoever",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r[0]
        for r in df.select(tokenize_col(F.col("text"), "english_stop")).collect()
    ]
    for t, g in zip(texts, got):
        assert g == tokenize_py(t, "english_stop"), t
        assert not set(g) & set(LUCENE_ENGLISH_STOPWORDS)
    assert got[0] == ["quick", "brown", "fox", "lazy", "dog"]


def test_english_stop_index_end_to_end(spark, tmp_path):
    from openmatch_spark.index import build_index, load_index
    from openmatch_spark.query import search

    pages = spark.createDataFrame(
        [
            ("doc://a", None, None, "the spark engine and the fast join", "en"),
            ("doc://b", None, None, "a join of the tables", "en"),
            ("doc://c", None, None, "nothing relevant", "en"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    d = str(tmp_path / "idx")
    build_index(spark, pages, d, analyzer="english_stop", num_shards=2,
                num_term_buckets=4)
    idx = load_index(spark, d)
    # query full of stopwords + one content term: stopwords drop at query
    # time too (frozen analyzer), so only 'join' matches
    q = spark.createDataFrame(
        [("q1", "the and of to join"), ("q2", "the and of")],
        "query_id string, text string",
    )
    out = search(idx, q, k=10).collect()
    assert {r.doc_id for r in out if r.query_id == "q1"} == {"doc://a", "doc://b"}
    assert not [r for r in out if r.query_id == "q2"]  # all-stopword query dies
    # 'the' contributed nothing to doclen either: idf table has no stopwords
    assert idx.dictionary.where(F.col("term") == "the").count() == 0
