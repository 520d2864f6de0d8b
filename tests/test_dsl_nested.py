"""Nested bool on the DSL front door (query/dsl.py item-composition
path): every expectation is composed in plain Python from single-leaf
runs of the ALREADY-VERIFIED flat path, so the nested executor is
checked against the engine's own leaf semantics, not a reimplementation."""

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmatch_spark.index import build_index, load_index
from openmatch_spark.query import search_dsl

DOCS = [
    # (url, text, lang)
    ("doc://0", "spark hash join beats sort merge join on small tables", "en"),
    ("doc://1", "the hash join and the sort merge join", "de"),
    ("doc://2", "spark spark spark hash hash join", "en"),
    ("doc://3", "merge sort is not sort merge", "fr"),
    ("doc://4", "join hash spark", "de"),
    ("doc://5", "window functions rank rows per partition", "en"),
    ("doc://6", "spark window merge", "fr"),
    ("doc://7", "hash window sort", "en"),
]


@pytest.fixture(scope="module")
def idx(spark):
    pages = spark.createDataFrame(
        [(u, None, None, t, lg) for u, t, lg in DOCS],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    d = tempfile.mkdtemp(prefix="om_dsl_nested_idx_")
    build_index(
        spark, pages, d, analyzer="simple", num_shards=2,
        num_term_buckets=4, block_size=4, store_attrs=["lang"],
    )
    return load_index(spark, d)


@pytest.fixture(scope="module")
def leaf(idx):
    """doc -> score maps for every single-term flat run used below."""
    out = {}
    for t in ("spark", "hash", "join", "merge", "window", "sort"):
        run = search_dsl(idx, {"q": {"match": {"text": t}}}, k=1000)
        out[t] = {r["doc_id"]: r["score"] for r in run.collect()}
    return out


LANG = {u: lg for u, _, lg in DOCS}


def _run(idx, q, k=1000):
    run = search_dsl(idx, {"q": q}, k=k)
    return {r["doc_id"]: r["score"] for r in run.collect()}


def _close(got, exp):
    assert set(got) == set(exp), (sorted(got), sorted(exp))
    for d in got:
        assert abs(got[d] - exp[d]) < 1e-9, (d, got[d], exp[d])


def test_nested_should_group_msm(idx, leaf):
    got = _run(idx, {"bool": {"should": [
        {"bool": {"should": [{"match": {"text": "spark"}},
                             {"match": {"text": "merge"}}],
                  "minimum_should_match": 2}},
        {"match": {"text": "window"}},
    ]}})
    s, m, w = leaf["spark"], leaf["merge"], leaf["window"]
    exp = {}
    for d in set(s) | set(m) | set(w):
        g = s[d] + m[d] if (d in s and d in m) else None
        l = w.get(d)
        if g is None and l is None:
            continue
        exp[d] = (g or 0.0) + (l or 0.0)
    _close(got, exp)


def test_nested_must_or_group(idx, leaf):
    got = _run(idx, {"bool": {
        "must": [{"bool": {"should": [{"match": {"text": "hash"}},
                                      {"match": {"text": "merge"}}]}}],
        "should": [{"match": {"text": "window"}}],
    }})
    h, m, w = leaf["hash"], leaf["merge"], leaf["window"]
    exp = {d: h.get(d, 0.0) + m.get(d, 0.0) + w.get(d, 0.0)
           for d in set(h) | set(m)}
    _close(got, exp)


def test_nested_must_not_and_group(idx, leaf):
    got = _run(idx, {"bool": {
        "should": [{"match": {"text": "window"}}],
        "must_not": [{"bool": {"must": [{"match": {"text": "spark"}},
                                        {"match": {"text": "hash"}}]}}],
    }})
    s, h, w = leaf["spark"], leaf["hash"], leaf["window"]
    exp = {d: v for d, v in w.items() if not (d in s and d in h)}
    _close(got, exp)


def test_nested_group_with_filter(idx, leaf):
    got = _run(idx, {"bool": {"should": [
        {"bool": {"should": [{"match": {"text": "spark"}}],
                  "filter": [{"term": {"lang": "en"}}]}},
        {"match": {"text": "merge"}},
    ]}})
    s, m = leaf["spark"], leaf["merge"]
    exp = {}
    for d in set(s) | set(m):
        g = s[d] if (d in s and LANG[d] == "en") else None
        l = m.get(d)
        if g is None and l is None:
            continue
        exp[d] = (g or 0.0) + (l or 0.0)
    _close(got, exp)


def test_must_not_filter_only_rewrite(idx, leaf):
    got = _run(idx, {"bool": {
        "should": [{"match": {"text": "join"}}],
        "must_not": [{"bool": {"filter": [{"term": {"lang": "en"}}]}}],
    }})
    exp = {d: v for d, v in leaf["join"].items() if LANG[d] != "en"}
    _close(got, exp)


def test_must_filter_only_rewrite_gates(idx, leaf):
    got = _run(idx, {"bool": {
        "must": [{"bool": {"filter": [{"term": {"lang": "de"}}]}}],
        "should": [{"bool": {"should": [{"match": {"text": "join"}}]}}],
    }})
    exp = {d: v for d, v in leaf["join"].items() if LANG[d] == "de"}
    _close(got, exp)


def test_depth_three(idx, leaf):
    got = _run(idx, {"bool": {"should": [
        {"bool": {"should": [
            {"bool": {"should": [{"match": {"text": "spark"}},
                                 {"match": {"text": "sort"}}],
                      "minimum_should_match": 2}},
            {"match": {"text": "window"}},
        ]}},
    ]}})
    s, o, w = leaf["spark"], leaf["sort"], leaf["window"]
    inner = {d: s[d] + o[d] for d in set(s) & set(o)}
    exp = {d: inner.get(d, 0.0) + w.get(d, 0.0) for d in set(inner) | set(w)}
    _close(got, exp)


def test_single_wrapped_leaf_equals_flat(idx):
    """A nested bool that only wraps one leaf must reproduce the flat
    run bit-identically (same executor, same weights)."""
    flat = search_dsl(idx, {"q": {"match": {"text": "hash join"}}}, k=1000)
    nested = search_dsl(idx, {"q": {"bool": {"should": [
        {"bool": {"should": [{"match": {"text": "hash join"}}]}},
    ]}}}, k=1000)
    assert sorted(map(tuple, flat.collect())) == \
        sorted(map(tuple, nested.collect()))


def test_mixed_batch_flat_and_nested(idx):
    run = search_dsl(idx, {
        "a": {"match": {"text": "spark"}},
        "b": {"bool": {"should": [
            {"bool": {"should": [{"match": {"text": "spark"}}]}},
        ]}},
    }, k=1000)
    rows = run.collect()
    a = sorted((r["doc_id"], round(r["score"], 9), r["rank"])
               for r in rows if r["query_id"] == "a")
    b = sorted((r["doc_id"], round(r["score"], 9), r["rank"])
               for r in rows if r["query_id"] == "b")
    assert a == b and a


def test_zero_root_page_after_rewrites(idx):
    """must: filter-only bool + top filter with no scoring clause left:
    the flat path's zero-score page semantics (first k by doc_id)."""
    run = search_dsl(idx, {"q": {"bool": {
        "must": [{"bool": {"filter": [{"term": {"lang": "en"}}]}}],
    }}}, k=2).collect()
    assert [(r["doc_id"], r["score"], r["rank"]) for r in
            sorted(run, key=lambda r: r["rank"])] == [
        ("doc://0", 0.0, 1), ("doc://2", 0.0, 2)]


def test_dead_must_inside_group(idx, leaf):
    """A vocabulary-missing must INSIDE a nested group kills the group,
    not the whole query."""
    got = _run(idx, {"bool": {"should": [
        {"bool": {"must": [{"match": {"text": "spark"}},
                           {"term": {"text": "zzzmissing"}}]}},
        {"match": {"text": "window"}},
    ]}})
    _close(got, leaf["window"])


def test_validation(idx):
    with pytest.raises(ValueError, match="refused"):
        search_dsl(idx, {"q": {"bool": {"should": [
            {"bool": {"filter": [{"term": {"lang": "en"}}]}},
        ]}}}, k=5)
    with pytest.raises(ValueError, match="negation"):
        search_dsl(idx, {"q": {"bool": {"must_not": [
            {"bool": {"filter": [{"term": {"lang": "en"}}]}},
        ]}}}, k=5)
    with pytest.raises(ValueError, match="analyzes to"):
        search_dsl(idx, {"q": {"bool": {"should": [
            {"bool": {"should": [{"term": {"text": "two words"}}]}},
        ]}}}, k=5)
    with pytest.raises(ValueError, match="U\\+001E"):
        search_dsl(idx, {"q\x1e0": {"bool": {"should": [
            {"bool": {"should": [{"match": {"text": "spark"}}]}},
        ]}}}, k=5)


def test_constant_score_top_level(idx):
    run = search_dsl(idx, {"q": {"constant_score": {
        "filter": {"term": {"lang": "en"}}, "boost": 2.5}}}, k=3).collect()
    en = sorted(u for u, lg in LANG.items() if lg == "en")[:3]
    got = [(r["doc_id"], r["score"]) for r in sorted(run, key=lambda r: r["rank"])]
    assert got == [(d, 2.5) for d in en]


def test_match_all_top_level(idx):
    run = search_dsl(idx, {"q": {"match_all": {"boost": 1.5}}}, k=4).collect()
    got = [(r["doc_id"], r["score"]) for r in sorted(run, key=lambda r: r["rank"])]
    assert got == [(d, 1.5) for d in sorted(LANG)[:4]]


def test_constant_score_must_gate_and_bonus(idx, leaf):
    got = _run(idx, {"bool": {
        "must": [{"constant_score": {"filter": {"term": {"lang": "en"}},
                                     "boost": 3.0}}],
        "should": [{"match": {"text": "join"}}],
    }})
    exp = {d: s + 3.0 for d, s in leaf["join"].items() if LANG[d] == "en"}
    _close(got, exp)


def test_constant_score_must_not_excludes(idx, leaf):
    got = _run(idx, {"bool": {
        "should": [{"match": {"text": "join"}}],
        "must_not": [{"constant_score": {"filter": {"term": {"lang": "de"}},
                                         "boost": 9.0}}],
    }})
    exp = {d: s for d, s in leaf["join"].items() if LANG[d] != "de"}
    _close(got, exp)


def test_match_all_must_bonus(idx, leaf):
    got = _run(idx, {"bool": {
        "must": [{"match_all": {"boost": 0.5}}],
        "should": [{"match": {"text": "window"}}],
    }})
    exp = {d: s + 0.5 for d, s in leaf["window"].items()}
    _close(got, exp)


def test_constant_score_validation(idx):
    with pytest.raises(ValueError, match="refused"):
        search_dsl(idx, {"q": {"bool": {"should": [
            {"constant_score": {"filter": {"term": {"lang": "en"}}}},
        ]}}}, k=5)
    with pytest.raises(ValueError, match="only composes"):
        search_dsl(idx, {"q": {"bool": {
            "should": [{"match_all": {}}],
            "must": [{"match": {"text": "spark"}}],
        }}}, k=5)
    with pytest.raises(ValueError, match="filter-only"):
        search_dsl(idx, {"q": {"constant_score": {
            "filter": {"bool": {"must": [{"match": {"text": "spark"}}]}},
        }}}, k=5)


def test_dismax_top_level(idx, leaf):
    got = _run(idx, {"dis_max": {
        "queries": [{"match": {"text": "hash sort"}},
                    {"match": {"text": "window"}}],
        "tie_breaker": 0.3,
    }})
    h, o, w = leaf["hash"], leaf["sort"], leaf["window"]
    exp = {}
    for d in set(h) | set(o) | set(w):
        b1 = (h.get(d, 0.0) + o.get(d, 0.0)) if (d in h or d in o) else None
        b2 = w.get(d)
        br = [b for b in (b1, b2) if b is not None]
        if not br:
            continue
        exp[d] = max(br) + 0.3 * (sum(br) - max(br))
    _close(got, exp)


def test_dismax_inside_bool(idx, leaf):
    got = _run(idx, {"bool": {"should": [
        {"dis_max": {"queries": [{"match": {"text": "spark"}},
                                 {"match": {"text": "merge"}}]}},
        {"match": {"text": "hash"}},
    ]}})
    s, m, h = leaf["spark"], leaf["merge"], leaf["hash"]
    exp = {}
    for d in set(s) | set(m) | set(h):
        br = [b for b in (s.get(d), m.get(d)) if b is not None]
        g = max(br) if br else None
        l = h.get(d)
        if g is None and l is None:
            continue
        exp[d] = (g or 0.0) + (l or 0.0)
    _close(got, exp)


def test_dismax_nested_bool_branch(idx, leaf):
    """A bool branch's score sums inside the branch before the max."""
    got = _run(idx, {"dis_max": {"queries": [
        {"bool": {"must": [{"match": {"text": "hash"}},
                           {"match": {"text": "sort"}}]}},
        {"match": {"text": "merge"}},
    ], "tie_breaker": 0.5}})
    h, o, m = leaf["hash"], leaf["sort"], leaf["merge"]
    exp = {}
    for d in set(h) | set(o) | set(m):
        b1 = h[d] + o[d] if (d in h and d in o) else None
        b2 = m.get(d)
        br = [b for b in (b1, b2) if b is not None]
        if not br:
            continue
        exp[d] = max(br) + 0.5 * (sum(br) - max(br))
    _close(got, exp)


def test_dismax_validation(idx):
    with pytest.raises(ValueError, match="non-empty"):
        search_dsl(idx, {"q": {"dis_max": {"queries": []}}}, k=5)
    with pytest.raises(ValueError, match="tie_breaker"):
        search_dsl(idx, {"q": {"dis_max": {
            "queries": [{"match": {"text": "spark"}}], "tie_breaker": 2}}}, k=5)
    with pytest.raises(ValueError, match="filter-only"):
        search_dsl(idx, {"q": {"dis_max": {"queries": [
            {"bool": {"filter": [{"term": {"lang": "en"}}]}},
        ]}}}, k=5)
    with pytest.raises(ValueError, match="in dis_max"):
        search_dsl(idx, {"q": {"dis_max": {"queries": [
            {"match_all": {}},
        ]}}}, k=5)


def test_bool_boost_top_level(idx, leaf):
    """bool.boost multiplies the whole query's scores (routes a flat
    bool onto the tree path)."""
    got = _run(idx, {"bool": {"should": [{"match": {"text": "join"}}],
                              "boost": 2.0}})
    exp = {d: 2.0 * s for d, s in leaf["join"].items()}
    _close(got, exp)


def test_bool_boost_nested_group(idx, leaf):
    got = _run(idx, {"bool": {"should": [
        {"bool": {"should": [{"match": {"text": "spark"}}], "boost": 4.0}},
        {"match": {"text": "merge"}},
    ]}})
    s, m = leaf["spark"], leaf["merge"]
    exp = {d: 4.0 * s.get(d, 0.0) + m.get(d, 0.0) for d in set(s) | set(m)}
    _close(got, exp)


def test_bool_boost_validation(idx):
    with pytest.raises(ValueError, match="positive"):
        search_dsl(idx, {"q": {"bool": {
            "should": [{"match": {"text": "spark"}}], "boost": -1}}}, k=5)


def test_filter_prefix_wildcard_leaves(idx, leaf):
    """prefix / wildcard attribute predicates in filter context."""
    got = _run(idx, {"bool": {"should": [{"match": {"text": "join"}}],
                              "filter": [{"prefix": {"lang": "e"}}]}})
    exp = {d: s for d, s in leaf["join"].items() if LANG[d].startswith("e")}
    _close(got, exp)
    got = _run(idx, {"bool": {"should": [{"match": {"text": "join"}}],
                              "filter": [{"wildcard": {"lang": "d?"}}]}})
    exp = {d: s for d, s in leaf["join"].items() if LANG[d] == "de"}
    _close(got, exp)
    with pytest.raises(ValueError, match="non-empty"):
        search_dsl(idx, {"q": {"bool": {
            "should": [{"match": {"text": "join"}}],
            "filter": [{"prefix": {"lang": ""}}]}}}, k=5)


def test_nested_path_masks_tombstones(spark, leaf):
    """Deleted docs vanish from nested-DSL results (mask_deleted rides
    _finalize on the tree path too)."""
    import tempfile as _tf

    from openmatch_spark.index import build_index, load_index
    from openmatch_spark.index.deletes import delete_docs

    pages = spark.createDataFrame(
        [(u, None, None, t, lg) for u, t, lg in DOCS],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    d = _tf.mkdtemp(prefix="om_dsl_del_")
    build_index(spark, pages, d, analyzer="simple", num_shards=2,
                num_term_buckets=4, block_size=4, store_attrs=["lang"])
    idx2 = load_index(spark, d)
    q = {"bool": {"should": [
        {"bool": {"should": [{"match": {"text": "spark"}},
                             {"match": {"text": "hash"}}]}},
    ]}}
    before = {r["doc_id"] for r in search_dsl(idx2, {"q": q}, k=100).collect()}
    victim = sorted(before)[0]
    delete_docs(spark, d, [victim])
    idx3 = load_index(spark, d)
    after = {r["doc_id"] for r in search_dsl(idx3, {"q": q}, k=100).collect()}
    assert after == before - {victim} and victim in before


def test_explain_dsl_breakdown(idx, leaf):
    """explain_dsl rows reproduce the leaf scores that compose the
    query, located by (node, depth, role)."""
    from openmatch_spark.query import explain_dsl

    q = {"bool": {
        "must": [{"match": {"text": "spark"}}],
        "should": [{"bool": {"should": [
            {"match": {"text": {"query": "merge", "boost": 2.0}}},
        ]}}],
    }}
    rows = explain_dsl(idx, {"q": q}, ["doc://6"]).collect()
    got = {(r["node"], r["depth"], r["role"], r["text"]):
           (r["boost"], round(r["score"], 9)) for r in rows}
    # doc6 = "spark window merge": root must 'spark' at node 0, nested
    # should 'merge' (boost 2) at the child node depth 1
    assert got == {
        (0, 0, "must", "spark"): (1.0, round(leaf["spark"]["doc://6"], 9)),
        (1, 1, "should", "merge"): (2.0, round(2.0 * leaf["merge"]["doc://6"], 9)),
    }, got


def test_explain_dsl_sums_to_search(idx):
    """Per-doc explain scores sum to the search_dsl score for a pure
    should query (no gating subtleties)."""
    from openmatch_spark.query import explain_dsl

    q = {"bool": {"should": [{"match": {"text": "hash join"}},
                             {"match": {"text": "window"}}]}}
    run = {r["doc_id"]: r["score"]
           for r in search_dsl(idx, {"q": q}, k=100).collect()}
    docs = sorted(run)[:4]
    rows = explain_dsl(idx, {"q": q}, docs).collect()
    sums = {}
    for r in rows:
        sums[r["doc_id"]] = sums.get(r["doc_id"], 0.0) + r["score"]
    for d in docs:
        assert abs(sums[d] - run[d]) < 1e-9, (d, sums[d], run[d])
