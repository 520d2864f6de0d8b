"""Round-4 session additions: random_sampler aggregation (this file grows
with the session's later surfaces)."""

import pytest

import pyspark.sql.functions as F

from openmatch_spark.functions.hashing import md5_rank_py
from openmatch_spark.operators.sampling import (
    random_sampler,
    random_sampler_counts,
)


def _py_uniform(doc_id, seed):
    return int(md5_rank_py(doc_id, seed=seed)[:8], 16) / 4294967296.0


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(f"d{i:04d}", ["en", "de", "fr"][i % 3]) for i in range(600)]
    return spark.createDataFrame(rows, "doc_id string, lang string")


def test_random_sampler_matches_python_replica(spark, docs):
    got = {r["doc_id"] for r in random_sampler(docs, 0.3, seed=9).collect()}
    want = {
        f"d{i:04d}" for i in range(600) if _py_uniform(f"d{i:04d}", 9) < 0.3
    }
    assert got == want
    # rate lands near p (hash-uniform draw; wide tolerance, deterministic)
    assert 0.2 < len(got) / 600 < 0.4


def test_random_sampler_partitioning_invariance(spark, docs):
    a = {r["doc_id"] for r in random_sampler(docs, 0.5, seed=3).collect()}
    b = {
        r["doc_id"]
        for r in random_sampler(docs.repartition(13), 0.5, seed=3).collect()
    }
    assert a == b


def test_random_sampler_counts_scaling(spark, docs):
    out = {
        r["value"]: (r["n_sampled"], r["n_docs_est"])
        for r in random_sampler_counts(docs, "lang", 0.25, seed=5).collect()
    }
    kept = [
        ["en", "de", "fr"][i % 3]
        for i in range(600)
        if _py_uniform(f"d{i:04d}", 5) < 0.25
    ]
    for lang in set(kept):
        n = kept.count(lang)
        assert out[lang] == (n, round(n / 0.25, 6))
    assert set(out) == set(kept)


def test_random_sampler_probability_one_keeps_all(spark, docs):
    assert random_sampler(docs, 1.0).count() == 600


def test_random_sampler_validation(spark, docs):
    for p in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="probability"):
            random_sampler(docs, p)


# ---------------------------------------------------------------- sig text

SPAN5 = "boil0 boil1 boil2 boil3 boil4"


@pytest.fixture(scope="module")
def sig_fixture(spark):
    # three hit docs of q1 share a 5-token boilerplate span; unique bodies
    # keep every doc distinct. d9 is background-only filler.
    docs = spark.createDataFrame(
        [
            ("d1", f"alpha beta gamma {SPAN5} delta"),
            ("d2", f"{SPAN5} epsilon zeta alpha"),
            ("d3", f"eta theta {SPAN5} beta"),
            ("d4", "iota kappa alpha beta"),
            ("d9", "lambda mu nu xi omicron pi rho sigma tau"),
        ],
        "doc_id string, text string",
    )
    run = spark.createDataFrame(
        [("q1", "d1"), ("q1", "d2"), ("q1", "d3"), ("q1", "d4")],
        "query_id string, doc_id string",
    )
    return run, docs


def test_significant_text_off_equals_significant_terms(spark, sig_fixture):
    from openmatch_spark.query import significant_terms, significant_text

    run, docs = sig_fixture
    a = sorted(map(tuple, significant_text(run, docs, n=10).collect()))
    b = sorted(map(tuple, significant_terms(run, docs, n=10).collect()))
    assert a == b and a


def test_significant_text_filters_duplicate_boilerplate(spark, sig_fixture):
    from openmatch_spark.query import significant_text

    run, docs = sig_fixture
    span_terms = set(SPAN5.split())
    off = significant_text(run, docs, n=20, min_doc_count=2).collect()
    assert span_terms <= {r["term"] for r in off}  # dominates unfiltered
    on = significant_text(
        run, docs, n=20, min_doc_count=2,
        filter_duplicate_text=True, dup_window=5,
    ).collect()
    got = {r["term"] for r in on}
    # only the set-global first copy (d1) survives -> fg_df 1 < 2
    assert not (span_terms & got)
    # organically shared terms are untouched (alpha in d1, d2, d4)
    alpha = [r for r in on if r["term"] == "alpha"]
    assert alpha and alpha[0]["fg_df"] == 3


def test_significant_text_dedup_scoped_per_query(spark):
    from openmatch_spark.query import significant_text

    # the span appears ONCE per query but in different docs across queries:
    # per-query scoping must NOT remove it (a global dedup would strip it
    # from q2's only copy)
    docs = spark.createDataFrame(
        [
            ("a1", f"alpha beta {SPAN5}"),
            ("a2", "gamma delta alpha"),
            ("b1", f"epsilon zeta {SPAN5}"),
            ("b2", "eta theta epsilon"),
        ],
        "doc_id string, text string",
    )
    run = spark.createDataFrame(
        [("q1", "a1"), ("q1", "a2"), ("q2", "b1"), ("q2", "b2")],
        "query_id string, doc_id string",
    )
    out = significant_text(
        run, docs, n=20, min_doc_count=1,
        filter_duplicate_text=True, dup_window=5,
    ).collect()
    for q in ("q1", "q2"):
        got = {r["term"] for r in out if r["query_id"] == q}
        assert set(SPAN5.split()) <= got, (q, got)


def test_remove_duplicate_spans_group_col_scoping(spark):
    from openmatch_spark.operators.exact_spans import remove_duplicate_spans

    df = spark.createDataFrame(
        [
            ("g1", "x1", f"{SPAN5} one two three"),
            ("g1", "x2", f"four five {SPAN5}"),
            ("g2", "x3", f"{SPAN5} six seven"),
        ],
        "grp string, doc_id string, text string",
    )
    out = {
        (r["grp"], r["doc_id"]): (r["text"], r["n_removed"])
        for r in remove_duplicate_spans(
            df, k=5, min_dup_docs=2, group_col="grp"
        ).collect()
    }
    # g1: duplicated across x1/x2 -> x2's copy removed (x1 canonical)
    assert out[("g1", "x1")] == (f"{SPAN5} one two three", 0)
    assert out[("g1", "x2")] == ("four five", 5)
    # g2: only one copy IN ITS GROUP -> untouched
    assert out[("g2", "x3")] == (f"{SPAN5} six seven", 0)


# ------------------------------------------------------------- completion

@pytest.fixture(scope="module")
def sugg(spark):
    return spark.createDataFrame(
        [
            ("spark sql", 10.0),
            ("spark streaming", 30.0),
            ("spark sql", 25.0),        # duplicate surface form, higher weight
            ("small tables", 40.0),
            ("smell test", 15.0),
            ("batch jobs", 5.0),
        ],
        "suggestion string, weight double",
    )


def test_completion_exact_prefix_weight_order(spark, sugg):
    from openmatch_spark.query import suggest_completions

    out = suggest_completions(sugg, ["sp"], size=5).collect()
    got = [(r["suggestion"], r["weight"], r["rank"]) for r in
           sorted(out, key=lambda r: r["rank"])]
    # duplicate 'spark sql' keeps max weight 25; weight DESC order
    assert got == [("spark streaming", 30.0, 1), ("spark sql", 25.0, 2)]


def test_completion_fuzzy_prefix(spark, sugg):
    from openmatch_spark.query import suggest_completions

    # 'spall' ~ 'small' (1 edit, first char exact) but not 'smell' (2 edits)
    out = suggest_completions(
        sugg, ["spall"], size=5, fuzzy=True, max_edits=1, prefix_len=1
    ).collect()
    assert [r["suggestion"] for r in out] == ["small tables"]
    # without fuzzy: no exact 'spall' prefix -> nothing
    assert not suggest_completions(sugg, ["spall"], size=5).collect()


def test_completion_fuzzy_prefix_len_gate(spark, sugg):
    from openmatch_spark.query import suggest_completions

    # 'bmall' is 1 edit from 'small' but the first char differs -> gated out
    out = suggest_completions(
        sugg, ["bmall"], size=5, fuzzy=True, max_edits=1, prefix_len=1
    ).collect()
    assert not out


def test_completion_size_and_validation(spark, sugg):
    from openmatch_spark.query import suggest_completions

    out = suggest_completions(sugg, ["s"], size=2).collect()
    assert [r["suggestion"] for r in sorted(out, key=lambda r: r["rank"])] == [
        "small tables", "spark streaming",
    ]
    with pytest.raises(ValueError, match="prefixes"):
        suggest_completions(sugg, [])
    with pytest.raises(ValueError, match="size"):
        suggest_completions(sugg, ["s"], size=0)


# ------------------------------------------------- span containing/within

SPAN_DOCS = [
    ("doc://s0", "a b c d a b"),
    ("doc://s1", "b c a b c d"),
    ("doc://s2", "a b x c d"),
    ("doc://s3", "a b c d a b c d"),
    ("doc://s4", "c b a d c b"),
]


@pytest.fixture(scope="module")
def span_idx(spark, tmp_path_factory):
    from openmatch_spark.index import build_index, build_positions, load_index

    pages = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in SPAN_DOCS],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    d = str(tmp_path_factory.mktemp("spanc") / "idx")
    build_index(spark, pages, d, analyzer="simple", num_shards=2,
                num_term_buckets=4, block_size=4)
    build_positions(spark, pages, d)
    return load_index(spark, d)


def _py_spans(text, big, little, mode):
    toks = text.split()
    bt, lt = big.split(), little.split()
    occs = lambda p: [
        i for i in range(len(toks) - len(p) + 1)
        if toks[i:i + len(p)] == p
    ]
    bo, lo = occs(bt), occs(lt)
    if mode == "containing":
        keep = {b for b in bo for l in lo
                if b <= l and l + len(lt) - 1 <= b + len(bt) - 1}
    else:
        keep = {l for l in lo for b in bo
                if b <= l and l + len(lt) - 1 <= b + len(bt) - 1}
    return len(keep)


@pytest.mark.parametrize("mode", ["containing", "within"])
@pytest.mark.parametrize("big,little", [
    ("a b c d", "b c"),
    ("a b", "a b"),        # a span trivially contains itself
    ("c b", "b"),
    ("a b c d", "c d"),
])
def test_span_containment_matches_python(spark, span_idx, mode, big, little):
    from openmatch_spark.query import (
        search_span_containing,
        search_span_within,
    )

    fn = search_span_containing if mode == "containing" else search_span_within
    q = spark.createDataFrame(
        [("q", big, little)], "query_id string, big string, little string"
    )
    got = {r["doc_id"]: r["n_spans"] for r in fn(span_idx, q, k=10).collect()}
    want = {
        u: _py_spans(t, big, little, mode)
        for u, t in SPAN_DOCS
        if _py_spans(t, big, little, mode) > 0
    }
    assert got == want, (mode, big, little, got, want)


def test_span_containment_doc_sets_agree(spark, span_idx):
    # containing and within match the SAME docs (both need an existing
    # (big, little) pair) — only the counted spans and scoring terms differ
    from openmatch_spark.query import (
        search_span_containing,
        search_span_within,
    )

    q = spark.createDataFrame(
        [("q", "a b c d", "b c")], "query_id string, big string, little string"
    )
    a = {r["doc_id"] for r in search_span_containing(span_idx, q, k=10).collect()}
    b = {r["doc_id"] for r in search_span_within(span_idx, q, k=10).collect()}
    assert a == b and a


def test_span_containment_oov_and_empty(spark, span_idx):
    from openmatch_spark.query import search_span_containing

    q = spark.createDataFrame(
        [("q1", "a b c d", "zz"), ("q2", "", "b")],
        "query_id string, big string, little string",
    )
    assert search_span_containing(span_idx, q, k=10).count() == 0
