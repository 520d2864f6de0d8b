"""Round-4 session additions: span_or (Lucene SpanOrQuery) and the
simple_query_string front door (Lucene SimpleQueryParser)."""

import pytest

from openmatch_spark.index import build_index, build_positions, load_index
from openmatch_spark.query import (
    search_fuzzy,
    search_phrase,
    search_prefix,
    search_query_string,
    search_simple_query_string,
    search_span_or,
)
from openmatch_spark.query.simpleqs import (
    Segment,
    parse_simple_query_string,
    resolve_flags,
)

DOCS = [
    ("doc://0", "spark hash join beats sort merge join on small tables"),
    ("doc://1", "the hash join and the sort merge join"),
    ("doc://2", "spark spark spark hash hash join"),
    ("doc://3", "merge sort is not sort merge"),
    ("doc://4", "join hash spark"),
    ("doc://5", "window functions rank rows per partition"),
    ("doc://6", ""),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    pages = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in DOCS],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    d = str(tmp_path_factory.mktemp("r4s") / "idx")
    build_index(spark, pages, d, analyzer="simple", num_shards=2,
                num_term_buckets=4, block_size=4)
    build_positions(spark, pages, d)
    return load_index(spark, d)


def _q(spark, *texts):
    return spark.createDataFrame(
        [(f"q{i}", t) for i, t in enumerate(texts)],
        "query_id string, text string",
    )


def _alts(spark, *alt_lists):
    return spark.createDataFrame(
        [(f"q{i}", list(a)) for i, a in enumerate(alt_lists)],
        "query_id string, alternatives array<string>",
    )


def _rows(df):
    return sorted(
        (r["query_id"], r["doc_id"], round(r["score"], 9), r["rank"])
        for r in df.collect()
    )


# ------------------------------------------------------------- span_or

def _py_or_spans(text, alts):
    """Distinct (start, end) spans across alternatives — the replica."""
    toks = text.split()
    spans = set()
    for a in alts:
        p = a.split()
        for i in range(len(toks) - len(p) + 1):
            if p and toks[i:i + len(p)] == p:
                spans.add((i, i + len(p) - 1))
    return len(spans)


@pytest.mark.parametrize("alts", [
    ["hash join", "sort merge"],
    ["spark"],                              # single-token alternative
    ["spark spark", "spark spark spark"],   # same start, different end
    ["join", "hash join"],                  # nested at different starts
])
def test_span_or_nspans_matches_python(spark, idx, alts):
    got = {
        r["doc_id"]: r["n_spans"]
        for r in search_span_or(idx, _alts(spark, alts), k=10).collect()
    }
    want = {
        u: _py_or_spans(t, alts)
        for u, t in DOCS if _py_or_spans(t, alts) > 0
    }
    assert got == want, (alts, got, want)


def test_span_or_single_alt_is_exact_phrase(spark, idx):
    a = _rows(search_span_or(idx, _alts(spark, ["hash join"]), k=10)
              .drop("n_spans"))
    b = _rows(search_phrase(idx, _q(spark, "hash join"), k=10)
              .drop("phrase_freq"))
    assert a == b and a
    # and the span count equals the phrase count
    ns = {r["doc_id"]: r["n_spans"]
          for r in search_span_or(idx, _alts(spark, ["hash join"]), k=10).collect()}
    pf = {r["doc_id"]: r["phrase_freq"]
          for r in search_phrase(idx, _q(spark, "hash join"), k=10).collect()}
    assert ns == pf


def test_span_or_oov_alternative_drops_alone(spark, idx):
    with_dead = search_span_or(
        idx, _alts(spark, ["nosuchterm zz", "hash join"]), k=10
    )
    alone = search_span_or(idx, _alts(spark, ["hash join"]), k=10)
    assert _rows(with_dead) == _rows(alone) and _rows(alone)


def test_span_or_all_oov_or_empty(spark, idx):
    df = _alts(spark, ["nosuchterm", "alsonothere xx"], [], [""])
    assert search_span_or(idx, df, k=10).count() == 0


def test_span_or_duplicate_alt_doubles_score_not_spans(spark, idx):
    # qtf doubles (SpanOr builds its weight from ALL sub-queries' terms),
    # but the merged span set dedups identical (start, end) pairs
    one = {(r["doc_id"]): (r["score"], r["n_spans"])
           for r in search_span_or(idx, _alts(spark, ["hash"]), k=10).collect()}
    two = {(r["doc_id"]): (r["score"], r["n_spans"])
           for r in search_span_or(idx, _alts(spark, ["hash", "hash"]), k=10).collect()}
    assert set(one) == set(two) and one
    for d, (s, n) in one.items():
        s2, n2 = two[d]
        assert s2 == pytest.approx(2 * s) and n2 == n


def test_span_or_batch_keeps_queries_apart(spark, idx):
    df = _alts(spark, ["hash join"], ["sort merge", "spark"])
    got = search_span_or(idx, df, k=10)
    a = _rows(got.where("query_id = 'q0'"))
    b = _rows(search_span_or(idx, _alts(spark, ["hash join"]), k=10))
    assert a == b


# ----------------------------------------------- simple_query_string parse

def _segs(branches):
    return [[(s.neg, s.kind, s.text, s.slop, s.edits) for s in b]
            for b in branches]


def test_parse_or_and_precedence():
    br, gn = parse_simple_query_string("a + b | c")
    assert _segs(br) == [
        [(False, "term", "a", 0, 2), (False, "term", "b", 0, 2)],
        [(False, "term", "c", 0, 2)],
    ]
    assert gn == []


def test_parse_default_operator():
    br, _ = parse_simple_query_string("a b", default_operator="or")
    assert len(br) == 2
    br, _ = parse_simple_query_string("a b", default_operator="and")
    assert len(br) == 1 and len(br[0]) == 2
    with pytest.raises(ValueError, match="default_operator"):
        parse_simple_query_string("a", default_operator="both")


def test_parse_kinds_and_negation():
    br, gn = parse_simple_query_string('"x y"~2 + pre* + fz~1 + -bad')
    assert _segs(br) == [[
        (False, "phrase", "x y", 2, 2),
        (False, "prefix", "pre", 0, 2),
        (False, "fuzzy", "fz", 0, 1),
        (True, "term", "bad", 0, 2),
    ]]
    assert gn == []
    # bare fuzzy default budget
    br, _ = parse_simple_query_string("fz~")
    assert _segs(br) == [[(False, "fuzzy", "fz", 0, 2)]]


def test_parse_all_negative_run_lifts_global():
    br, gn = parse_simple_query_string("-a b")
    assert _segs(br) == [[(False, "term", "b", 0, 2)]]
    assert [(s.neg, s.text) for s in gn] == [(True, "a")]
    # a query of only negations has no branch
    br, gn = parse_simple_query_string("-a + -b")
    assert br == [] and len(gn) == 2


def test_parse_lenient_never_raises():
    br, _ = parse_simple_query_string("| a")  # leading operator dropped
    assert _segs(br) == [[(False, "term", "a", 0, 2)]]
    br, _ = parse_simple_query_string("a | | + b")
    # consecutive operators collapse, last one wins: a AND b — one branch
    assert _segs(br) == [[(False, "term", "a", 0, 2),
                          (False, "term", "b", 0, 2)]]
    br, _ = parse_simple_query_string("a +")  # dangling trailing operator
    assert _segs(br) == [[(False, "term", "a", 0, 2)]]
    br, _ = parse_simple_query_string('"unbalanced a b')
    assert len(br) == 3  # quote dropped, three OR'd terms
    for s in ["-", "", "   ", '""', None]:
        br, gn = parse_simple_query_string(s or "")
        assert br == [] and gn == []


def test_parse_unbalanced_quote_carries_negation():
    br, gn = parse_simple_query_string('-"a b')
    # quote dropped; the negation lands on the NEXT segment (a)
    assert [(s.neg, s.text) for s in gn] == [(True, "a")]
    assert _segs(br) == [[(False, "term", "b", 0, 2)]]


def test_parse_flags_disable_features():
    br, _ = parse_simple_query_string("a|b", flags="NONE")
    assert _segs(br) == [[(False, "term", "a|b", 0, 2)]]
    br, _ = parse_simple_query_string('"a b"', flags=["AND", "OR"])
    # PHRASE off: the quote chars ride along as term text
    assert br and br[0][0].kind == "term"
    br, _ = parse_simple_query_string("pre*", flags="NONE")
    assert _segs(br) == [[(False, "term", "pre*", 0, 2)]]
    br, _ = parse_simple_query_string("fz~1", flags=["PHRASE"])
    assert _segs(br) == [[(False, "term", "fz~1", 0, 2)]]
    br, _ = parse_simple_query_string("-a b", flags=["OR"])  # NOT off
    assert _segs(br) == [[(False, "term", "-a", 0, 2)],
                         [(False, "term", "b", 0, 2)]]
    assert resolve_flags("ALL") == resolve_flags(None)
    assert resolve_flags("AND|OR") == frozenset({"AND", "OR"})
    with pytest.raises(ValueError, match="unknown"):
        resolve_flags(["BOGUS"])


def test_parse_phrase_slop_requires_near_flag():
    # NEAR off: ~3 is not consumed by the phrase and falls through as text
    br, _ = parse_simple_query_string('"a b"~3', flags=["PHRASE"])
    assert _segs(br) == [[(False, "phrase", "a b", 0, 2)],
                         [(False, "term", "~3", 0, 2)]]
    br, _ = parse_simple_query_string('"a b"~3')
    assert _segs(br) == [[(False, "phrase", "a b", 3, 2)]]


def test_parse_is_pure():
    a = parse_simple_query_string("x + y | -z")
    b = parse_simple_query_string("x + y | -z")
    assert a == b
    assert isinstance(a[0][0][0], Segment)


# -------------------------------------------- simple_query_string execute

def test_sqs_or_parity_with_query_string(spark, idx):
    a = _rows(search_simple_query_string(idx, _q(spark, "spark hash join"), k=10))
    b = _rows(search_query_string(idx, _q(spark, "spark hash join"), k=10))
    assert a == b and a


def test_sqs_and_parity_with_query_string(spark, idx):
    a = _rows(search_simple_query_string(idx, _q(spark, "spark + hash + join"), k=10))
    b = _rows(search_query_string(idx, _q(spark, "+spark +hash +join"), k=10))
    assert a == b and a
    c = _rows(search_simple_query_string(
        idx, _q(spark, "spark hash join"), k=10, default_operator="and"))
    assert c == a


def test_sqs_global_not_parity(spark, idx):
    a = _rows(search_simple_query_string(idx, _q(spark, "-spark join"), k=10))
    b = _rows(search_query_string(idx, _q(spark, "join -spark"), k=10))
    assert a == b and a


def test_sqs_branch_sum_doubles(spark, idx):
    one = {r["doc_id"]: r["score"]
           for r in search_simple_query_string(idx, _q(spark, "spark"), k=10).collect()}
    two = {r["doc_id"]: r["score"]
           for r in search_simple_query_string(idx, _q(spark, "spark | spark"), k=10).collect()}
    assert set(one) == set(two) and one
    for d, s in one.items():
        assert two[d] == pytest.approx(2 * s)


def test_sqs_oov_branch_dies_alone(spark, idx):
    a = _rows(search_simple_query_string(
        idx, _q(spark, "nosuchterm + spark | join"), k=10))
    b = _rows(search_simple_query_string(idx, _q(spark, "join"), k=10))
    assert a == b and a
    # ... whereas query_string's single boolean dies wholesale
    assert search_query_string(
        idx, _q(spark, "+nosuchterm spark join"), k=10).count() == 0


def test_sqs_all_branches_dead_or_no_positive(spark, idx):
    df = _q(spark, "nosuchterm", "-spark", "", "nosuchterm + join")
    got = search_simple_query_string(idx, df, k=10)
    assert got.count() == 0


def test_sqs_minimum_should_match_counts_branches(spark, idx):
    got = search_simple_query_string(
        idx, _q(spark, "spark | merge | window"), k=10,
        minimum_should_match=2)
    want = _rows(search_query_string(
        idx, _q(spark, "spark merge window"), k=10, min_should_match=2))
    assert _rows(got) == want and want
    # single-branch queries are exempt from msm
    one = search_simple_query_string(
        idx, _q(spark, "window"), k=10, minimum_should_match=3)
    assert _rows(one) == _rows(search_query_string(idx, _q(spark, "window"), k=10))
    with pytest.raises(ValueError, match="minimum_should_match"):
        search_simple_query_string(idx, _q(spark, "a"), minimum_should_match=-1)


def test_sqs_phrase_prefix_fuzzy_parity(spark, idx):
    a = _rows(search_simple_query_string(idx, _q(spark, '"sort merge"~2'), k=10))
    b = _rows(search_query_string(idx, _q(spark, '"sort merge"~2'), k=10))
    assert a == b and a
    a = _rows(search_simple_query_string(idx, _q(spark, "sp*"), k=10))
    b = _rows(search_prefix(idx, _q(spark, "sp"), k=10))
    assert a == b and a
    a = _rows(search_simple_query_string(idx, _q(spark, "hashy~1"), k=10))
    b = _rows(search_fuzzy(idx, _q(spark, "hashy"), k=10, max_edits=1))
    assert a == b and a


def test_sqs_run_local_negation_stays_local(spark, idx):
    # 'hash + -spark | merge': spark is excluded ONLY from the hash branch
    got = {r["doc_id"] for r in search_simple_query_string(
        idx, _q(spark, "hash + -spark | merge"), k=10).collect()}
    # doc://0 has spark AND merge -> still matches via the merge branch
    assert "doc://0" in got and "doc://3" in got
    # doc://4 (join hash spark) matches neither branch
    assert "doc://4" not in got
    # doc://1 (hash, no spark) matches the hash branch
    assert "doc://1" in got


def test_sqs_flags_none_is_plain_text(spark, idx):
    # operators disabled: '|' falls through to the analyzer (a token
    # separator under 'simple'), so 'spark|join' is one segment analyzing
    # to two terms with the segment's (default) role
    a = _rows(search_simple_query_string(
        idx, _q(spark, "spark|join"), flags="NONE", k=10))
    b = _rows(search_query_string(idx, _q(spark, "spark join"), k=10))
    assert a == b and a


def test_sqs_multitoken_segment_honors_default_operator(spark, idx):
    # 'spark.join' is ONE lexer segment analyzing to two tokens: under OR
    # it is one boolean unit matching on either token (Lucene's
    # newDefaultQuery), under AND every token is its own MUST
    a = _rows(search_simple_query_string(idx, _q(spark, "spark.join"), k=10))
    b = _rows(search_query_string(idx, _q(spark, "spark join"), k=10))
    assert a == b and a
    c = _rows(search_simple_query_string(
        idx, _q(spark, "spark.join"), k=10, default_operator="and"))
    d = _rows(search_query_string(idx, _q(spark, "+spark +join"), k=10))
    assert c == d and c
    # an OOV token inside the unit drops alone under OR...
    e = _rows(search_simple_query_string(
        idx, _q(spark, "spark.nosuchterm"), k=10))
    f = _rows(search_simple_query_string(idx, _q(spark, "spark"), k=10))
    assert e == f and e
    # ...and kills the query under AND
    g = search_simple_query_string(
        idx, _q(spark, "spark.nosuchterm"), k=10, default_operator="and")
    assert g.count() == 0


def test_sqs_global_not_phrase_with_vanishing_segment(spark, idx):
    # regression: a segment analyzing to ZERO tokens ('~~~') must not let
    # a global-not phrase's clause id collide with a positive phrase's
    # group id (both feed the ck-keyed phrase machinery)
    a = _rows(search_simple_query_string(
        idx, _q(spark, '-"sort merge" ~~~ + "hash join"'), k=10))
    b = _rows(search_simple_query_string(
        idx, _q(spark, '-"sort merge" "hash join"'), k=10))
    assert a == b and a
    # doc://1 has both phrases -> excluded; doc://2 has only "hash join"
    docs = {r[1] for r in a}
    assert "doc://2" in docs and "doc://1" not in docs


def test_sqs_batch_and_composite_id_guard(spark, idx):
    texts = ["spark | join", "hash + merge", "-spark join"]
    got = search_simple_query_string(idx, _q(spark, *texts), k=10)
    for i, text in enumerate(texts):
        per = _rows(got.where(f"query_id = 'q{i}'"))
        solo = _rows(search_simple_query_string(idx, _q(spark, text), k=10))
        assert [r[1:] for r in per] == [r[1:] for r in solo] and per
    bad = spark.createDataFrame(
        [("q\x1f0", "spark")], "query_id string, text string")
    with pytest.raises(ValueError, match="query_id"):
        search_simple_query_string(idx, bad)
