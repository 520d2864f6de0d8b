"""Fuzzy and prefix term-expansion search (query/expand.py).

The expansion layer is pinned against manual expansions fed to the shared
search_terms engine (bit-identical scores), plus degenerate-case identities:
max_edits=0 fuzzy == exact search, OOV-everything queries return empty.
"""

import pytest

from openmatch_spark.fixtures import PAGES_SCHEMA, QUERIES_SCHEMA, gen_pages_rows
from openmatch_spark.index import build_index, load_index
from openmatch_spark.query import search, search_fuzzy, search_prefix, search_terms


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in df.collect()
    )


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("expand") / "idx")
    pages = spark.createDataFrame(gen_pages_rows(200), PAGES_SCHEMA)
    build_index(spark, pages, d, analyzer="simple", num_shards=4, num_term_buckets=4)
    return load_index(spark, d)


@pytest.fixture(scope="module")
def vocab(idx):
    pdf = idx.dictionary.select("term", "df").toPandas()
    return dict(zip(pdf["term"].tolist(), pdf["df"].tolist()))


def test_fuzzy_zero_edits_equals_exact(spark, idx):
    q = spark.createDataFrame(
        [("q1", "term0001 term0040"), ("q2", "term0100 term0100")], QUERIES_SCHEMA
    )
    assert _rows(search_fuzzy(idx, q, k=10, max_edits=0)) == _rows(
        search(idx, q, k=10)
    )


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _manual_fuzzy(vocab, qtoks, max_edits=1, prefix_len=1):
    """Replicate the expansion predicate exactly: same first prefix_len
    chars, length within ±max_edits, Levenshtein <= max_edits; weights
    qtf/(1+ed) summed per (query, variant)."""
    acc: dict = {}
    for qid, tok, qtf in qtoks:
        for t in vocab:
            if t[:prefix_len] != tok[:prefix_len]:
                continue
            if abs(len(t) - len(tok)) > max_edits:
                continue
            ed = _lev(t, tok)
            if ed <= max_edits:
                acc[(qid, t)] = acc.get((qid, t), 0.0) + qtf / (1.0 + ed)
    return acc


def test_fuzzy_finds_misspellings(spark, idx, vocab):
    # 'term000x' is OOV; every vocabulary term within 1 edit (same first
    # char) is a variant — notably term0000..term0009 at weight 1/2
    q = spark.createDataFrame([("f1", "term000x")], QUERIES_SCHEMA)
    got = _rows(search_fuzzy(idx, q, k=10, max_edits=1, max_expansions=100000))
    acc = _manual_fuzzy(vocab, [("f1", "term000x", 1.0)])
    assert ("f1", "term0001") in acc and acc[("f1", "term0001")] == 0.5
    bucket_of = idx.term_buckets(sorted({t for (_, t) in acc}))
    manual = [(q_, t, w, bucket_of[t]) for (q_, t), w in sorted(acc.items())]
    assert got == _rows(search_terms(idx, manual, k=10))
    assert got  # actually matched documents


def test_fuzzy_merges_weights_across_tokens(spark, idx, vocab):
    # 'term0001' exact (ed=0, weight 1) AND a variant of 'term000x'
    # (ed=1, weight 1/2) -> total weight 1.5 on term0001
    q = spark.createDataFrame([("m1", "term0001 term000x")], QUERIES_SCHEMA)
    got = _rows(search_fuzzy(idx, q, k=10, max_edits=1, max_expansions=100000))
    acc = _manual_fuzzy(
        vocab, [("m1", "term0001", 1.0), ("m1", "term000x", 1.0)]
    )
    assert acc[("m1", "term0001")] == 1.5
    bucket_of = idx.term_buckets(sorted({t for (_, t) in acc}))
    manual = [(q_, t, w, bucket_of[t]) for (q_, t), w in sorted(acc.items())]
    assert got == _rows(search_terms(idx, manual, k=10))


def test_fuzzy_oov_everything_empty(spark, idx):
    q = spark.createDataFrame([("x", "zzzzzzzz qqqqq")], QUERIES_SCHEMA)
    assert search_fuzzy(idx, q, k=10).count() == 0


def test_prefix_search_matches_manual_expansion(spark, idx, vocab):
    q = spark.createDataFrame([("p1", "term000")], QUERIES_SCHEMA)
    got = _rows(search_prefix(idx, q, k=10, max_expansions=1000))
    variants = sorted(t for t in vocab if t.startswith("term000"))
    bucket_of = idx.term_buckets(variants)
    manual = [("p1", t, 1.0, bucket_of[t]) for t in variants]
    assert got == _rows(search_terms(idx, manual, k=10))
    assert got


def test_prefix_cap_keeps_top_df(spark, idx, vocab):
    q = spark.createDataFrame([("p1", "term000")], QUERIES_SCHEMA)
    got = _rows(search_prefix(idx, q, k=10, max_expansions=3))
    top3 = sorted(
        (t for t in vocab if t.startswith("term000")),
        key=lambda t: (-vocab[t], t),
    )[:3]
    bucket_of = idx.term_buckets(top3)
    manual = [("p1", t, 1.0, bucket_of[t]) for t in sorted(top3)]
    assert got == _rows(search_terms(idx, manual, k=10))


def test_regexp_matches_manual_expansion(spark, idx, vocab):
    # full-term match (Lucene implicit anchoring): char class + dot
    import re

    from openmatch_spark.query import search_regexp

    q = spark.createDataFrame([("r1", "term00[0-4].")], QUERIES_SCHEMA)
    got = _rows(search_regexp(idx, q, k=10, max_expansions=1000))
    variants = sorted(t for t in vocab if re.fullmatch(r"term00[0-4].", t))
    assert variants  # the fixture vocabulary must exercise the class
    bucket_of = idx.term_buckets(variants)
    manual = [("r1", t, 1.0, bucket_of[t]) for t in variants]
    assert got == _rows(search_terms(idx, manual, k=10))
    assert got


def test_regexp_literal_degenerates_to_exact(spark, idx):
    # a pattern with no metacharacters is an exact term lookup
    from openmatch_spark.query import search_regexp

    q = spark.createDataFrame([("r1", "term0001 term0040")], QUERIES_SCHEMA)
    assert _rows(search_regexp(idx, q, k=10)) == _rows(search(idx, q, k=10))


def test_regexp_alternation_cannot_escape_anchor(spark, idx):
    # '^(?:a|b)$' — NOT '^a|b$': top-level alternation must stay anchored,
    # so 'term0001|term0002' matches exactly those two whole terms
    from openmatch_spark.query import search_regexp, search_terms

    q = spark.createDataFrame([("r1", "term0001|term0002")], QUERIES_SCHEMA)
    got = _rows(search_regexp(idx, q, k=10, max_expansions=1000))
    bucket_of = idx.term_buckets(["term0001", "term0002"])
    manual = [("r1", t, 1.0, bucket_of[t]) for t in sorted(bucket_of)]
    assert got == _rows(search_terms(idx, manual, k=10))
    assert got


def test_regexp_merges_weights_across_patterns(spark, idx):
    # two patterns hitting the same variant sum their qtf contributions:
    # 'term000.' (weight 1 on term0001) + literal 'term0001' (weight 1)
    import re

    from openmatch_spark.query import search_regexp, search_terms

    q = spark.createDataFrame([("r1", "term000. term0001")], QUERIES_SCHEMA)
    got = _rows(search_regexp(idx, q, k=10, max_expansions=1000))
    vocab = [r["term"] for r in idx.dictionary.select("term").collect()]
    acc: dict = {}
    for t in vocab:
        if re.fullmatch(r"term000.", t):
            acc[t] = acc.get(t, 0.0) + 1.0
    acc["term0001"] = acc.get("term0001", 0.0) + 1.0
    bucket_of = idx.term_buckets(sorted(acc))
    manual = [("r1", t, w, bucket_of[t]) for t, w in sorted(acc.items())]
    assert got == _rows(search_terms(idx, manual, k=10))


def test_regexp_invalid_pattern_raises(spark, idx):
    from openmatch_spark.query import search_regexp

    q = spark.createDataFrame([("r1", "term(0")], QUERIES_SCHEMA)
    with pytest.raises(ValueError, match="invalid regexp"):
        search_regexp(idx, q, k=10)


def test_regexp_oov_everything_empty(spark, idx):
    from openmatch_spark.query import search_regexp

    q = spark.createDataFrame([("r1", "zzz+ qqq.*")], QUERIES_SCHEMA)
    assert search_regexp(idx, q, k=10).count() == 0
