"""Exact duplicate-span removal — operators/exact_spans.py.

Contract: every non-canonical occurrence of a k-token window duplicated
across >= min_dup_docs docs is removed; the corpus-global first occurrence
(min (doc_id, pos)) survives; overlapping duplicate windows union into one
removed range; docs shorter than k are untouched; hash and exact keys agree.
Verified against a pure-python reference on a seeded random fixture.
"""

from collections import defaultdict

import numpy as np
import pytest

from openmatch_spark.operators.exact_spans import (
    duplicate_span_report,
    remove_duplicate_spans,
)

SCHEMA = "doc_id string, text string"


def _ref(rows, k, min_dup_docs=2, within_doc=False):
    toks = {d: t.split() for d, t in rows}
    occ = defaultdict(list)
    for d in toks:
        t = toks[d]
        for p in range(max(len(t) - k + 1, 0)):
            occ[" ".join(t[p:p + k])].append((d, p))
    removed: dict = defaultdict(set)
    for w, os_ in occ.items():
        ndocs = len({d for d, _ in os_})
        if ndocs >= min_dup_docs or (within_doc and len(os_) >= 2):
            canon = min(os_)
            for (d, p) in os_:
                if (d, p) != canon:
                    removed[d].update(range(p, p + k))
    out = {}
    for d, t in toks.items():
        kept = [tok for i, tok in enumerate(t) if i not in removed[d]]
        out[d] = (" ".join(kept), len(t), len(t) - len(kept))
    return out


def _got(df):
    return {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in df.collect()
    }


def test_canonical_survives_other_removed(spark):
    span = "a b c d e f g h"
    rows = [
        ("d1", f"intro one two {span} tail1 tail2"),
        ("d2", f"other words here {span} different end"),
        ("d3", f"{span} leading occurrence"),
    ]
    got = _got(remove_duplicate_spans(
        spark.createDataFrame(rows, SCHEMA), k=8))
    # canonical = min (doc_id, pos): d1 keeps the span; d2/d3 lose it
    assert got == _ref(rows, 8)
    assert span in got["d1"][0]
    assert span not in got["d2"][0]
    assert span not in got["d3"][0]
    assert got["d2"][2] == 8 and got["d3"][2] == 8


def test_overlapping_windows_merge(spark):
    # an 11-token shared span with k=8 -> 4 overlapping dup windows; the
    # whole 11 tokens must go from the non-canonical doc, not 4x8
    span = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11"
    rows = [("a", f"x y z {span} p q"), ("b", f"m n {span} r")]
    got = _got(remove_duplicate_spans(
        spark.createDataFrame(rows, SCHEMA), k=8))
    assert got == _ref(rows, 8)
    assert got["b"] == ("m n r", 14, 11)


def test_short_docs_untouched_and_whitespace_normalized(spark):
    rows = [("a", "just a few tokens"), ("b", "just   a\tfew \n tokens")]
    got = _got(remove_duplicate_spans(
        spark.createDataFrame(rows, SCHEMA), k=8))
    assert got["a"] == ("just a few tokens", 4, 0)
    assert got["b"] == ("just a few tokens", 4, 0)


def test_within_doc_mode(spark):
    rep = "r1 r2 r3 r4 r5 r6 r7 r8"
    rows = [("a", f"{rep} middle words here {rep}")]
    default = _got(remove_duplicate_spans(
        spark.createDataFrame(rows, SCHEMA), k=8))
    assert default["a"][2] == 0  # cross-doc only: in-doc repeat kept
    wd = _got(remove_duplicate_spans(
        spark.createDataFrame(rows, SCHEMA), k=8, within_doc=True))
    assert wd == _ref(rows, 8, within_doc=True)
    assert wd["a"][2] == 8  # second occurrence removed, first kept


def test_random_fixture_matches_reference_and_hash_mode(spark):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    boiler = " ".join(rng.choice(vocab, size=12))
    rows = []
    for i in range(40):
        words = list(rng.choice(vocab, size=int(rng.integers(5, 60))))
        if i % 3 == 0:  # a third of docs carry the boilerplate mid-doc
            at = int(rng.integers(0, len(words)))
            words = words[:at] + boiler.split() + words[at:]
        rows.append((f"d{i:03d}", " ".join(words)))
    df = spark.createDataFrame(rows, SCHEMA)
    want = _ref(rows, 10)
    assert _got(remove_duplicate_spans(df, k=10)) == want
    assert _got(remove_duplicate_spans(df, k=10, hash_key=False)) == want


def test_report_surfaces_top_span(spark):
    span = "a b c d e"
    rows = [(f"d{i}", f"u{i} v{i} {span} z{i}") for i in range(5)]
    rep = duplicate_span_report(
        spark.createDataFrame(rows, SCHEMA), k=5, top=3
    ).collect()
    assert rep[0]["span"] == span
    assert rep[0]["n_docs"] == 5


def test_k_guard(spark):
    with pytest.raises(ValueError):
        remove_duplicate_spans(
            spark.createDataFrame([("a", "x")], SCHEMA), k=1)
