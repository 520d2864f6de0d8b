"""Positional sidecar + phrase/proximity/boolean search.

Reference strategy: every Spark result is checked against a from-first-
principles pure-Python replica over the same tiny corpus (the same pattern
the winnowing battery uses), plus lifecycle tests (compaction invalidation)
and codec roundtrips.
"""

import re
import tempfile

import numpy as np
import pytest
import pyspark.sql.functions as F

from openmatch_spark.functions.codec import (
    decode_postings,
    encode_sequences_batch,
)
from openmatch_spark.index import build_index, build_positions, load_index
from openmatch_spark.query import search_boolean, search_phrase, search_proximity

DOCS = [
    ("doc://0", "spark hash join beats sort merge join on small tables"),
    ("doc://1", "the hash join and the sort merge join"),
    ("doc://2", "spark spark spark hash hash join"),
    ("doc://3", "merge sort is not sort merge"),
    ("doc://4", "join hash spark"),
    ("doc://5", "window functions rank rows per partition"),
    ("doc://6", ""),
]


def _tok(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


CORPUS = {u: _tok(t) for u, t in DOCS}


def _phrase_freq(toks, phrase):
    n = len(phrase)
    if n == 0:
        return 0
    return sum(1 for i in range(len(toks) - n + 1) if toks[i : i + n] == phrase)


def _min_cover(toks, terms):
    terms = set(terms)
    if not terms or not terms <= set(toks):
        return None
    latest, best = {}, None
    for i, t in enumerate(toks):
        if t in terms:
            latest[t] = i
            if len(latest) == len(terms):
                w = i - min(latest.values()) + 1
                best = w if best is None or w < best else best
    return best


@pytest.fixture(scope="module")
def pos_index(spark):
    pages = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in DOCS],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    d = tempfile.mkdtemp(prefix="om_pos_idx_")
    build_index(
        spark, pages, d, analyzer="simple", num_shards=2,
        num_term_buckets=4, block_size=4,
    )
    info = build_positions(spark, pages, d)
    assert info["n_positions"] == sum(len(t) for t in CORPUS.values())
    return load_index(spark, d), pages, d


def test_positions_roundtrip(spark, pos_index):
    """Decoded sidecar positions == posexplode of the tokenized corpus."""
    idx, _, _ = pos_index
    from openmatch_spark.index.positions import _decode_positions_arrow

    rows = (
        idx.positions.select("shard", "term", "doc_ord", "positions")
        .mapInArrow(
            _decode_positions_arrow, "shard int, term string, doc_ord long, pos long"
        )
        .join(idx.docmap.select("shard", "doc_ord", "doc_id"), ["shard", "doc_ord"])
        .select("doc_id", "term", "pos")
        .collect()
    )
    got = {(r["doc_id"], r["term"], r["pos"]) for r in rows}
    expect = {
        (u, t, i) for u, toks in CORPUS.items() for i, t in enumerate(toks)
    }
    assert got == expect


def test_encode_sequences_batch_roundtrip():
    rng = np.random.default_rng(7)
    seqs = [np.sort(rng.choice(10_000, size=n, replace=False)) for n in (1, 2, 17, 300)]
    flat = np.concatenate(seqs)
    starts = np.cumsum([0] + [len(s) for s in seqs[:-1]])
    payloads = encode_sequences_batch(flat, starts)
    assert len(payloads) == len(seqs)
    for p, s in zip(payloads, seqs):
        assert decode_postings(p).tolist() == s.tolist()
    assert encode_sequences_batch(np.array([], dtype=np.int64), np.array([], dtype=np.int64)) == []


@pytest.mark.parametrize(
    "phrase",
    ["hash join", "sort merge join", "spark spark", "nosuchterm join", "spark", "merge sort"],
)
def test_phrase_matches_reference(spark, pos_index, phrase):
    idx, _, _ = pos_index
    q = spark.createDataFrame([("q", phrase)], "query_id string, text string")
    out = search_phrase(idx, q, k=20).collect()
    expect = {
        u: _phrase_freq(toks, _tok(phrase))
        for u, toks in CORPUS.items()
        if _phrase_freq(toks, _tok(phrase)) > 0
    }
    got = {r["doc_id"]: r["phrase_freq"] for r in out}
    assert got == expect
    # ranked by score desc, doc_id asc, ranks dense from 1
    ranks = [r["rank"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranks == list(range(1, len(out) + 1))


@pytest.mark.parametrize("within", [1, 2, 3, 5])
def test_proximity_matches_reference(spark, pos_index, within):
    idx, _, _ = pos_index
    q = spark.createDataFrame(
        [("a", "spark join"), ("b", "sort hash"), ("c", "hash join sort")],
        "query_id string, text string",
    )
    out = search_proximity(idx, q, within=within, k=20).collect()
    for qid, text in [("a", "spark join"), ("b", "sort hash"), ("c", "hash join sort")]:
        expect = {
            u: c
            for u, toks in CORPUS.items()
            if (c := _min_cover(toks, _tok(text))) is not None and c <= within
        }
        got = {r["doc_id"]: r["min_cover"] for r in out if r["query_id"] == qid}
        assert got == expect, (qid, within)


def test_boolean_reference(spark, pos_index):
    idx, _, _ = pos_index
    bq = spark.createDataFrame(
        [
            ("m0", "hash join", None, None),        # conjunctive
            ("m1", "join", None, "spark"),          # exclusion
            ("m2", None, "sort merge", None),       # disjunctive scoring
            ("m3", "nosuchterm", "join", None),     # OOV must -> dead
            ("m4", None, None, "join"),             # no scoring terms -> dead
            ("m5", "join", "join join", None),      # qtf merge across roles
        ],
        "query_id string, must string, should string, must_not string",
    )
    out = search_boolean(idx, bq, k=20).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert by_q.get("m0") == {
        u for u, t in CORPUS.items() if "hash" in t and "join" in t
    }
    assert by_q.get("m1") == {
        u for u, t in CORPUS.items() if "join" in t and "spark" not in t
    }
    assert by_q.get("m2") == {
        u for u, t in CORPUS.items() if "sort" in t or "merge" in t
    }
    assert "m3" not in by_q and "m4" not in by_q
    # m5: same docs as plain 'join', score tripled (qtf 1 must + 2 should)
    single = {r["doc_id"]: r["score"] for r in search_boolean(
        idx,
        spark.createDataFrame([("s", "join", None, None)],
                              "query_id string, must string, should string, must_not string"),
        k=20,
    ).collect()}
    triple = {r["doc_id"]: r["score"] for r in out if r["query_id"] == "m5"}
    assert set(triple) == set(single)
    for u in single:
        assert triple[u] == pytest.approx(3 * single[u], rel=1e-12)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_phrase_distributed_branch_identity(spark, pos_index):
    """threshold=0 forces executor-side tokenization; results must be
    row-identical to the driver path, including the OOV-kill semantics."""
    idx, _, _ = pos_index
    q = spark.createDataFrame(
        [("a", "hash join"), ("b", "sort merge join"), ("c", "spark spark"),
         ("d", "nosuchterm join"), ("e", "spark"), ("f", "")],
        "query_id string, text string",
    )
    driver = search_phrase(idx, q, k=20)
    dist = search_phrase(idx, q, k=20, distributed_threshold=0)
    assert _rows(driver) == _rows(dist)


def test_proximity_distributed_branch_identity(spark, pos_index):
    idx, _, _ = pos_index
    q = spark.createDataFrame(
        [("a", "spark join"), ("b", "sort hash"), ("c", "hash join sort"),
         ("d", "spark nosuchterm")],
        "query_id string, text string",
    )
    driver = search_proximity(idx, q, within=3, k=20)
    dist = search_proximity(idx, q, within=3, k=20, distributed_threshold=0)
    assert _rows(driver) == _rows(dist)


def test_boolean_distributed_branch_identity(spark, pos_index):
    idx, _, _ = pos_index
    bq = spark.createDataFrame(
        [
            ("m0", "hash join", None, None),
            ("m1", "join", None, "spark"),
            ("m2", None, "sort merge", None),
            ("m3", "nosuchterm", "join", None),
            ("m4", None, None, "join"),
            ("m5", "join", "join join", None),
        ],
        "query_id string, must string, should string, must_not string",
    )
    driver = search_boolean(idx, bq, k=20)
    dist = search_boolean(idx, bq, k=20, distributed_threshold=0)
    assert _rows(driver) == _rows(dist)


def test_suggest_terms(spark, pos_index):
    from openmatch_spark.query import suggest_terms

    idx, _, _ = pos_index
    out = suggest_terms(idx, ["s", "jo", "zz"], k=3).collect()
    df_py = {}
    for toks in CORPUS.values():
        for t in set(toks):
            df_py[t] = df_py.get(t, 0) + 1
    for prefix in ["s", "jo"]:
        expect = sorted(
            ((t, d) for t, d in df_py.items() if t.startswith(prefix)),
            key=lambda kv: (-kv[1], kv[0]),
        )[:3]
        got = [
            (r["term"], r["df"])
            for r in sorted(
                (r for r in out if r["prefix"] == prefix), key=lambda r: r["rank"]
            )
        ]
        assert got == expect, prefix
    assert not [r for r in out if r["prefix"] == "zz"]
    with pytest.raises(ValueError):
        suggest_terms(idx, [], k=3)
    with pytest.raises(ValueError):
        suggest_terms(idx, ["a", ""], k=3)


def test_index_report(spark, pos_index):
    from openmatch_spark.index import index_report

    idx, _, _ = pos_index
    rep = index_report(idx)
    assert rep["n_docs"] == len([d for d, t in DOCS])
    assert rep["n_postings"] == sum(
        len(set(toks)) for toks in CORPUS.values()
    )  # one posting per distinct (term, doc)
    assert rep["n_terms"] == len({t for toks in CORPUS.values() for t in toks})
    assert rep["has_positions"] is True
    assert rep["n_segments"] == len(rep["segments"]) == 2
    assert sum(s["n_postings"] for s in rep["segments"]) == rep["n_postings"]
    assert rep["compression_ratio"] and rep["compression_ratio"] > 1.0


def test_compaction_invalidates_positions(spark, pos_index):
    """compact_index drops the sidecar (fail-safe) and phrase search then
    raises instead of silently missing the merged shard's docs."""
    import warnings

    from openmatch_spark.index import compact_index

    idx, pages, d = pos_index
    # build a THROWAWAY copy so the module-scoped fixture stays intact
    d2 = tempfile.mkdtemp(prefix="om_pos_compact_")
    build_index(
        spark, pages, d2, analyzer="simple", num_shards=2,
        num_term_buckets=4, block_size=4,
    )
    build_positions(spark, pages, d2)
    idx2 = load_index(spark, d2)
    assert idx2.has_positions()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        compact_index(spark, d2)
        assert any("positions" in str(x.message) for x in w)
    idx2 = load_index(spark, d2)
    assert not idx2.has_positions()
    q = spark.createDataFrame([("q", "hash join")], "query_id string, text string")
    with pytest.raises(FileNotFoundError):
        search_phrase(idx2, q, k=5).collect()
    # rebuild restores phrase search over the merged segment
    build_positions(spark, pages, d2)
    out = search_phrase(load_index(spark, d2), q, k=20).collect()
    expect = {
        u: f for u, toks in CORPUS.items()
        if (f := _phrase_freq(toks, ["hash", "join"])) > 0
    }
    assert {r["doc_id"]: r["phrase_freq"] for r in out} == expect
