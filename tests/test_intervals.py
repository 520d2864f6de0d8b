"""intervals query: ordered/unordered all_of over any_of slots, max_gaps."""

import re
import tempfile
from itertools import product

import pytest

from openmatch_spark.index import build_index, build_positions, load_index
from openmatch_spark.query import search_intervals

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


def _brute(toks, slots, ordered):
    """Tightest (window, gaps) embedding, or None. Slots are term lists."""
    poslists = [
        [i for i, t in enumerate(toks) if t in set(alts)] for alts in slots
    ]
    if any(not p for p in poslists):
        return None
    best = None
    for pick in product(*poslists):
        if ordered:
            if any(pick[j] >= pick[j + 1] for j in range(len(pick) - 1)):
                continue
        elif len(set(pick)) < len(pick):
            continue
        w = max(pick) - min(pick) + 1
        if best is None or w < best:
            best = w
    return None if best is None else (best, best - len(slots))


@pytest.fixture(scope="module")
def iv_index(spark):
    pages = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in DOCS],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    d = tempfile.mkdtemp(prefix="om_iv_idx_")
    build_index(
        spark, pages, d, analyzer="simple", num_shards=2,
        num_term_buckets=4, block_size=4,
    )
    build_positions(spark, pages, d)
    return load_index(spark, d)


def _run(idx, specs, k=20):
    return {
        (r["query_id"], r["doc_id"]): (r["window"], r["gaps"])
        for r in search_intervals(idx, specs, k=k).collect()
    }


def test_intervals_matches_brute_force(iv_index):
    cases = [
        ("o0", [["spark"], ["join"]], True, -1),
        ("o1", [["spark"], ["join"]], True, 1),
        ("o2", [["hash", "sort"], ["merge", "join"]], True, 0),
        ("o3", [["sort"], ["sort"]], True, -1),        # repeated slot term
        ("u0", [["spark"], ["merge", "tables"]], False, -1),
        ("u1", [["hash"], ["sort"], ["join"]], False, 2),
        ("u2", [["rank"], ["window", "partition"]], False, 0),
    ]
    specs = [
        {"query_id": q, "slots": s, "ordered": o, "max_gaps": g}
        for q, s, o, g in cases
    ]
    got = _run(iv_index, specs)
    want = {}
    for q, slots, ordered, max_gaps in cases:
        for u, toks in CORPUS.items():
            hit = _brute(toks, slots, ordered)
            if hit and (max_gaps < 0 or hit[1] <= max_gaps):
                want[(q, u)] = hit
    assert got == want


def test_intervals_oov_and_validation(iv_index):
    # a fully-OOV slot kills the query; an OOV alternative is dropped
    got = _run(iv_index, [
        {"query_id": "dead", "slots": [["spark"], ["zzzznope"]]},
        {"query_id": "alive", "slots": [["spark"], ["zzzznope", "join"]]},
    ])
    assert not any(q == "dead" for q, _ in got)
    assert ("alive", "doc://0") in got
    with pytest.raises(ValueError, match="disjoint"):
        search_intervals(iv_index, [
            {"query_id": "x", "slots": [["spark"], ["spark", "join"]],
             "ordered": False},
        ])
    with pytest.raises(ValueError, match="single terms"):
        search_intervals(iv_index, [
            {"query_id": "x", "slots": [["hash join"]]},
        ])
    with pytest.raises(ValueError, match="no alternatives"):
        search_intervals(iv_index, [{"query_id": "x", "slots": [[]]}])


def test_intervals_ranked_by_bm25(iv_index):
    run = search_intervals(
        iv_index, [{"query_id": "q", "slots": [["spark"], ["join"]]}]
    ).collect()
    ranks = sorted((r["rank"], r["doc_id"], r["score"]) for r in run)
    assert [r for r, _, _ in ranks] == list(range(1, len(ranks) + 1))
    scores = [s for _, _, s in sorted(ranks)]
    assert scores == sorted(scores, reverse=True)
