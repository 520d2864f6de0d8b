"""Seeded fuzz equivalence: the pure-JVM simhash / winnowing kernels must be
bit-identical to straightforward single-process Python references (the same
algorithms the r1 pandas-UDF kernels implemented) over randomized corpora
including edge cases — one Spark job per kernel, 300 docs."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest


def _py_winnow(tokens: list[str], K: int = 5, W: int = 4) -> set[int]:
    if len(tokens) < K:
        return set()
    hs = [
        int.from_bytes(hashlib.md5(" ".join(tokens[i:i + K]).encode()).digest()[:8], "big") >> 1
        for i in range(len(tokens) - K + 1)
    ]
    return {min(hs[i:i + W]) for i in range(max(len(hs) - W + 1, 1))}


def _py_simhash(tokens: list[str]) -> int:
    if not tokens:
        return 0
    from collections import Counter

    acc = [0] * 64
    for t, c in Counter(tokens).items():
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        for i in range(64):
            acc[i] += c if (h >> i) & 1 else -c
    fp = 0
    for i in range(64):
        if acc[i] > 0:
            fp |= 1 << i
    return fp - (1 << 64) if fp >= (1 << 63) else fp


@pytest.fixture(scope="module")
def fuzz_corpus():
    rng = np.random.default_rng(1234)
    vocab = [f"w{i}" for i in range(40)] + ["x9", "0", "a"]
    docs = []
    for i in range(300):
        n = int(rng.integers(0, 40))
        toks = [vocab[int(j)] for j in rng.integers(0, len(vocab), n)]
        docs.append((f"d{i}", " ".join(toks), toks))
    # edge cases: empty, single token, exactly K tokens, K-1, heavy repeats
    docs += [
        ("edge_empty", "", []),
        ("edge_one", "solo", ["solo"]),
        ("edge_k", "a b c d e", ["a", "b", "c", "d", "e"]),
        ("edge_km1", "a b c d", ["a", "b", "c", "d"]),
        ("edge_rep", "z z z z z z z z z z", ["z"] * 10),
    ]
    return docs


def test_winnow_fuzz_equivalence(spark, fuzz_corpus):
    from openmatch_spark.operators.textstats import winnow_fingerprints

    df = spark.createDataFrame(
        [(d, t) for d, t, _ in fuzz_corpus], "doc_id string, text string"
    )
    got: dict[str, set] = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    for did, _, toks in fuzz_corpus:
        assert got.get(did, set()) == _py_winnow(toks), did


def test_simhash_fuzz_equivalence(spark, fuzz_corpus):
    from openmatch_spark.operators.dedup import simhash_fingerprints

    df = spark.createDataFrame(
        [(d, t) for d, t, _ in fuzz_corpus], "doc_id string, text string"
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(df).collect()}
    for did, _, toks in fuzz_corpus:
        assert got[did] == _py_simhash(toks), did
