"""Dedup (exact / MinHash-LSH / SimHash) + text-analysis operators."""

import pytest

from openmatch_spark.operators.dedup import (
    exact_duplicates,
    jaccard_pairs,
    minhash_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash_fingerprints,
    simhash_near_duplicates,
)
from openmatch_spark.operators.textstats import (
    fingerprints,
    language_id,
    quality_scores,
    token_counts,
)

DOCS = [
    ("a", "the quick brown fox jumps over the lazy dog near the river bank today"),
    ("b", "The quick brown fox jumps over the lazy dog near the river bank today"),  # case dup of a
    ("c", "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near-dup
    ("d", "der schnelle braune fuchs springt und das ist nicht mit ein problem den tag"),
    ("e", "completely different content about spark query engines and distributed joins"),
    ("f", "le renard brun et rapide saute pour la les des est pas une grande question"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_exact_duplicates(corpus):
    groups = exact_duplicates(corpus).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["doc_ids"] == ["a", "b"] and g["canonical_doc_id"] == "a"


def test_minhash_lsh_finds_near_dup(corpus):
    sh = shingles(corpus, n=3).cache()
    sig = minhash_signatures(sh, num_hashes=8)
    cand = minhash_candidate_pairs(sig, num_bands=4, num_hashes=8)
    pairs = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    assert ("a", "b") in pairs  # exact dup always collides on every band
    verified = jaccard_pairs(sh, cand).collect()
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in verified}
    assert jac[("a", "b")] == pytest.approx(1.0)
    if ("a", "c") in jac:
        assert 0.5 < jac[("a", "c")] < 1.0


def test_jaccard_matches_python(corpus):
    sh = shingles(corpus, n=3).cache()
    rows = sh.collect()
    sets = {}
    for r in rows:
        sets.setdefault(r["doc_id"], set()).add(r["shingle"])
    sig = minhash_signatures(sh, num_hashes=8)
    cand = minhash_candidate_pairs(sig)
    for r in jaccard_pairs(sh, cand).collect():
        a, b = sets[r["doc_a"]], sets[r["doc_b"]]
        expect = len(a & b) / len(a | b)
        assert r["jaccard"] == pytest.approx(expect)


def test_simhash_near_duplicates(corpus):
    fp = simhash_fingerprints(corpus)
    vals = {r["doc_id"]: r["simhash"] for r in fp.collect()}
    assert vals["a"] == vals["b"]  # identical token multiset
    near = simhash_near_duplicates(fp, max_hamming=16)
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in near.collect()}
    assert pairs.get(("a", "b")) == 0


def test_token_counts(corpus):
    rows = {r["doc_id"]: r for r in token_counts(corpus).collect()}
    assert rows["a"]["n_tokens"] == 14
    assert rows["a"]["n_unique_tokens"] == 12  # 'the' x3
    assert rows["a"]["n_chars"] == len(DOCS[0][1])


def test_language_id(corpus):
    rows = {r["doc_id"]: r["pred_lang"] for r in language_id(corpus).collect()}
    assert rows["a"] == "en" and rows["d"] == "de" and rows["f"] == "fr"


def test_quality_scores(corpus):
    rows = {r["doc_id"]: r for r in quality_scores(corpus).collect()}
    for r in rows.values():
        assert 0.0 <= r["quality"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0
    assert rows["a"]["stopword_ratio"] > rows["e"]["stopword_ratio"]


def test_fingerprints_deterministic_and_similar(corpus):
    fp1 = {r["doc_id"]: r["fingerprint"] for r in fingerprints(corpus).collect()}
    fp2 = {r["doc_id"]: r["fingerprint"] for r in fingerprints(corpus).collect()}
    assert fp1 == fp2
    assert fp1["a"] == fp1["b"]
    inter = set(fp1["a"]) & set(fp1["c"])
    assert len(inter) > 0  # near-dups share winnowed hashes
    assert not set(fp1["a"]) & set(fp1["e"])
