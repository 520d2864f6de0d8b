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
    assert rows["a"]["n_bpe_tokens"] == 14  # all plain words: 1 segment each
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


class TestBucketCaps:
    """LSH hot-bucket quadratic blow-up protection (VERDICT r1 top scale
    fix): a boilerplate-heavy corpus must yield O(docs) candidate pairs,
    with the oversized buckets surfaced as whole duplicate groups."""

    N_BOILER = 400  # identical docs: uncapped LSH would emit ~80k pairs/band

    @pytest.fixture(scope="class")
    def skewed(self, spark):
        import pyspark.sql.functions as F

        boiler = spark.range(self.N_BOILER).select(
            F.concat(F.lit("boiler"), F.col("id")).alias("doc_id"),
            F.lit(
                "copyright all rights reserved terms of service privacy "
                "policy contact us about this site map home page footer"
            ).alias("text"),
        )
        unique = spark.range(50).select(
            F.concat(F.lit("uniq"), F.col("id")).alias("doc_id"),
            F.concat(
                F.lit("document number "), F.col("id").cast("string"),
                F.lit(" with distinct content token"),
                F.col("id").cast("string"), F.lit(" and more words "),
                (F.col("id") * 7 % 13).cast("string"),
                F.lit(" tail "), (F.col("id") * 31 % 17).cast("string"),
            ).alias("text"),
        )
        return boiler.unionByName(unique)

    def test_minhash_pairs_capped_linear(self, spark, skewed):
        from openmatch_spark.operators.dedup import (
            minhash_candidate_pairs,
            minhash_oversized_groups,
            minhash_signatures,
            shingles,
        )

        sh = shingles(skewed, n=3)
        sig = minhash_signatures(sh, num_hashes=8).cache()
        capped = minhash_candidate_pairs(sig, max_bucket=100)
        n_pairs = capped.count()
        # the 400-doc boilerplate bucket is excluded: remaining pairs are
        # bounded by docs * max_bucket, far below the ~79800 uncapped pairs
        assert n_pairs < 50 * 100
        boiler_pairs = capped.where(
            "doc_a LIKE 'boiler%' AND doc_b LIKE 'boiler%'"
        ).count()
        assert boiler_pairs == 0
        groups = minhash_oversized_groups(sig, max_bucket=100).collect()
        assert len(groups) >= 1
        assert all(g["n_docs"] == self.N_BOILER for g in groups)
        assert all(len(g["doc_ids"]) == self.N_BOILER for g in groups)
        # cap=None restores the uncapped quadratic behavior (opt-in)
        n_uncapped = minhash_candidate_pairs(sig, max_bucket=None).count()
        assert n_uncapped >= self.N_BOILER * (self.N_BOILER - 1) // 2
        sig.unpersist()

    def test_simhash_pairs_capped_linear(self, spark, skewed):
        from openmatch_spark.operators.dedup import (
            simhash_fingerprints,
            simhash_near_duplicates,
            simhash_oversized_groups,
        )

        fp = simhash_fingerprints(skewed).cache()
        capped = simhash_near_duplicates(fp, max_hamming=3, max_bucket=100)
        boiler_pairs = capped.where(
            "doc_a LIKE 'boiler%' AND doc_b LIKE 'boiler%'"
        ).count()
        assert boiler_pairs == 0
        groups = simhash_oversized_groups(fp, max_bucket=100).collect()
        assert len(groups) >= 1  # identical fingerprints share all 4 chunks
        assert max(g["n_docs"] for g in groups) >= self.N_BOILER
        fp.unpersist()


def test_deduplicate_corpus_pipeline(spark):
    """One-call dedup: exact dups, verified near-dups, and boilerplate
    bucket groups all resolve to min-id survivors in a single pass."""
    from openmatch_spark.operators.dedup import deduplicate_corpus

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base.replace("today", "tonight")
    rows = [
        ("a1", base),
        ("a2", base.upper()),            # exact dup of a1 (case-insensitive)
        ("a3", near),                    # near dup of a1 (1 token differs)
        ("b1", "completely different content about spark query engines today"),
    ]
    # boilerplate flood: oversized bucket under a tiny cap
    boiler = "all rights reserved terms of service privacy policy contact us"
    rows += [(f"c{i:03d}", boiler) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in deduplicate_corpus(
        df, jaccard_threshold=0.5, max_bucket=10
    ).collect()}
    assert len(out) == len(rows)
    assert out["a1"]["keep"] and out["b1"]["keep"]
    assert not out["a2"]["keep"] and out["a2"]["reason"] == "exact" and out["a2"]["dup_of"] == "a1"
    assert not out["a3"]["keep"] and out["a3"]["reason"] == "near" and out["a3"]["dup_of"] == "a1"
    # boilerplate: the 30 identical docs collapse via exact stage to c000
    c_survivors = [d for d in out if d.startswith("c") and out[d]["keep"]]
    assert c_survivors == ["c000"]
    kept = sum(1 for r in out.values() if r["keep"])
    assert kept == 3  # a1, b1, c000


def test_deduplicate_corpus_bucket_stage(spark):
    """Distinct-but-bucket-colliding docs (same shingle sets can't happen;
    force the bucket stage with near-identical NON-exact docs under a tiny
    cap): oversized buckets drop to the min id with reason 'bucket'."""
    from openmatch_spark.operators.dedup import deduplicate_corpus

    tmpl = "shared boilerplate header text common to every mirror page number"
    rows = [(f"m{i:02d}", f"{tmpl} {i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in deduplicate_corpus(
        df, jaccard_threshold=0.99, max_bucket=5
    ).collect()}
    # all 20 share most shingles -> every band bucket holds all 20 > cap=5
    dropped = [d for d, r in out.items() if not r["keep"]]
    assert dropped and all(out[d]["reason"] == "bucket" for d in dropped)
    assert out["m00"]["keep"]
    assert all(out[d]["dup_of"] == "m00" for d in dropped)


def test_curate_corpus_reasons_partition(spark):
    """Every input doc gets exactly one verdict; gates precede dedup (a doc
    failing the lang gate never becomes a dedup canonical)."""
    from openmatch_spark.operators.curate import curate_corpus

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs away home"),
        (2, "the quick brown fox jumps over the lazy dog and runs away home"),  # exact dup of 1
        (3, "der schnelle braune fuchs springt und der hund ist die katze im haus"),  # de
        (4, "zzz qqq xxx vvv"),  # no stopwords -> und + low quality
        (5, "a completely different english sentence with the usual common words in it today"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["keep"], r["reason"], r["dup_of"])
           for r in curate_corpus(corpus, langs=("en",), min_quality=0.3).collect()}
    assert len(out) == 5  # exactly one verdict per doc
    assert out["3"][1] == "lang" and out["4"][1] == "lang"
    assert out["1"] == (1, None, None)
    assert out["2"] == (0, "exact", "1")
    assert out["5"][0] == 1


def test_ngram_jaccard_cap_semantics(spark):
    """Exact join finds the clone pair; with every shingle over the df cap,
    candidate generation goes empty (boilerplate-only pairs are the LSH
    oversized-bucket regime, not the exact join's)."""
    from openmatch_spark.operators.dedup import ngram_jaccard_join

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "one two three four five six seven eight nine"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    out = ngram_jaccard_join(corpus, n=3, threshold=0.9, max_shingle_df=None).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in out] == [("1", "2", 1.0)]
    # df cap of 1 excludes every shared shingle from candidate generation
    assert ngram_jaccard_join(corpus, n=3, threshold=0.9, max_shingle_df=1).count() == 0
