"""Round-3 additions: dedup connected-components closure, compaction
shard-id safety on partial builds, curate NULL-text verdicts, explicit
shard_override builds, and the incremental missing-manifest guard."""

import shutil

import pytest
import pyspark.sql.functions as F

from openmatch_spark.fixtures import PAGES_SCHEMA, QUERIES_SCHEMA, gen_pages_rows
from openmatch_spark.index import build_index, compact_index, load_index
from openmatch_spark.operators.dedup import (
    connected_components_min_label,
    deduplicate_corpus,
)
from openmatch_spark.query import search


# ---- connected components ---------------------------------------------------


def test_cc_min_label_basic(spark):
    # two components: {1,2,3,7} via chain 7-3-2-1, and {5,9}
    edges = spark.createDataFrame(
        [("2", "1"), ("3", "2"), ("7", "3"), ("9", "5")],
        "doc_a string, doc_b string",
    )
    comp = {
        r["doc_id"]: r["component"]
        for r in connected_components_min_label(edges).collect()
    }
    assert comp == {"1": "1", "2": "1", "3": "1", "7": "1", "5": "5", "9": "5"}


def test_cc_min_label_long_chain_and_star(spark):
    # a 40-node descending chain exercises pointer jumping (naive
    # propagation would need 40 rounds; this must settle well under 50)
    chain = [(f"{i:03d}", f"{i - 1:03d}") for i in range(1, 40)]
    star = [("900", "850"), ("901", "850"), ("902", "850")]
    edges = spark.createDataFrame(chain + star, "doc_a string, doc_b string")
    rows = connected_components_min_label(edges).collect()
    comp = {r["doc_id"]: r["component"] for r in rows}
    assert all(comp[f"{i:03d}"] == "000" for i in range(40))
    assert all(comp[x] == "850" for x in ("850", "900", "901", "902"))


CHAIN_DOCS = [
    # A: base text; B: near-dup of A (one token differs); C: exact dup of B
    # after normalization (case differs). Greedy dedup drops C with
    # dup_of=B (itself dropped — a chain); closure must resolve C to A.
    ("01", "the quick brown fox jumps over the lazy dog near the river bank today"),
    ("02", "the quick brown fox jumps over the lazy dog near the river bank tonight"),
    ("03", "The quick brown fox jumps over the LAZY dog near the river bank tonight"),
    ("04", "completely unrelated content about spark query engines and joins"),
]


@pytest.fixture(scope="module")
def chain_corpus(spark):
    return spark.createDataFrame(CHAIN_DOCS, "doc_id string, text string")


def test_dedup_closure_resolves_chains(chain_corpus):
    greedy = {
        r["doc_id"]: r
        for r in deduplicate_corpus(chain_corpus, jaccard_threshold=0.5).collect()
    }
    # sanity: the fixture really produces a chain in greedy mode
    assert not greedy["03"]["keep"] and greedy["03"]["dup_of"] == "02"
    assert not greedy["02"]["keep"] and greedy["02"]["dup_of"] == "01"

    closed = {
        r["doc_id"]: r
        for r in deduplicate_corpus(
            chain_corpus, jaccard_threshold=0.5, closure=True
        ).collect()
    }
    kept = {d for d, r in closed.items() if r["keep"]}
    assert kept == {"01", "04"}
    # every dup_of names a KEPT doc (the union-find root)
    for d, r in closed.items():
        if not r["keep"]:
            assert r["dup_of"] in kept, (d, r["dup_of"])
    assert closed["02"]["dup_of"] == "01" and closed["02"]["reason"] == "near"
    # C keeps its direct-edge reason (it IS an exact dup of B) but its
    # canonical is the component root
    assert closed["03"]["dup_of"] == "01" and closed["03"]["reason"] == "exact"


def test_dedup_closure_matches_greedy_on_chain_free_corpus(spark):
    docs = [
        ("a", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        ("b", "ALPHA beta gamma delta epsilon zeta eta theta iota kappa"),
        ("c", "totally different words here about benchmarking shuffle cost"),
    ]
    corpus = spark.createDataFrame(docs, "doc_id string, text string")
    g = sorted(map(tuple, deduplicate_corpus(corpus).collect()))
    c = sorted(map(tuple, deduplicate_corpus(corpus, closure=True).collect()))
    assert g == c


# ---- compaction shard-id safety --------------------------------------------


def test_compact_partial_build_refused_then_safe_after_resume(spark, tmp_path):
    """Compacting a PARTIALLY built index is unsound both ways — retiring a
    base shard id makes resume re-index those docs (duplicates), allocating
    the merged id inside the base range makes resume skip real docs — so
    compact_index must REFUSE until every base shard is committed. After
    resume completes the build, compaction works and allocates past the
    base range."""
    idx_dir = str(tmp_path / "idx")
    pages = spark.createDataFrame(gen_pages_rows(120), PAGES_SCHEMA)
    # commit only shards {0, 1} of 4, then crash
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(
            spark, pages, idx_dir, num_shards=4, num_term_buckets=4,
            shard_batch_size=1, fail_after_batches=2,
        )
    with pytest.raises(ValueError, match="partially built"):
        compact_index(spark, idx_dir, shards=[0, 1])

    # resume completes the remaining base shards; now compaction is legal
    build_index(
        spark, pages, idx_dir, num_shards=4, num_term_buckets=4, resume=True
    )
    res = compact_index(spark, idx_dir, shards=[0, 1])
    assert res["new_shard"] >= 4  # past the base range

    idx = load_index(spark, idx_dir)
    assert idx.docmap.count() == 120  # nothing duplicated, nothing lost
    queries = spark.createDataFrame([("q1", "term0001 term0003")], QUERIES_SCHEMA)
    assert search(idx, queries, k=5).count() > 0


# ---- curate NULL-text contract ---------------------------------------------


def test_curate_null_text_gets_verdict(spark):
    from openmatch_spark.operators.curate import curate_corpus

    docs = [
        ("1", "the quick brown fox jumps over the lazy dog and runs away fast "
              "because it is being chased by the farmer with his own dog today"),
        ("2", None),
        ("3", "der schnelle braune fuchs springt und das ist nicht mit ein problem"),
    ]
    corpus = spark.createDataFrame(docs, "doc_id string, text string")
    rows = {r["doc_id"]: r for r in curate_corpus(corpus, min_quality=0.2).collect()}
    assert set(rows) == {"1", "2", "3"}  # one verdict row per input row
    assert rows["2"]["keep"] == 0 and rows["2"]["reason"] == "lang"
    assert rows["3"]["keep"] == 0 and rows["3"]["reason"] == "lang"
    assert rows["1"]["keep"] == 1


# ---- shard_override ---------------------------------------------------------


def test_build_index_shard_override(spark, tmp_path):
    idx_dir = str(tmp_path / "idx")
    pages = spark.createDataFrame(gen_pages_rows(40), PAGES_SCHEMA)
    build_index(
        spark, pages, idx_dir, num_shards=4, num_term_buckets=4,
        shard_override=2,
    )
    idx = load_index(spark, idx_dir)
    shards = {r["shard"] for r in idx.docmap.select("shard").distinct().collect()}
    assert shards == {2}
    assert idx.docmap.count() == 40
    queries = spark.createDataFrame([("q1", "term0001 term0003")], QUERIES_SCHEMA)
    assert search(idx, queries, k=5).count() > 0


def test_build_index_shard_override_validates(spark, tmp_path):
    pages = spark.createDataFrame(gen_pages_rows(5), PAGES_SCHEMA)
    with pytest.raises(ValueError, match="shard_override"):
        build_index(
            spark, pages, str(tmp_path / "idx"), num_shards=4, shard_override=7
        )


# ---- incremental missing-manifest guard ------------------------------------


def test_incremental_missing_manifest_raises(spark, tmp_path):
    from openmatch_spark.index.layout import IndexPaths
    from openmatch_spark.streaming.incremental import (
        incremental_index_available_now,
    )

    idx_dir = str(tmp_path / "idx")
    watch = tmp_path / "watch"
    watch.mkdir()
    rows = gen_pages_rows(80)
    base, e1, e2 = rows[:60], rows[60:70], rows[70:]
    build_index(
        spark, spark.createDataFrame(base, PAGES_SCHEMA), idx_dir,
        num_shards=2, num_term_buckets=4,
    )

    # first drain appends shard 2 (>= num_shards) and commits a manifest
    spark.createDataFrame(e1, PAGES_SCHEMA).write.parquet(str(watch / "b0"))
    n = incremental_index_available_now(
        spark, str(watch), idx_dir, str(tmp_path / "ck0")
    )
    assert n == 1

    # simulate a crashed path-mode manifest rewrite: manifest gone, but
    # postings for shard 2 are on disk — the next drain must refuse to
    # fall back to stats.num_shards (which would re-issue shard 2)
    shutil.rmtree(IndexPaths(idx_dir).manifest)
    spark.createDataFrame(e2, PAGES_SCHEMA).write.parquet(str(watch / "b1"))
    with pytest.raises(RuntimeError, match="no manifest"):
        incremental_index_available_now(
            spark, str(watch), idx_dir, str(tmp_path / "ck1")
        )


# ---- dense DataFrame-native query paths ------------------------------------


def _rand_vecs(n, dim, seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    return [
        (f"v{i:05d}", [float(x) for x in rng.standard_normal(dim)])
        for i in range(n)
    ]


def _as_rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 9))
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def dense_fixture(spark):
    corpus = spark.createDataFrame(
        _rand_vecs(400, 8, seed=1), "vec_id string, embedding array<float>"
    ).repartition(4).cache()
    queries = [
        (f"q{i:05d}", v) for i, (_, v) in enumerate(_rand_vecs(3000, 8, seed=2))
    ]
    # array<double>: the closure path consumes the python float64 list, so
    # the DataFrame must carry the same values for a row-identity check
    qdf = spark.createDataFrame(
        [(q, v) for q, v in queries], "query_id string, embedding array<double>"
    ).repartition(4).cache()
    return corpus, queries, qdf


def test_brute_force_df_path_matches_closure(spark, dense_fixture):
    """A large query batch passed as a DataFrame (torrent-broadcast matrix)
    returns rows identical to the closure path."""
    from openmatch_spark.query.dense import brute_force_topk

    corpus, queries, qdf = dense_fixture
    a = _as_rows(brute_force_topk(corpus, queries, k=5))
    b = _as_rows(brute_force_topk(corpus, qdf, k=5))
    assert a == b and len(a) == 3000 * 5


def test_ivf_df_path_matches_closure(spark, dense_fixture):
    """The cogroup-on-bucket IVF path (queries never on the driver) returns
    rows identical to the closure kernel, with and without hot-cell salting."""
    from openmatch_spark.query.dense import assign_buckets, ivf_topk, ivf_topk_df

    corpus, queries, qdf = dense_fixture
    bucketed = assign_buckets(corpus, dim=8, n_centroids=8).cache()
    a = _as_rows(ivf_topk(bucketed, queries, dim=8, k=5, n_centroids=8, nprobe=3))
    b = _as_rows(ivf_topk(bucketed, qdf, dim=8, k=5, n_centroids=8, nprobe=3))
    assert a == b and len(a) == 3000 * 5
    c = _as_rows(
        ivf_topk_df(
            bucketed, qdf, dim=8, k=5, n_centroids=8, nprobe=3, bucket_splits=3
        )
    )
    assert a == c


# ---- rerank distributed-vocabulary fallback --------------------------------


def test_rerank_bm25_large_batch(spark, tmp_path, monkeypatch):
    """Above the distributed-tokenize threshold, rerank_bm25 must not
    collect query TEXTS driver-side — and must score identically to the
    small-batch path."""
    import openmatch_spark.operators.rerank as rr_mod
    from openmatch_spark.fixtures import gen_queries_rows
    from openmatch_spark.operators.rerank import rerank_bm25

    pages = spark.createDataFrame(gen_pages_rows(80), PAGES_SCHEMA)
    idx_dir = str(tmp_path / "idx")
    build_index(spark, pages, idx_dir, num_shards=2, num_term_buckets=4)
    idx = load_index(spark, idx_dir)
    queries = spark.createDataFrame(gen_queries_rows(12), QUERIES_SCHEMA)
    run = search(idx, queries, k=5)
    corpus = pages.select(F.col("url").alias("doc_id"), "text")

    small = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in rerank_bm25(idx, run, corpus, queries).collect()
    )
    # force the distributed-vocabulary branch on the same batch
    monkeypatch.setattr(
        "openmatch_spark.query.bm25_search._DISTRIBUTED_TOKENIZE_MIN_QUERIES", 4
    )
    big = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in rerank_bm25(idx, run, corpus, queries).collect()
    )
    assert small == big and len(small) > 0


# ---- stats rebaseline at compaction ----------------------------------------


def test_compact_rebaseline_converges_to_fresh_build(spark, tmp_path):
    """Base build + incremental drain freezes N/avgdl/idf at base values;
    compact_index(rebaseline_stats=True) must make search scores, the
    dictionary, and stats.json EXACTLY equal to a one-shot build over the
    union corpus (tf recovered from stored weights, bit-identical re-weight
    expressions)."""
    rows = gen_pages_rows(160)
    base, extra = rows[:100], rows[100:]
    # marker term unseen at base build: its idf is frozen at base-N by the
    # drain and must be re-baselined to union-N by the compaction
    extra = [(u, ts, h, t + " zzzrebase", lang) for (u, ts, h, t, lang) in extra]
    idx_dir = str(tmp_path / "inc")
    build_index(
        spark, spark.createDataFrame(base, PAGES_SCHEMA), idx_dir,
        num_shards=2, num_term_buckets=4,
    )
    build_index(
        spark, spark.createDataFrame(extra, PAGES_SCHEMA), idx_dir,
        num_shards=3, num_term_buckets=4, resume=True,
        extend_dictionary=True, shard_override=2,
    )
    with pytest.raises(ValueError, match="ALL committed"):
        compact_index(spark, idx_dir, shards=[0, 1], rebaseline_stats=True)
    compact_index(spark, idx_dir, rebaseline_stats=True)

    fresh_dir = str(tmp_path / "fresh")
    build_index(
        spark, spark.createDataFrame(base + extra, PAGES_SCHEMA), fresh_dir,
        num_shards=2, num_term_buckets=4,
    )

    from openmatch_spark.fixtures import gen_queries_rows

    queries = spark.createDataFrame(
        gen_queries_rows(10) + [("qz", "zzzrebase term0001")], QUERIES_SCHEMA
    )
    idx_a, idx_b = load_index(spark, idx_dir), load_index(spark, fresh_dir)
    a = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in search(idx_a, queries, k=10).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in search(idx_b, queries, k=10).collect()
    )
    assert a == b  # scores bit-identical, not approx

    da = sorted(map(tuple, idx_a.dictionary.select("term", "df", "cf", "idf").collect()))
    db = sorted(map(tuple, idx_b.dictionary.select("term", "df", "cf", "idf").collect()))
    assert da == db
    assert idx_a.stats["n_docs"] == idx_b.stats["n_docs"]
    assert idx_a.stats["avgdl"] == idx_b.stats["avgdl"]
    assert idx_a.stats["total_terms"] == idx_b.stats["total_terms"]


# ---- winnowing vs pure-python oracle ---------------------------------------


def _py_winnow(tokens, k, w):
    """Reference winnowing (Schleimer et al. 2003): k-gram md5-prefix64>>1
    hashes, min of every w-window (one clipped window when n_grams < w),
    distinct sorted."""
    import hashlib

    if len(tokens) < k:
        return []
    grams = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:16], 16) >> 1 for g in grams]
    starts = range(0, max(len(hs) - w, 0) + 1)
    return sorted({min(hs[s : s + w]) for s in starts})


@pytest.mark.parametrize("k,w", [(5, 4), (2, 1), (1, 3), (3, 8)])
def test_winnow_fingerprints_match_python_oracle(spark, k, w):
    """Edge-case battery: every token count around the k and w boundaries,
    adversarial all-same-token boilerplate (every gram hash collides — the
    fingerprint must collapse to that single hash), and alternating tokens.
    One Spark job for the whole battery."""
    from openmatch_spark.operators.textstats import fingerprints

    docs, expected = [], {}
    i = 0
    for n in range(0, 17):
        for kind, toks in [
            ("distinct", [f"tok{j}" for j in range(n)]),
            ("same", ["boiler"] * n),
            ("alt", [("aa", "bb")[j % 2] for j in range(n)]),
        ]:
            did = f"d{i:03d}_{kind}{n}"
            docs.append((did, " ".join(toks)))
            expected[did] = _py_winnow(toks, k, w)
            i += 1
    corpus = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        r["doc_id"]: sorted(r["fingerprint"])
        for r in fingerprints(corpus, analyzer="simple", k=k, w=w).collect()
    }
    assert set(got) == set(expected)
    for did in expected:
        assert got[did] == expected[did], did


# ---- bucketed embedding near-dup -------------------------------------------


def test_cosine_neardup_bucketed(spark):
    """Exact duplicates always collide (identical vectors share every probe
    cell), and every reported pair is truly above threshold (verification
    is exact regardless of bucketing)."""
    import numpy as np

    from openmatch_spark.operators.dedup import cosine_neardup_bucketed

    rng = np.random.default_rng(5)
    base = [(f"a{i:03d}", [float(x) for x in rng.standard_normal(8)]) for i in range(60)]
    dups = [(f"b{i:03d}", v) for i, (_, v) in enumerate(base[:10])]  # exact copies
    emb = spark.createDataFrame(base + dups, "vec_id string, embedding array<float>")
    out = cosine_neardup_bucketed(
        emb, dim=8, threshold=0.999, n_centroids=4, probes=2
    ).collect()
    pairs = {(r["vec_a"], r["vec_b"]) for r in out}
    for i in range(10):
        assert (f"a{i:03d}", f"b{i:03d}") in pairs
    # exactness of verification: recompute each reported cosine in numpy
    vecs = {k: np.asarray(v, dtype=np.float64) for k, v in base + dups}
    for r in out:
        va, vb = vecs[r["vec_a"]], vecs[r["vec_b"]]
        cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert cos >= 0.999 - 1e-9


# ---- gopher quality flags ---------------------------------------------------


def test_gopher_quality_flags_rules(spark):
    from openmatch_spark.operators.textstats import gopher_quality_flags

    good = " ".join(
        ["the quick brown fox jumps over that lazy dog with energy and grace"] * 5
    )
    docs = [
        ("good", good),
        ("short", "too few words here"),                        # word count
        ("symbols", " ".join(["word#tag"] * 60)),               # '#' ratio
        ("bullets", "\n".join(["• item one here"] * 10) + "\n"
                    + good),                                    # high but <=0.9 -> passes bullets
        ("ellipsis", "\n".join(["trailing off..."] * 10)),      # ellipsis lines
        ("numeric", " ".join(["12345"] * 80)),                  # alpha ratio + stopwords
    ]
    rows = {
        r["doc_id"]: r
        for r in gopher_quality_flags(
            spark.createDataFrame(docs, "doc_id string, text string"),
            min_words=10,
        ).collect()
    }
    g = rows["good"]
    assert g["gopher_pass"] == 1 and g["ok_stopwords"] == 1
    assert rows["short"]["ok_word_count"] == 0 and rows["short"]["gopher_pass"] == 0
    assert rows["symbols"]["ok_symbol_ratio"] == 0
    assert rows["ellipsis"]["ok_ellipsis_ratio"] == 0
    n = rows["numeric"]
    assert n["ok_alpha_words"] == 0 and n["ok_stopwords"] == 0
    # bullet doc: 10 of 11 lines bullet-led (0.909... > 0.9) -> fails
    assert rows["bullets"]["ok_bullet_ratio"] == 0


def test_single_shard_rebaseline_idempotent(spark, tmp_path):
    """A 1-shard rebaseline is legal (needed after --auto settles to one
    segment, or to re-run a crashed rebaseline) and, on a fresh build whose
    stats are already correct, is a score-identical no-op rewrite."""
    idx_dir = str(tmp_path / "idx")
    pages = spark.createDataFrame(gen_pages_rows(80), PAGES_SCHEMA)
    build_index(spark, pages, idx_dir, num_shards=2, num_term_buckets=4)
    compact_index(spark, idx_dir)  # settle into one segment
    queries = spark.createDataFrame(
        [("q1", "term0001 term0003"), ("q2", "term0010")], QUERIES_SCHEMA
    )
    pre = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in search(load_index(spark, idx_dir), queries, k=10).collect()
    )
    res = compact_index(spark, idx_dir, rebaseline_stats=True)  # single shard
    assert res["merged"] == [res["new_shard"] - 1] or len(res["merged"]) == 1
    post = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in search(load_index(spark, idx_dir), queries, k=10).collect()
    )
    assert pre == post


def test_dense_empty_query_batches(spark):
    from openmatch_spark.query.dense import assign_buckets, brute_force_topk, ivf_topk

    emb = spark.createDataFrame(
        [("v1", [1.0, 0.0]), ("v2", [0.0, 1.0])], "vec_id string, embedding array<float>"
    )
    assert brute_force_topk(emb, [], k=3).count() == 0
    empty_df = spark.createDataFrame([], "query_id string, embedding array<double>")
    assert brute_force_topk(emb, empty_df, k=3).count() == 0
    b = assign_buckets(emb, dim=2, n_centroids=2)
    assert ivf_topk(b, [], dim=2, k=3, n_centroids=2).count() == 0
    from openmatch_spark.query.dense import ivf_topk_df

    assert ivf_topk_df(b, empty_df, dim=2, k=3, n_centroids=2).count() == 0


# ---- PII redaction ----------------------------------------------------------


def test_redact_pii(spark):
    import pyspark.sql.functions as F

    from openmatch_spark.operators.textstats import pii_counts, redact_pii_col

    docs = [
        ("1", "mail me at jane.doe+x@sub.example.co.uk and 192.168.1.77 ok"),
        ("2", "call +44 20 7946 0958 or +1 (555) 123-4567 now"),
        ("3", "nothing sensitive here, version 1.2 of the doc"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    rows = {r["doc_id"]: r for r in pii_counts(df).collect()}
    assert rows["1"]["n_emails"] == 1 and rows["1"]["n_ipv4"] == 1
    assert "<EMAIL>" in rows["1"]["redacted"] and "<IP>" in rows["1"]["redacted"]
    assert "jane.doe" not in rows["1"]["redacted"]
    assert rows["2"]["n_phones"] == 2
    assert rows["2"]["redacted"].count("<PHONE>") == 2
    assert rows["3"]["n_emails"] == 0 and rows["3"]["n_ipv4"] == 0
    assert rows["3"]["redacted"] == docs[2][1]  # untouched

    # kinds subset: only emails scrubbed
    partial = df.select(
        "doc_id", redact_pii_col(F.col("text"), kinds=("email",)).alias("t")
    ).collect()
    p = {r["doc_id"]: r["t"] for r in partial}
    assert "<EMAIL>" in p["1"] and "192.168.1.77" in p["1"]


def test_repetition_signals(spark):
    from openmatch_spark.operators.textstats import repetition_signals

    docs = [
        ("clean", "alpha beta gamma\ndelta epsilon zeta"),
        ("dupl", "same line here\nsame line here\nother line"),
        ("gram", "spam ham spam ham spam ham spam ham"),
        ("tiny", "one"),
    ]
    rows = {
        r["doc_id"]: r
        for r in repetition_signals(
            spark.createDataFrame(docs, "doc_id string, text string")
        ).collect()
    }
    assert rows["clean"]["dup_line_ratio"] == 0.0
    d = rows["dupl"]
    assert d["n_lines"] == 3 and abs(d["dup_line_ratio"] - (1 - 2 / 3)) < 1e-6
    # chars beyond first occurrence: one extra "same line here" (14 chars)
    # over 14+14+10=38 total line chars
    assert abs(d["dup_line_char_ratio"] - 14 / 38) < 1e-6
    g = rows["gram"]
    assert g["top_bigram"] in ("spam ham", "ham spam")
    assert g["top_bigram_count"] == 4
    t = rows["tiny"]
    assert t["top_bigram"] == "" and t["top_bigram_count"] == 0
