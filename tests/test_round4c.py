"""Round-4c query surfaces: field collapsing (query/collapse.py),
did-you-mean spelling (query/spell.py), MoreLikeThis (query/mlt.py),
and score explanation (query/explain.py)."""

import collections
import re

import pyspark.sql.functions as F
import pytest

from openmatch_spark.fixtures import PAGES_SCHEMA, QUERIES_SCHEMA, pages_df, queries_df
from openmatch_spark.index import build_index, load_index
from openmatch_spark.query import (
    collapse_run,
    correct_queries,
    explain_adhoc,
    host_key_col,
    more_like_this,
    mlt_terms,
    search,
    search_collapsed,
    suggest_spelling,
)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("r4c") / "idx")
    build_index(
        spark, pages_df(spark, 300), d,
        analyzer="simple", num_shards=3, num_term_buckets=4,
    )
    return load_index(spark, d)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------- collapse

def test_collapse_matches_python_reference(spark, idx):
    qs = queries_df(spark, 5)
    got = sorted(
        (r["query_id"], r["doc_id"], round(r["score"], 9), r["rank"])
        for r in search_collapsed(
            idx, qs, host_key_col("doc_id"), k=5, depth=1000
        ).collect()
    )
    flat = search(idx, qs, k=1000).collect()

    def host(u):
        return re.match(
            r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", u
        ).group(1).lower()

    byq = collections.defaultdict(list)
    for r in flat:
        byq[r["query_id"]].append(r)
    ref = []
    for q, hits in byq.items():
        best = {}
        for r in sorted(hits, key=lambda r: (-r["score"], r["doc_id"])):
            best.setdefault(host(r["doc_id"]), r)
        for i, r in enumerate(
            sorted(best.values(), key=lambda r: (-r["score"], r["doc_id"]))[:5], 1
        ):
            ref.append((q, r["doc_id"], round(r["score"], 9), i))
    assert got == sorted(ref)


def test_collapse_one_hit_per_key(spark, idx):
    qs = queries_df(spark, 5)
    rows = search_collapsed(idx, qs, host_key_col("doc_id"), k=8, depth=800).collect()
    seen = collections.Counter((r["query_id"], r["collapse_key"]) for r in rows)
    assert rows and max(seen.values()) == 1


def test_collapse_dataframe_key_equals_expression_key(spark, idx):
    qs = queries_df(spark, 4)
    pages = pages_df(spark, 300)
    keys = pages.select(
        F.col("url").alias("doc_id"), host_key_col("url").alias("collapse_key")
    )
    a = _rows(search_collapsed(idx, qs, host_key_col("doc_id"), k=5, depth=500))
    b = _rows(search_collapsed(idx, qs, keys, k=5, depth=500))
    assert a == b


def test_collapse_uncovered_docs_are_singleton_groups(spark):
    # ES missing-field behavior: hits without a key row collapse alone
    run = spark.createDataFrame(
        [("q1", "d1", 3.0, 1), ("q1", "d2", 2.0, 2), ("q1", "d3", 1.0, 3)],
        "query_id string, doc_id string, score double, rank int",
    )
    keys = spark.createDataFrame(
        [("d1", "g"), ("d2", "g")], "doc_id string, collapse_key string"
    )
    out = {r["doc_id"]: r for r in collapse_run(run, keys, k=10).collect()}
    assert set(out) == {"d1", "d3"}  # d2 collapsed under d1's key
    assert out["d3"]["collapse_key"] == "d3"  # singleton group = own doc_id


def test_collapse_crowded_host_frees_slots(spark, tmp_path):
    # one 'host' dominating the flat top-k must take only ONE collapsed slot
    rows = [
        (f"https://big.example/{i}", None,
         b"", "common filler " + "hot " * (20 - i), "en")
        for i in range(10)
    ] + [
        (f"https://site{i}.example/x", None, b"", "common filler cold", "en")
        for i in range(5)
    ]
    d = str(tmp_path / "crowd")
    build_index(
        spark, spark.createDataFrame(rows, PAGES_SCHEMA), d,
        analyzer="simple", num_shards=2, num_term_buckets=2,
    )
    cidx = load_index(spark, d)
    q = spark.createDataFrame([("q1", "hot common")], QUERIES_SCHEMA)
    flat = search(cidx, q, k=6).collect()
    assert sum("big.example" in r["doc_id"] for r in flat) == 6  # crowded
    col = search_collapsed(cidx, q, host_key_col("doc_id"), k=6, depth=100).collect()
    assert sum("big.example" in r["collapse_key"] for r in col) == 1
    assert len(col) == 6  # the freed slots surface the other hosts


def test_collapse_depth_must_cover_k(idx, spark):
    with pytest.raises(ValueError):
        search_collapsed(idx, queries_df(spark, 1), host_key_col("doc_id"),
                         k=10, depth=5)


# ------------------------------------------------------------------- spell

def test_spell_suggests_nearest_then_most_frequent(spark, idx):
    # fixture vocabulary is term0000..term4999; 'tarm0001' is 1 edit from
    # term0001 but 2 edits from many others — edits win over df
    q = spark.createDataFrame([("s1", "tarm0001")], QUERIES_SCHEMA)
    rows = suggest_spelling(idx, q, max_edits=2, n_suggestions=3).collect()
    assert rows[0]["suggestion"] == "term0001" and rows[0]["edits"] == 1
    assert [r["sug_rank"] for r in rows] == [1, 2, 3]
    # ranks 2+ are 2-edit candidates ordered by df DESC (Zipf: lower index
    # = more frequent), so term0000 precedes term0002
    assert rows[1]["edits"] == 2 and rows[1]["df"] >= rows[2]["df"]


def test_spell_known_token_and_hopeless_token_emit_nothing(spark, idx):
    q = spark.createDataFrame(
        [("s1", "term0001 zzzzzzzz")], QUERIES_SCHEMA
    )
    rows = suggest_spelling(idx, q, max_edits=2).collect()
    assert rows == []  # in-vocabulary + no candidate within gates


def test_spell_prefix_gate(spark, idx):
    # 'xerm0001' is 1 edit from term0001 but fails the first-char gate
    q = spark.createDataFrame([("s1", "xerm0001")], QUERIES_SCHEMA)
    assert suggest_spelling(idx, q, max_edits=2, prefix_len=1).collect() == []


def test_correct_queries_rewrites_only_correctable_tokens(spark, idx):
    q = spark.createDataFrame([("s1", "tarm0001 zzzznope term0002")], QUERIES_SCHEMA)
    out = correct_queries(idx, q).collect()
    assert out[0]["corrected"] == "term0001 zzzznope term0002"


# --------------------------------------------------------------------- MLT

@pytest.fixture(scope="module")
def mlt_idx(spark, tmp_path_factory):
    # controlled vocabulary: docs share 'filler'; doc A repeats rare terms
    rows = [
        ("https://a.example/seed", None, b"",
         "alpha alpha beta beta gamma filler filler", "en"),
        ("https://b.example/near", None, b"",
         "alpha alpha beta filler", "en"),
        ("https://c.example/far", None, b"", "delta filler", "en"),
        ("https://d.example/alpha", None, b"", "alpha filler", "en"),
        ("https://e.example/other", None, b"", "epsilon zeta filler", "en"),
    ]
    d = str(tmp_path_factory.mktemp("mlt") / "idx")
    build_index(
        spark, spark.createDataFrame(rows, PAGES_SCHEMA), d,
        analyzer="simple", num_shards=2, num_term_buckets=2,
    )
    return load_index(spark, d)


def _seed(spark):
    return spark.createDataFrame(
        [("https://a.example/seed", "alpha alpha beta beta gamma filler filler")],
        "doc_id string, text string",
    )


def test_mlt_gates_select_expected_terms(spark, mlt_idx):
    # min_tf=2 drops gamma (tf 1); max_df_pct=0.7 (max_df 3.5) drops filler
    # (df 5/5); alpha (tf 2, df 3) and beta (tf 2, df 2) survive
    terms = {t for (_, t, _, _) in mlt_terms(
        mlt_idx, _seed(spark), min_tf=2, min_df=2, max_df_pct=0.7
    )}
    assert terms == {"alpha", "beta"}


def test_mlt_max_query_terms_cut_is_deterministic(spark, mlt_idx):
    sel = mlt_terms(mlt_idx, _seed(spark), min_tf=1, min_df=1,
                    max_df_pct=0.5, max_query_terms=1)
    assert len(sel) == 1  # highest interest only


def test_mlt_excludes_seed_and_ranks_nearest_first(spark, mlt_idx):
    run = more_like_this(mlt_idx, _seed(spark), k=3, min_tf=2, min_df=2,
                         max_df_pct=0.7).collect()
    ids = [r["doc_id"] for r in sorted(run, key=lambda r: r["rank"])]
    assert "https://a.example/seed" not in ids
    assert ids[0] == "https://b.example/near"  # shares alpha AND beta


def test_mlt_include_seed_ranks_seed_first(spark, mlt_idx):
    run = more_like_this(mlt_idx, _seed(spark), k=3, min_tf=2, min_df=2,
                         max_df_pct=0.7, include_seed=True).collect()
    top = min(run, key=lambda r: r["rank"])
    assert top["doc_id"] == "https://a.example/seed"


def test_mlt_returns_k_rows_when_seed_in_topk(spark, idx):
    # with the seed scoring first, k neighbors must still come back
    pages = pages_df(spark, 300)
    seeds = pages.select(F.col("url").alias("doc_id"), "text").limit(1)
    run = more_like_this(idx, seeds, k=5, min_tf=1, min_df=1, max_df_pct=1.0)
    assert run.count() == 5


# ----------------------------------------------------------------- explain

def test_explain_weights_sum_to_score_and_match_engine(spark, idx):
    pages = pages_df(spark, 300)
    corpus = pages.select(F.col("url").alias("doc_id"), "text")
    qs = queries_df(spark, 4)
    ex = explain_adhoc(corpus, qs, k=3)
    bad = (
        ex.groupBy("query_id", "doc_id", "score")
        .agg(F.sum("weight").alias("s2"))
        .where(F.abs(F.col("score") - F.col("s2")) > 1e-9)
        .count()
    )
    assert bad == 0
    eng = search(idx, qs, k=3).withColumnRenamed("score", "escore")
    j = (
        ex.select("query_id", "doc_id", "score").distinct()
        .join(eng, ["query_id", "doc_id"])
    )
    assert j.count() == 12
    assert j.where(F.abs(F.col("score") - F.col("escore")) > 1e-9).count() == 0


def test_explain_per_term_factors(spark):
    # two docs, hand-checkable factors
    corpus = spark.createDataFrame(
        [("d1", "cat cat dog"), ("d2", "dog mouse")], "doc_id string, text string"
    )
    qs = spark.createDataFrame([("q1", "cat mouse")], QUERIES_SCHEMA)
    rows = {(r["doc_id"], r["term"]): r for r in explain_adhoc(corpus, qs, k=2).collect()}
    assert set(rows) == {("d1", "cat"), ("d2", "mouse")}
    r = rows[("d1", "cat")]
    assert r["tf"] == 2.0 and r["df"] == 1.0 and r["doclen"] == 3.0 and r["qtf"] == 1.0
    import math
    idf = math.log(1 + (2 - 1 + 0.5) / (1 + 0.5))
    assert abs(r["idf"] - idf) < 1e-12
