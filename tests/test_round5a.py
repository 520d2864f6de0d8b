"""Round-5 ADVICE fixes (ADVICE.md, r4 static pass):

* regexp class negation [^...] is supported (not silently inverted into
  the positive class), and a non-negation '^' is rejected loudly;
* filter-only / match_all DSL pages mask tombstones BEFORE the
  row_number <= k page cut — a deleted doc never consumes a slot;
* term atomicity validation recurses into dis_max (mirrors fielded);
* simple_query_string fuzzy edit budget clamps to Lucene's maxEdits=2;
* explain_dsl accepts the top-level match operator='and' shape that
  search_dsl accepts.
"""

import pytest

from openmatch_spark.fixtures import (
    PAGES_SCHEMA,
    QUERIES_SCHEMA,
    gen_pages_rows,
)
from openmatch_spark.index import build_index, load_index
from openmatch_spark.index.deletes import delete_docs
from openmatch_spark.query import search_dsl
from openmatch_spark.query.dsl import explain_dsl
from openmatch_spark.query.expand import search_regexp
from openmatch_spark.query.simpleqs import (
    parse_simple_query_string,
    search_simple_query_string,
)


@pytest.fixture(scope="module")
def pages_rows():
    return gen_pages_rows(200)


@pytest.fixture(scope="module")
def idx_dir(spark, tmp_path_factory, pages_rows):
    d = str(tmp_path_factory.mktemp("r5a") / "idx")
    pages = spark.createDataFrame(pages_rows, PAGES_SCHEMA)
    build_index(
        spark, pages, d, analyzer="simple", num_shards=4,
        num_term_buckets=4, store_attrs=["lang"],
    )
    return d


def _q(spark, *texts):
    return spark.createDataFrame(
        [(f"q{i}", t) for i, t in enumerate(texts)], QUERIES_SCHEMA
    )


# --- regexp class negation -------------------------------------------------


def test_regexp_class_negation_matches_complement(spark, idx_dir):
    idx = load_index(spark, idx_dir)
    pos = search_regexp(idx, _q(spark, "term000[13]"), k=50)
    neg = search_regexp(idx, _q(spark, "term000[^13]"), k=500,
                        max_expansions=500)
    pos_docs = {r["doc_id"] for r in pos.collect()}
    neg_terms = {
        t for r in neg.collect()
        for t in ("term0000", "term0001", "term0003")
    }
    assert neg_terms  # engine ran
    # the negated class must NOT behave like the positive class: a doc
    # matched by [^13] via e.g. term0000/term0002 is fine, but the
    # expansion set itself must exclude term0001/term0003. Verify via
    # disjoint single-term probes: [^0-9] style not supported, so probe
    # [^1] on a 1-char tail.
    only1 = search_regexp(idx, _q(spark, "term000[1]"), k=500,
                          max_expansions=500)
    non1 = search_regexp(idx, _q(spark, "term000[^1]"), k=500,
                         max_expansions=500)
    d1 = {r["doc_id"] for r in only1.collect()}
    dn = {r["doc_id"] for r in non1.collect()}
    assert d1 and dn
    # if negation were stripped, [^1] would equal [1]
    assert d1 != dn
    assert pos_docs  # sanity


def test_regexp_stray_caret_rejected(spark, idx_dir):
    idx = load_index(spark, idx_dir)
    with pytest.raises(ValueError, match="class negation"):
        search_regexp(idx, _q(spark, "^term0001"), k=10).collect()
    with pytest.raises(ValueError, match="class negation"):
        search_regexp(idx, _q(spark, "term00(^01)"), k=10).collect()


# --- filter-only DSL page masks tombstones before the cut ------------------


def test_filter_only_page_skips_deleted(spark, idx_dir):
    idx = load_index(spark, idx_dir)
    dsl = {"p0": {"bool": {"filter": [{"term": {"lang": "en"}}]}}}
    before = search_dsl(idx, dsl, k=5)
    first = [r["doc_id"] for r in
             sorted(before.collect(), key=lambda r: r["rank"])]
    assert len(first) == 5 and all(r["score"] == 0.0
                                   for r in before.collect())
    # tombstone the first two page slots — live docs must refill to k
    delete_docs(spark, idx_dir, first[:2])
    idx2 = load_index(spark, idx_dir)
    after = search_dsl(idx2, dsl, k=5)
    got = [r["doc_id"] for r in
           sorted(after.collect(), key=lambda r: r["rank"])]
    assert len(got) == 5
    assert not set(got) & set(first[:2])
    # page semantics: first k passing docs by doc_id, skipping tombstones
    assert got[:3] == first[2:5]


# --- dis_max term atomicity ------------------------------------------------


def test_dismax_term_atomicity_enforced(spark, idx_dir):
    idx = load_index(spark, idx_dir)
    bad = {"q": {"dis_max": {"queries": [
        {"term": {"text": "term0001 term0002"}},
    ]}}}
    with pytest.raises(ValueError, match="analyzes to 2 tokens"):
        search_dsl(idx, bad, k=10)
    # nested inside bool->dis_max as well
    bad2 = {"q": {"bool": {"should": [
        {"dis_max": {"queries": [{"term": {"text": "a b"}}]}},
    ]}}}
    with pytest.raises(ValueError, match="tokens"):
        search_dsl(idx, bad2, k=10)


# --- simple_query_string fuzzy clamp ---------------------------------------


def test_sqs_fuzzy_budget_clamped_to_two(spark, idx_dir):
    branches, _ = parse_simple_query_string("term0001~9", flags="ALL")
    segs = [s for run in branches for s in run]
    assert segs and all(s.edits == 2 for s in segs if s.kind == "fuzzy")
    idx = load_index(spark, idx_dir)
    a = search_simple_query_string(idx, _q(spark, "term0001~9"), k=20)
    b = search_simple_query_string(idx, _q(spark, "term0001~2"), k=20)
    rows = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.collect()
    )
    assert rows(a) == rows(b)


# --- explain_dsl accepts top-level match operator='and' --------------------


def test_explain_accepts_top_level_and_operator(spark, idx_dir):
    idx = load_index(spark, idx_dir)
    q = {"qa": {"match": {"text": {"query": "term0001 term0003",
                                   "operator": "and"}}}}
    run = search_dsl(idx, q, k=5)
    docs = [r["doc_id"] for r in run.collect()]
    assert docs  # the query itself is valid on the search path
    exp = explain_dsl(idx, q, doc_ids=docs[:2])
    rows = exp.collect()
    assert rows
    # operator='and' maps tokens to must in the explain tree too
    assert {r["role"] for r in rows} == {"must"}
