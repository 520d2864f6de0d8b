"""Index sorting (build_index(index_sort=...)) + early-terminated sort."""

import tempfile

import pyspark.sql.functions as F
import pytest

from openmatch_spark.index import build_index, load_index
from openmatch_spark.query import search_sorted, search_sorted_indexed

DOCS = [
    # (doc_id, text, price) — prices chosen so the sort order differs
    # hard from the doc_id order, with one NULL and ties
    ("doc://00", "spark join table", 90.0),
    ("doc://01", "spark merge", 10.0),
    ("doc://02", "join value table", 50.0),
    ("doc://03", "spark join merge", None),
    ("doc://04", "table scan", 10.0),
    ("doc://05", "spark table", 70.0),
    ("doc://06", "merge value", 30.0),
    ("doc://07", "spark join value", 20.0),
    ("doc://08", "spark", 60.0),
    ("doc://09", "join merge", 40.0),
]


def _pages(spark, rows=DOCS):
    return spark.createDataFrame(
        [(u, None, None, t, "en", p) for u, t, p in rows],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, price double",
    )


def _build(spark, desc=False, block_size=2, shards=2):
    d = tempfile.mkdtemp(prefix="om_isort_")
    build_index(
        spark, _pages(spark), d, analyzer="simple", num_shards=shards,
        num_term_buckets=4, block_size=block_size,
        index_sort="price", index_sort_desc=desc,
    )
    return d


def test_docmap_ordinals_follow_sort_field(spark):
    d = _build(spark)
    idx = load_index(spark, d)
    assert idx.stats["index_sort"] == {"field": "price", "desc": False}
    for shard_rows in (
        [r for r in idx.docmap.collect() if r["shard"] == s] for s in (0, 1)
    ):
        shard_rows.sort(key=lambda r: r["doc_ord"])
        keys = [
            (r["sort_value"] is None, r["sort_value"], r["doc_id"])
            for r in shard_rows
        ]
        assert keys == sorted(keys)  # nulls last, then value, then doc_id


@pytest.mark.parametrize("desc", [False, True])
def test_sorted_indexed_matches_attribute_join(spark, desc):
    d = _build(spark, desc=desc)
    idx = load_index(spark, d)
    q = spark.createDataFrame(
        [("q0", "spark"), ("q1", "join merge"), ("q2", "nosuchterm")],
        "query_id string, text string",
    )
    attrs = spark.createDataFrame(
        [(u, p) for u, _, p in DOCS], "doc_id string, price double"
    )
    for k in (3, 5, 100):
        want = sorted(
            tuple(r) for r in search_sorted(
                idx, q, attrs, "price", ascending=not desc, k=k).collect()
        )
        got = sorted(
            tuple(r) for r in search_sorted_indexed(idx, q, k=k).collect()
        )
        assert got == want, f"k={k} desc={desc}"
    # opposite direction still answers (uncapped path)
    got_rev = sorted(
        tuple(r)
        for r in search_sorted_indexed(idx, q, k=4, ascending=desc).collect()
    )
    want_rev = sorted(
        tuple(r)
        for r in search_sorted(idx, q, attrs, "price",
                               ascending=desc, k=4).collect()
    )
    assert got_rev == want_rev


def test_block_cap_lands_on_the_scan(spark):
    """The early-termination predicate must reach the postings scan as a
    pushed filter, and the capped plan must read fewer blocks."""
    d = _build(spark, block_size=2)
    idx = load_index(spark, d)
    q = spark.createDataFrame([("q0", "spark join")],
                              "query_id string, text string")
    plan = search_sorted_indexed(idx, q, k=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "LessThan(block_id,1)" in plan  # ceil(2/2)=1, parquet-pushed
    # uncapped surface has no block_id predicate
    attrs = spark.createDataFrame(
        [(u, p) for u, _, p in DOCS], "doc_id string, price double"
    )
    plain = search_sorted(idx, q, attrs, "price", k=2)._jdf \
        .queryExecution().executedPlan().toString()
    assert "LessThan(block_id" not in plain


def test_deletes_disable_the_cap_and_stay_exact(spark):
    from openmatch_spark.index import delete_docs

    d = _build(spark, block_size=2)
    # tombstone the two best-priced spark docs: a capped read would now
    # surface too few candidates; the fallback must stay exact
    delete_docs(spark, d, ["doc://01", "doc://07"])
    idx = load_index(spark, d)
    q = spark.createDataFrame([("q0", "spark")],
                              "query_id string, text string")
    got = [(r["doc_id"], r["rank"]) for r in
           search_sorted_indexed(idx, q, k=3).orderBy("rank").collect()]
    assert got == [("doc://08", 1), ("doc://05", 2), ("doc://00", 3)]
    plan = search_sorted_indexed(idx, q, k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "LessThan(block_id" not in plan


def test_frozen_sort_survives_incremental_and_compaction(spark):
    from openmatch_spark.index import compact_index

    base, extra = DOCS[:6], DOCS[6:]
    d = tempfile.mkdtemp(prefix="om_isort_inc_")
    build_index(
        spark, _pages(spark, base), d, analyzer="simple", num_shards=2,
        num_term_buckets=4, block_size=2, index_sort="price",
    )
    # a drained batch inherits the frozen sort (resume path) ...
    build_index(
        spark, _pages(spark, extra), d, analyzer="simple", num_shards=3,
        num_term_buckets=4, block_size=2, resume=True,
        extend_dictionary=True, shard_override=2,
    )
    # ... and conflicting sort args are refused
    with pytest.raises(ValueError, match="frozen stats"):
        build_index(
            spark, _pages(spark, extra), d, analyzer="simple", num_shards=3,
            num_term_buckets=4, block_size=2, resume=True,
            extend_dictionary=True, shard_override=2,
            index_sort="price", index_sort_desc=True,
        )
    q = spark.createDataFrame([("q0", "spark"), ("q1", "value")],
                              "query_id string, text string")

    def rows(ix):
        return sorted(tuple(r) for r in
                      search_sorted_indexed(ix, q, k=5).collect())

    before = rows(load_index(spark, d))
    attrs = spark.createDataFrame(
        [(u, p) for u, _, p in DOCS], "doc_id string, price double"
    )
    want = sorted(tuple(r) for r in search_sorted(
        load_index(spark, d), q, attrs, "price", k=5).collect())
    assert before == want
    # compaction must preserve the sort order in the merged shard
    compact_index(spark, d)
    idx2 = load_index(spark, d)
    assert rows(idx2) == before
    dm = idx2.docmap.collect()
    for s in {r["shard"] for r in dm}:
        ordered = sorted((r for r in dm if r["shard"] == s),
                         key=lambda r: r["doc_ord"])
        keys = [(r["sort_value"] is None, r["sort_value"], r["doc_id"])
                for r in ordered]
        assert keys == sorted(keys)
