"""Doc-values attribute store (build_index store_attrs): attributes
persisted in the docmap at build time, frozen in stats like index_sort,
carried through incremental drains and compaction, and consumed by
search_filtered(where=) / BM25Index.stored_attributes with zero corpus
access at query time."""

import pytest

import pyspark.sql.functions as F

from openmatch_spark.fixtures import PAGES_SCHEMA, QUERIES_SCHEMA, gen_pages_rows
from openmatch_spark.index import build_index, compact_index, load_index
from openmatch_spark.query import search_filtered


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def pages_rows():
    return gen_pages_rows(300)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory, pages_rows):
    d = str(tmp_path_factory.mktemp("docvalues") / "idx")
    pages = spark.createDataFrame(pages_rows, PAGES_SCHEMA)
    build_index(
        spark, pages, d, analyzer="simple", num_shards=4,
        num_term_buckets=4, store_attrs=["lang"],
    )
    return load_index(spark, d)


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(
        [("q1", "term0001 term0003"), ("q2", "term0002 term0010 term0040")],
        QUERIES_SCHEMA,
    )


def test_stored_attributes_match_corpus(spark, idx, pages_rows):
    got = {
        r["doc_id"]: r["lang"] for r in idx.stored_attributes().collect()
    }
    want = {u: lang for (u, _ts, _h, _t, lang) in pages_rows}
    assert got == want
    assert idx.stored_attrs == ("lang",)


@pytest.mark.parametrize("route", ["keep", "drop", "cogroup"])
def test_where_filter_identical_to_allowed_docs(spark, idx, queries,
                                                pages_rows, route):
    allowed = spark.createDataFrame(
        [(u,) for (u, _ts, _h, _t, lang) in pages_rows if lang == "en"],
        "doc_id string",
    )
    via_ids = search_filtered(idx, queries, allowed, k=10, route=route)
    via_dv = search_filtered(idx, queries, where="lang = 'en'", k=10,
                             route=route)
    assert _rows(via_dv) == _rows(via_ids)
    assert _rows(via_dv)


def test_where_filter_column_predicate(spark, idx, queries, pages_rows):
    via_col = search_filtered(
        idx, queries, where=F.col("lang").isin("de", "fr"), k=10
    )
    allowed = spark.createDataFrame(
        [(u,) for (u, _ts, _h, _t, lang) in pages_rows if lang in ("de", "fr")],
        "doc_id string",
    )
    assert _rows(via_col) == _rows(search_filtered(idx, queries, allowed, k=10))


def test_facets_from_stored_attributes(spark, idx, queries, pages_rows):
    from openmatch_spark.operators.facets import facet_counts
    from openmatch_spark.query import search

    run = search(idx, queries, k=10).select("query_id", "doc_id")
    docs = spark.createDataFrame(
        [(u, lang) for (u, _ts, _h, _t, lang) in pages_rows],
        "doc_id string, lang string",
    )
    a = sorted(map(tuple, facet_counts(run, docs, ["lang"]).collect()))
    b = sorted(
        map(tuple, facet_counts(run, idx.stored_attributes(), ["lang"]).collect())
    )
    assert a == b and a


def test_drain_inherits_frozen_attrs_and_mismatch_refused(
    spark, tmp_path, pages_rows
):
    d = str(tmp_path / "inc")
    base = pages_rows[:150]
    extra = [
        (u + "?v=2", ts, h, t, lang)
        for (u, ts, h, t, lang) in pages_rows[150:200]
    ]
    build_index(
        spark, spark.createDataFrame(base, PAGES_SCHEMA), d,
        num_shards=2, num_term_buckets=4, store_attrs=["lang"],
    )
    # a drain naming a DIFFERENT attr set is refused
    with pytest.raises(ValueError, match="store_attrs"):
        build_index(
            spark, spark.createDataFrame(extra, PAGES_SCHEMA), d,
            num_shards=3, num_term_buckets=4, resume=True,
            extend_dictionary=True, shard_override=2,
            store_attrs=["warc_ts"],
        )
    # a drain naming nothing inherits the frozen columns
    build_index(
        spark, spark.createDataFrame(extra, PAGES_SCHEMA), d,
        num_shards=3, num_term_buckets=4, resume=True,
        extend_dictionary=True, shard_override=2,
    )
    idx = load_index(spark, d)
    got = {r["doc_id"]: r["lang"] for r in idx.stored_attributes().collect()}
    want = {u: lang for (u, _ts, _h, _t, lang) in base}
    want.update({u + "?v=2": lang for (u, _ts, _h, _t, lang) in pages_rows[150:200]})
    assert got == want


def test_compaction_preserves_stored_attrs(spark, tmp_path, pages_rows,
                                           queries):
    d = str(tmp_path / "cmp")
    pages = spark.createDataFrame(pages_rows[:200], PAGES_SCHEMA)
    build_index(
        spark, pages, d, num_shards=3, num_term_buckets=4,
        store_attrs=["lang"],
    )
    before = _rows(search_filtered(
        load_index(spark, d), queries, where="lang = 'en'", k=10
    ))
    compact_index(spark, d)
    idx = load_index(spark, d)
    assert idx.stored_attrs == ("lang",)
    got = {r["doc_id"]: r["lang"] for r in idx.stored_attributes().collect()}
    assert got == {u: lang for (u, _, _, _, lang) in pages_rows[:200]}
    assert _rows(search_filtered(idx, queries, where="lang = 'en'", k=10)) == before


def test_docvalues_validation(spark, idx, queries, tmp_path, pages_rows):
    with pytest.raises(ValueError, match="reserved"):
        build_index(
            spark, spark.createDataFrame(pages_rows[:5], PAGES_SCHEMA),
            str(tmp_path / "bad"), store_attrs=["doclen"],
        )
    with pytest.raises(ValueError, match="not stored"):
        idx.stored_attributes("warc_ts")
    with pytest.raises(ValueError, match="exactly one"):
        search_filtered(idx, queries, k=5)
    # where= on an index without stored attrs is refused
    d = str(tmp_path / "plain")
    build_index(
        spark, spark.createDataFrame(pages_rows[:30], PAGES_SCHEMA), d,
        num_shards=2, num_term_buckets=2,
    )
    with pytest.raises(ValueError, match="store_attrs"):
        search_filtered(load_index(spark, d), queries, where="lang = 'en'", k=5)
