"""Streaming query serving (streaming/serve.py): stream-vs-batch identity
and exactly-once across restarts."""

import os

import pytest

from openmatch_spark.fixtures import PAGES_SCHEMA, QUERIES_SCHEMA, gen_pages_rows
from openmatch_spark.index import build_index, load_index
from openmatch_spark.query import search
from openmatch_spark.streaming import serve_queries


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("serve") / "idx")
    pages = spark.createDataFrame(gen_pages_rows(150), PAGES_SCHEMA)
    build_index(spark, pages, d, analyzer="simple", num_shards=2, num_term_buckets=4)
    return load_index(spark, d)


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.collect()
    )


def test_served_stream_equals_batch_search(spark, idx, tmp_path):
    src = str(tmp_path / "qsrc")
    out = str(tmp_path / "runs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    q1 = [("q1", "term0001 term0002"), ("q2", "term0005")]
    q2 = [("q3", "term0003"), ("q4", "nosuchterm")]
    spark.createDataFrame(q1, QUERIES_SCHEMA).write.parquet(src + "/b1")
    spark.createDataFrame(q2, QUERIES_SCHEMA).write.parquet(src + "/b2")

    stream = spark.readStream.schema("query_id string, text string").parquet(src + "/*")
    serve_queries(idx, stream, out, ckpt, k=5).awaitTermination()

    served = spark.read.parquet(out)
    assert "batch_id" in served.columns
    batch = search(idx, spark.createDataFrame(q1 + q2, QUERIES_SCHEMA), k=5)
    assert _rows(served.drop("batch_id")) == _rows(batch)


def test_served_restart_processes_only_new_queries(spark, idx, tmp_path):
    src = str(tmp_path / "qsrc")
    out = str(tmp_path / "runs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    spark.createDataFrame(
        [("q1", "term0001")], QUERIES_SCHEMA
    ).write.parquet(src + "/b1")
    stream = spark.readStream.schema("query_id string, text string").parquet(src + "/*")
    serve_queries(idx, stream, out, ckpt, k=3).awaitTermination()
    first = _rows(spark.read.parquet(out).drop("batch_id"))
    assert first and all(q == "q1" for q, *_ in first)

    # second drain with the SAME checkpoint: only the new file is read,
    # prior results are untouched (no duplication, no reprocessing)
    spark.createDataFrame(
        [("q9", "term0002")], QUERIES_SCHEMA
    ).write.parquet(src + "/b2")
    stream = spark.readStream.schema("query_id string, text string").parquet(src + "/*")
    serve_queries(idx, stream, out, ckpt, k=3).awaitTermination()
    both = _rows(spark.read.parquet(out).drop("batch_id"))
    assert [r for r in both if r[0] == "q1"] == first
    assert any(q == "q9" for q, *_ in both)
    expected = search(
        idx, spark.createDataFrame([("q1", "term0001"), ("q9", "term0002")],
                                   QUERIES_SCHEMA), k=3
    )
    assert both == _rows(expected)


# ---------------------------------------------------------- percolation loop

def test_served_percolation_equals_batch(spark, tmp_path):
    from openmatch_spark.query import percolate
    from openmatch_spark.streaming import serve_percolation

    src = str(tmp_path / "dsrc")
    out = str(tmp_path / "matches")
    ckpt = str(tmp_path / "pckpt")
    os.makedirs(src)
    stored = spark.createDataFrame(
        [("r1", "alpha beta", None, None), ("r2", None, "gamma delta", "zeta")],
        "query_id string, must string, should string, must_not string",
    )
    b1 = [("d1", "alpha beta gamma"), ("d2", "gamma zeta")]
    b2 = [("d3", "delta"), ("d4", "alpha")]
    schema = "doc_id string, text string"
    spark.createDataFrame(b1, schema).write.parquet(src + "/b1")
    spark.createDataFrame(b2, schema).write.parquet(src + "/b2")

    stream = spark.readStream.schema(schema).parquet(src + "/*")
    serve_percolation(stream, stored, out, ckpt).awaitTermination()

    served = spark.read.parquet(out)
    assert "batch_id" in served.columns
    want = percolate(
        spark.createDataFrame(b1 + b2, schema), stored
    )
    got_rows = sorted(
        (r["doc_id"], r["query_id"]) for r in served.collect()
    )
    want_rows = sorted((r["doc_id"], r["query_id"]) for r in want.collect())
    assert got_rows == want_rows
    # the must_not doc (d2 contains zeta) and the unmatched doc are absent
    assert ("d2", "r2") not in got_rows


def test_percolate_phrase_rules(spark):
    """Phrase percolation (must_phrase / not_phrase): adjacency decided
    against the doc's own token positions; expectations from a plain
    Python replica."""
    import re

    from openmatch_spark.query import percolate

    docs = spark.createDataFrame([
        ("d0", "breaking news spark releases new engine"),
        ("d1", "news breaking spark engine"),
        ("d2", "quarterly report breaking news again"),
        ("d3", "nothing relevant here"),
        ("d4", "spark breaking news engine update"),
        ("d5", "breaking breaking news news"),
    ], "doc_id string, text string")
    stored = spark.createDataFrame([
        ("r0", None, None, None, "breaking news", None),   # phrase-only
        ("r1", "spark", None, None, "breaking news", None),
        ("r2", None, "engine update", None, None, "breaking news"),
        ("r3", "report", None, None, None, None),          # no phrase cols
    ], "query_id string, must string, should string, must_not string,"
       " must_phrase string, not_phrase string")
    got = sorted(
        (r["doc_id"], r["query_id"]) for r in percolate(docs, stored).collect()
    )

    def toks(t):
        return re.findall(r"[a-z0-9]+", t.lower())

    def has_phrase(ts, ph):
        p = toks(ph)
        return any(ts[i:i + len(p)] == p for i in range(len(ts)))

    exp = []
    for r in docs.collect():
        d, ts = r["doc_id"], toks(r["text"])
        s = set(ts)
        if has_phrase(ts, "breaking news"):
            exp.append((d, "r0"))
            if "spark" in s:
                exp.append((d, "r1"))
        if (s & {"engine", "update"}) and not has_phrase(ts, "breaking news"):
            exp.append((d, "r2"))
        if "report" in s:
            exp.append((d, "r3"))
    assert got == sorted(exp) and got


def test_percolate_phrase_scattered_terms_do_not_match(spark):
    """Terms present but never adjacent: must_phrase refuses, not_phrase
    does NOT exclude."""
    from openmatch_spark.query import percolate

    docs = spark.createDataFrame(
        [("d0", "news of the breaking storm")],
        "doc_id string, text string",
    )
    stored = spark.createDataFrame([
        ("rm", None, None, None, "breaking news", None),
        ("rn", "storm", None, None, None, "breaking news"),
    ], "query_id string, must string, should string, must_not string,"
       " must_phrase string, not_phrase string")
    got = sorted(
        (r["doc_id"], r["query_id"]) for r in percolate(docs, stored).collect()
    )
    assert got == [("d0", "rn")]
