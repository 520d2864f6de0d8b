"""Round-5: filter-context rules flow through the STREAMING percolation
path (streaming/serve.py serve_percolation) — the foreachBatch loop must
keep the doc frame's attribute columns so `filter` rules can gate on
them, and the stream's matches must equal the batch percolate() answer
over the same docs."""

import json
import tempfile

import pyspark.sql.functions as F

from openmatch_spark.query import percolate
from openmatch_spark.streaming import serve_percolation

DOCS = [
    ("d0", "spark engine builds plans", "en", 120),
    ("d1", "spark window aggregates", "de", 80),
    ("d2", "hash join beats sort", "en", 200),
    ("d3", "spark hash internals", "fr", 150),
]
DSCHEMA = "doc_id string, text string, lang string, n_chars int"

RULES = [
    ("r_en", "spark", None, None, json.dumps([{"term": {"lang": "en"}}])),
    ("r_big", None, "hash join", None,
     json.dumps([{"range": {"n_chars": {"gte": 100}}}])),
    ("r_any", "spark", None, None, None),
]
RSCHEMA = ("query_id string, must string, should string, must_not string,"
           " filter string")


def test_serve_percolation_filter_rules_stream_equals_batch(spark):
    docs = spark.createDataFrame(DOCS, DSCHEMA)
    stored = spark.createDataFrame(RULES, RSCHEMA)
    src = tempfile.mkdtemp(prefix="om_r5f_src_")
    out = tempfile.mkdtemp(prefix="om_r5f_out_")
    ckpt = tempfile.mkdtemp(prefix="om_r5f_ckpt_")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = serve_percolation(stream, stored, out, ckpt, analyzer="simple",
                          available_now=True)
    q.awaitTermination()
    got = sorted(
        (r["doc_id"], r["query_id"])
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r["doc_id"], r["query_id"])
        for r in percolate(docs, stored, analyzer="simple").collect()
    )
    assert got == want
    assert ("d0", "r_en") in got and ("d1", "r_en") not in got
    assert ("d2", "r_big") in got
    # exactly-once on replayed batch: restarting the finished stream
    # overwrites only its own partition (idempotent per-batch contract)
    q2 = serve_percolation(
        spark.readStream.schema(docs.schema).parquet(src), stored, out,
        ckpt, analyzer="simple", available_now=True,
    )
    q2.awaitTermination()
    again = sorted(
        (r["doc_id"], r["query_id"])
        for r in spark.read.parquet(out).collect()
    )
    assert again == got
