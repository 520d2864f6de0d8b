#!/usr/bin/env python
"""Capture .explain('formatted') for the round-6-touched query surfaces.

Usage: python plans_r06_capture.py <repo_root> <out_dir> <suffix>
Runs against the given checkout (worktree for 'before', repo for 'after')
and writes <out_dir>/<query>_<suffix>.txt. Plans only — no timing.
"""

import os
import sys
import tempfile

ROOT = os.path.abspath(sys.argv[1])
OUT = os.path.abspath(sys.argv[2])
SUFFIX = sys.argv[3]
sys.path.insert(0, ROOT)
os.makedirs(OUT, exist_ok=True)

SF_DIR = "/root/testdata/sf0.1"

from pyspark.sql import functions as F  # noqa: E402

from openmatch_spark import get_spark  # noqa: E402
from openmatch_spark.fixtures import documents_as_pages  # noqa: E402
from openmatch_spark.index import build_index, build_positions, load_index  # noqa: E402
from openmatch_spark.plans.explain import capture_plan  # noqa: E402
from openmatch_spark.query import (  # noqa: E402
    search,
    search_boolean,
    search_phrase,
    search_span_near,
)

spark = get_spark("om-plans-r06", master="local[8]", shuffle_partitions=8,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

pages = documents_as_pages(spark, SF_DIR)
idx_dir = tempfile.mkdtemp(prefix="om_plans_idx_")
build_index(spark, pages, idx_dir, analyzer="dpr", num_shards=8,
            num_term_buckets=16, block_size=128)
build_positions(spark, pages, idx_dir)
idx = load_index(spark, idx_dir)
vocab = [r["term"] for r in
         idx.dictionary.orderBy(F.desc("df")).limit(500).collect()]
import numpy as np  # noqa: E402

rng = np.random.default_rng(7)
queries = spark.createDataFrame(
    [(f"q{i}", " ".join(rng.choice(vocab, size=rng.integers(1, 5))))
     for i in range(100)],
    "query_id string, text string")
pq = spark.createDataFrame(
    [(f"p{i}", " ".join(rng.choice(vocab, size=2))) for i in range(50)],
    "query_id string, text string")
bq = spark.createDataFrame(
    [(f"b{i}", str(rng.choice(vocab)), " ".join(rng.choice(vocab, size=2)),
      str(rng.choice(vocab))) for i in range(50)],
    "query_id string, must string, should string, must_not string")

import __spark_entry__ as em  # noqa: E402


def dump(name, df):
    with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
        f.write(capture_plan(df))
    print("captured", name)


dump("bm25_batch_100q", search(idx, queries, k=100))
dump("phrase_50q", search_phrase(idx, pq, k=100))
dump("boolean_50q", search_boolean(idx, bq, k=100))
dump("span_near_50q", search_span_near(idx, pq, within=8, k=100))
for entry in ["query_string", "dsl_nested", "dsl_fielded",
              "query_string_grouped", "dsl_constant_score",
              "cross_fields_indexed", "intervals", "phrase_prefix",
              "match_bool_prefix", "phrase_suggest", "bm25_topk_indexed"]:
    dump(entry, em.queries()[entry](spark, SF_DIR))

spark.stop()
