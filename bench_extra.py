#!/usr/bin/env python
"""Per-leg isolation bench (guide §1.4): times individual operators with
repeat runs and Spark-job counts so fixed per-call overhead (job rounds,
driver-side planning) is separable from kernel cost. Additive tooling —
bench.py remains the frozen driver-facing artifact; numbers from here are
cited in OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py <leg> [repeats]        # one leg, isolated
    python bench_extra.py all [repeats]          # every leg
Legs: entry:<name> (any __spark_entry__ queries() entry), fielded_build,
index_build, search_100q, phrase_50q, boolean_50q, span_near_50q.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _job_count(sc) -> int:
    # next job id == number of jobs submitted so far
    n = sc._jsc.sc().dagScheduler().nextJobId()
    return n if isinstance(n, int) else n.get()


def run_leg(spark, name: str, fn, repeats: int) -> dict:
    sc = spark.sparkContext
    walls, jobs = [], []
    for i in range(repeats):
        sc.setJobDescription(f"bench_extra:{name}:{i}")
        j0 = _job_count(sc)
        t0 = time.perf_counter()
        fn()
        walls.append(round(time.perf_counter() - t0, 3))
        jobs.append(_job_count(sc) - j0)
        sc.setJobDescription(None)
    return {"leg": name, "walls": walls, "min": min(walls), "jobs": jobs}


def main():
    leg = sys.argv[1] if len(sys.argv) > 1 else "all"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from openmatch_spark import get_spark
    from openmatch_spark.fixtures import documents_as_pages, pages_df, queries_df
    from openmatch_spark.index import build_index, load_index
    from openmatch_spark.query import search

    spark = get_spark("om-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py
    _warm = tempfile.mkdtemp(prefix="om_bx_warm_")
    build_index(spark, pages_df(spark, 500), _warm, num_shards=4)
    search(load_index(spark, _warm), queries_df(spark, 4), k=10).count()

    results = []

    def emit(r):
        results.append(r)
        print("LEG " + json.dumps(r), flush=True)

    import __spark_entry__ as em

    if leg.startswith("entry:"):
        name = leg.split(":", 1)[1]
        # first call builds the shared entry index outside the repeats
        em.queries()[name](spark, SF_DIR).count()
        emit(run_leg(spark, leg, lambda: em.queries()[name](spark, SF_DIR).count(), repeats))
    elif leg in ("fielded_build", "all"):
        def fielded_once():
            em._FIELDED_CACHE.pop(SF_DIR, None)
            em._entry_fielded(spark, SF_DIR)
        emit(run_leg(spark, "fielded_build", fielded_once, repeats))
    if leg in ("index_build", "all"):
        pages = documents_as_pages(spark, SF_DIR)
        pages.count()

        def build_once():
            d = tempfile.mkdtemp(prefix="om_bx_idx_")
            build_index(spark, pages, d, analyzer="dpr", num_shards=8,
                        num_term_buckets=16, block_size=128)
        emit(run_leg(spark, "index_build", build_once, repeats))
    if leg in ("search_100q", "phrase_50q", "boolean_50q", "span_near_50q",
               "all"):
        from openmatch_spark.index import build_positions
        from openmatch_spark.query import (
            search_boolean,
            search_phrase,
            search_span_near,
        )

        pages = documents_as_pages(spark, SF_DIR)
        idx_dir = tempfile.mkdtemp(prefix="om_bx_sidx_")
        build_index(spark, pages, idx_dir, analyzer="dpr", num_shards=8,
                    num_term_buckets=16, block_size=128)
        build_positions(spark, pages, idx_dir)
        idx = load_index(spark, idx_dir)
        vocab = [r["term"] for r in
                 idx.dictionary.orderBy(F.desc("df")).limit(500).collect()]
        import numpy as np

        rng = np.random.default_rng(7)
        qrows = [(f"q{i}", " ".join(rng.choice(vocab, size=rng.integers(1, 5))))
                 for i in range(100)]
        queries = spark.createDataFrame(qrows, "query_id string, text string")
        pq = spark.createDataFrame(
            [(f"p{i}", " ".join(rng.choice(vocab, size=2))) for i in range(50)],
            "query_id string, text string")
        bq = spark.createDataFrame(
            [(f"b{i}", str(rng.choice(vocab)),
              " ".join(rng.choice(vocab, size=2)), str(rng.choice(vocab)))
             for i in range(50)],
            "query_id string, must string, should string, must_not string")
        if leg in ("search_100q", "all"):
            emit(run_leg(spark, "search_100q",
                         lambda: search(idx, queries, k=100).count(), repeats))
        if leg in ("phrase_50q", "all"):
            emit(run_leg(spark, "phrase_50q",
                         lambda: search_phrase(idx, pq, k=100).count(), repeats))
        if leg in ("boolean_50q", "all"):
            emit(run_leg(spark, "boolean_50q",
                         lambda: search_boolean(idx, bq, k=100).count(), repeats))
        if leg in ("span_near_50q", "all"):
            emit(run_leg(spark, "span_near_50q",
                         lambda: search_span_near(idx, pq, within=8, k=100).count(),
                         repeats))
    if leg == "all":
        for name in ["query_string", "dsl_nested", "dsl_fielded",
                     "query_string_grouped", "dsl_constant_score",
                     "function_score", "intervals", "phrase_prefix",
                     "match_bool_prefix", "phrase_suggest",
                     "cross_fields_indexed", "bm25_topk", "mrr10",
                     "facet_adjacency", "hit_extended_stats",
                     "categorize_text"]:
            em.queries()[name](spark, SF_DIR).count()  # build caches once
            emit(run_leg(spark, f"entry:{name}",
                         lambda n=name: em.queries()[n](spark, SF_DIR).count(),
                         repeats))

    print("SUMMARY " + json.dumps(
        {r["leg"]: {"min": r["min"], "jobs": r["jobs"][-1]} for r in results}))
    spark.stop()


if __name__ == "__main__":
    main()
