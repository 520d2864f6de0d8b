#!/usr/bin/env python
"""Benchmark harness. Default mode: per-round suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON
line {"metric", "value", "unit": "sec", "queries": {...}, "sf", ...}.

--scaling: north-rule evidence — run the identical index-build + query job on
the identical synthetic corpus at local[8] and local[32], report docs/sec at
both and efficiency = thru(32) / (4 * thru(8)); appends results to
BENCH/BASELINE.md.
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


def _sf_of(path: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def _timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def _gen_queries(n=100, vocab=30000, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    qs = []
    for i in range(n):
        nt = int(rng.integers(1, 6))
        ranks = np.floor(np.exp(rng.random(nt) * np.log(vocab))).astype(int)
        qs.append((f"q{i}", " ".join(f"term{r:06d}" for r in ranks)))
    return qs


def suite() -> dict:
    from pyspark.sql import functions as F

    from openmatch_spark import get_spark
    from openmatch_spark.fixtures import documents_as_pages
    from openmatch_spark.index import build_index, load_index
    from openmatch_spark.query import search

    spark = get_spark("om-bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    pages = documents_as_pages(spark, SF_DIR)
    n_docs = pages.count()
    idx_dir = tempfile.mkdtemp(prefix="om_bench_idx_")

    timings["index_build"], stats = _timed(
        lambda: build_index(
            spark, pages, idx_dir, analyzer="dpr",
            num_shards=8, num_term_buckets=16, block_size=128,
        )
    )
    idx = load_index(spark, idx_dir)

    # query throughput: 100-query batch, k=100, block-max MaxScore
    vocab_terms = [r["term"] for r in idx.dictionary.orderBy(F.desc("df")).limit(500).collect()]
    import numpy as np

    rng = np.random.default_rng(7)
    qrows = [
        (f"q{i}", " ".join(rng.choice(vocab_terms, size=rng.integers(1, 5))))
        for i in range(100)
    ]
    queries = spark.createDataFrame(qrows, "query_id string, text string")
    timings["bm25_100q_batch"], _ = _timed(lambda: search(idx, queries, k=100).count())

    # per-query latency sample (20 single-query jobs)
    lat = []
    for qid, qtext in qrows[:20]:
        one = spark.createDataFrame([(qid, qtext)], "query_id string, text string")
        t, _ = _timed(lambda: search(idx, one, k=100).count())
        lat.append(t)
    lat.sort()
    timings["query_p50"] = lat[len(lat) // 2]
    timings["query_p99"] = lat[min(len(lat) - 1, int(len(lat) * 0.99))]

    # entry-contract headliners at the bench scale
    import __spark_entry__ as em

    for name in ["bm25_topk", "minhash_pairs", "dedup_exact", "knn_cosine", "mrr10", "lang_id"]:
        timings[name], _ = _timed(lambda n=name: em.queries()[n](spark, SF_DIR).count())

    total = sum(v for v in timings.values())
    out = {
        "metric": "e2e_suite_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": _sf_of(SF_DIR),
        "n_docs": n_docs,
        "index_docs_per_sec": round(n_docs / timings["index_build"], 1),
        "cpus": CPUS,
    }
    spark.stop()
    return out


def _scaling_job(cores: int, n_docs: int) -> dict:
    """One full build+query run at a given parallelism; returns throughputs."""
    from openmatch_spark import get_spark
    from openmatch_spark.fixtures import synth_pages_spark
    from openmatch_spark.index import build_index, load_index
    from openmatch_spark.query import search

    spark = get_spark(
        f"om-scale-{cores}", master=f"local[{cores}]", shuffle_partitions=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # IDENTICAL job at both parallelism levels: same shard/bucket/block
    # layout, same input partition count — only cores/shuffle width differ.
    pages = synth_pages_spark(spark, n_docs, partitions=64)
    idx_dir = tempfile.mkdtemp(prefix=f"om_scale_{cores}_")
    phase: dict[str, float] = {}
    t_build, _ = _timed(
        lambda: build_index(
            spark, pages, idx_dir, analyzer="dpr",
            num_shards=32, num_term_buckets=16, block_size=128, timings=phase,
        )
    )
    qrows = _gen_queries(256)
    queries = spark.createDataFrame(qrows, "query_id string, text string")
    idx = load_index(spark, idx_dir)
    t_query, n_hits = _timed(lambda: search(idx, queries, k=100, mode="batch").count())
    spark.stop()
    return {
        "cores": cores,
        "n_docs": n_docs,
        "build_sec": round(t_build, 2),
        "docs_per_sec": round(n_docs / t_build, 1),
        "query_batch_sec": round(t_query, 2),
        "queries_per_sec": round(len(qrows) / t_query, 2),
        "n_hits": n_hits,
        "phases": {k: round(v, 2) for k, v in phase.items()},
    }


def scaling(n_docs: int = 150_000) -> dict:
    r8 = _scaling_job(8, n_docs)
    r32 = _scaling_job(32, n_docs)
    eff_build = r32["docs_per_sec"] / (4 * r8["docs_per_sec"])
    eff_query = r32["queries_per_sec"] / (4 * r8["queries_per_sec"])
    out = {
        "metric": "scaling_efficiency_build",
        "value": round(eff_build, 3),
        "unit": "ratio",
        "queries": {
            "build_docs_per_sec_8": r8["docs_per_sec"],
            "build_docs_per_sec_32": r32["docs_per_sec"],
            "query_qps_8": r8["queries_per_sec"],
            "query_qps_32": r32["queries_per_sec"],
            "efficiency_query": round(eff_query, 3),
        },
        "phases_8": r8["phases"],
        "phases_32": r32["phases"],
        "sf": -1.0,
        "n_docs": n_docs,
    }
    md = f"""
## Measured scaling (sandbox proxy for N -> 4N executors)

Same deterministic synthetic corpus ({n_docs:,} docs, Zipf vocab 30k,
`synth_pages_spark`), IDENTICAL job (`build_index` analyzer=dpr, 32 shards,
16 buckets, block 128 + 256-query batch search k=100), two parallelism
levels. Phase split 8c: {r8['phases']} / 32c: {r32['phases']}.

| cores | build sec | docs/sec | 256q batch sec | q/s |
|---|---|---|---|---|
| local[8] | {r8['build_sec']} | {r8['docs_per_sec']} | {r8['query_batch_sec']} | {r8['queries_per_sec']} |
| local[32] | {r32['build_sec']} | {r32['docs_per_sec']} | {r32['query_batch_sec']} | {r32['queries_per_sec']} |

**Scaling efficiency (build)** = {r32['docs_per_sec']} / (4 x {r8['docs_per_sec']}) = **{eff_build:.3f}**
**Scaling efficiency (query)** = {r32['queries_per_sec']} / (4 x {r8['queries_per_sec']}) = **{eff_query:.3f}**
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        n = int(sys.argv[sys.argv.index("--scaling") + 1]) if len(sys.argv) > sys.argv.index("--scaling") + 1 and sys.argv[sys.argv.index("--scaling") + 1].isdigit() else 150_000
        print(json.dumps(scaling(n)))
    else:
        print(json.dumps(suite()))
