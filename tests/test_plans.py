"""Physical-plan audits (SURVEY §4: verify Catalyst, don't rebuild it).

These lock in the scale-critical plan properties: term filters reach the
postings parquet scan (row-group pruning), the bucket predicate prunes
partition directories, the docmap join broadcasts the tiny hit set, and the
extraction path is Arrow-vectorized (no row-at-a-time Python).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from openmatch_spark.fixtures import pages_df, queries_df
from openmatch_spark.index import build_index, load_index
from openmatch_spark.plans.explain import capture_plan, plan_summary
from openmatch_spark.query import search


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("plan_idx"))
    build_index(spark, pages_df(spark, 300), d, num_shards=4, num_term_buckets=8)
    return load_index(spark, d)


def test_term_filter_pushed_to_postings_scan(idx):
    pruned = idx.postings.where(
        F.col("term_bucket").isin([0, 3]) & F.col("term").isin(["term0001", "term0002"])
    )
    plan = capture_plan(pruned)
    assert "PushedFilters:" in plan and "In(term, [term0001,term0002])" in plan


def test_bucket_partition_pruning(idx):
    pruned = idx.postings.where(F.col("term_bucket") == 3)
    plan = capture_plan(pruned)
    # partition filters appear separately from data filters for a
    # directory-partitioned column
    assert "PartitionFilters:" in plan
    assert any(
        frag in plan for frag in ["isnotnull(term_bucket", "(term_bucket#"]
    ), plan


def test_search_plan_shape(idx, spark):
    run = search(idx, queries_df(spark, 4), k=10, mode="batch")
    s = plan_summary(run)
    # hit set joins against docmap via broadcast — the docmap side must
    # never shuffle (it is corpus-sized)
    assert s["broadcasts"] >= 1
    # exactly the declared Python points: the batch scorer kernel
    assert s["python_evals"] >= 1
    assert s["pushed_filters"]


def test_extraction_is_arrow_vectorized(spark):
    from openmatch_spark.analysis import extract_corpus

    corpus = extract_corpus(pages_df(spark, 50), analyzer="dpr")
    plan = capture_plan(corpus)
    assert "ArrowEvalPython" in plan  # vectorized pandas UDF, not BatchEvalPython
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python anywhere


def test_winnow_simhash_plans_are_python_free(spark):
    """The r2 kernel rewrites must keep simhash/winnowing entirely JVM-side:
    no ArrowEvalPython / MapInPandas anywhere in either plan."""
    from openmatch_spark.operators.dedup import simhash_fingerprints
    from openmatch_spark.operators.textstats import winnow_fingerprints
    from openmatch_spark.plans.explain import plan_summary

    df = spark.createDataFrame(
        [(f"d{i}", "alpha beta gamma delta epsilon zeta eta theta") for i in range(20)],
        "doc_id string, text string",
    )
    for out in (winnow_fingerprints(df), simhash_fingerprints(df)):
        s = plan_summary(out)
        assert s["python_evals"] == 0, s
        assert s["wholestage"] >= 1, s


def test_compaction_reads_are_shard_pruned(idx, spark):
    """The merge's postings read must scan ONLY the merged shards'
    partition dirs (shard is a partition column; at scale the merge cost
    must be proportional to the merged segments, never the whole index)."""
    merge = [1, 2]
    pruned = idx.postings.where(F.col("shard").isin(merge))
    plan = capture_plan(pruned)
    assert "PartitionFilters:" in plan
    assert any(
        frag in plan for frag in ["shard#", "isnotnull(shard"]
    ), plan
    # the manifest gate composes: committed-shard In-filter is ALSO a
    # partition filter, not a post-scan filter
    gated = idx.postings
    gplan = capture_plan(gated)
    assert "PartitionFilters:" in gplan
