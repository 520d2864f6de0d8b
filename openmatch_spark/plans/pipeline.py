"""End-to-end composed pipelines (the reference's driver entry points as
single functions — SURVEY §3).

index_and_search mirrors driver/beir_eval_pipeline.py:19-133: corpus ->
index -> retrieve -> metrics, the reference's only self-contained
query->metric path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openmatch_spark.index import build_index, load_index
from openmatch_spark.operators.metrics import mrr_at_k, ndcg_at_k, recall_at_k
from openmatch_spark.query import search


def index_and_search(
    spark: SparkSession,
    pages: DataFrame,
    queries: DataFrame,
    index_dir: str,
    qrels: DataFrame | None = None,
    k: int = 100,
    analyzer: str = "dpr",
    num_shards: int = 8,
    **build_kw,
) -> dict:
    """Returns {'run': DataFrame, 'metrics': dict|None, 'stats': dict}."""
    stats = build_index(
        spark, pages, index_dir, analyzer=analyzer, num_shards=num_shards, **build_kw
    )
    run = search(load_index(spark, index_dir), queries, k=k)
    metrics = None
    if qrels is not None:
        run = run.cache()
        metrics = {
            "mrr@10": mrr_at_k(run, qrels, 10).collect()[0]["mrr"],
            "ndcg@10": ndcg_at_k(run, qrels, 10).collect()[0]["ndcg"],
            f"recall@{k}": recall_at_k(run, qrels, k).collect()[0]["recall"],
        }
    return {"run": run, "metrics": metrics, "stats": stats}
