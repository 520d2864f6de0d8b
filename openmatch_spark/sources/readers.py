"""File-format sources matching the reference's loaders (SURVEY §2.1).

All schemas are declared (StructType), never sniffed — the reference infers
schema from the first row (inference_dataset.py:255-256); we pin it instead.

- corpus TSV `id\ttitle\ttext` with user-supplied column names
  (inference_dataset.py:271-283; docs/dr-msmarco-passage.md:107)
- corpus/queries JSONL (inference_dataset.py:250-257)
- queries TSV `id\ttext` (utils.py:47-54)
- qrels 4-col TSV with rel threshold (utils.py:56-67, :182-193)
- BEIR qrels: headered `query-id\tcorpus-id\tscore` (utils.py:196-209,
  dataset/beir_dataset.py:13-25)
TREC runs live in operators/runio.py (S8/S11).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

ID_CANDIDATES = ["_id", "id", "text_id", "sample_id"]  # inference_dataset.py:17-28


def read_corpus_tsv(
    spark: SparkSession,
    path: str,
    column_names: list[str] | None = None,
) -> DataFrame:
    """TSV corpus with declared columns (default id,title,text)."""
    cols = column_names or ["id", "title", "text"]
    schema = StructType([StructField(c, StringType()) for c in cols])
    return spark.read.option("sep", "\t").schema(schema).csv(path)


def normalize_id(df: DataFrame, out: str = "doc_id") -> DataFrame:
    """First-present of _id/id/text_id/sample_id, stringified (P2)."""
    present = [c for c in ID_CANDIDATES if c in df.columns]
    if not present:
        raise ValueError(f"no id column among {ID_CANDIDATES} in {df.columns}")
    keep = [c for c in df.columns if c not in present]
    return df.select(
        F.coalesce(*[F.col(c).cast("string") for c in present]).alias(out), *keep
    )


def read_corpus_jsonl(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """JSONL corpus; schema supplied or defaulted to (_id, title, text)."""
    schema = schema or StructType(
        [
            StructField("_id", StringType()),
            StructField("id", StringType()),
            StructField("title", StringType()),
            StructField("text", StringType()),
        ]
    )
    return normalize_id(spark.read.schema(schema).json(path))


def read_queries_tsv(spark: SparkSession, path: str) -> DataFrame:
    schema = StructType(
        [StructField("query_id", StringType()), StructField("text", StringType())]
    )
    return spark.read.option("sep", "\t").schema(schema).csv(path)


def read_qrels_tsv(spark: SparkSession, path: str, rel_threshold: int = 1) -> DataFrame:
    """4-col `topicid _ docid rel`, keep rel >= threshold (utils.py:182-193)."""
    schema = "query_id string, _it string, doc_id string, rel int"
    df = spark.read.option("sep", "\t").schema(schema).csv(path)
    return df.where(F.col("rel") >= rel_threshold).select("query_id", "doc_id", "rel")


def read_beir_qrels(spark: SparkSession, path: str, rel_threshold: int = 1) -> DataFrame:
    """Headered `query-id corpus-id score` TSV (utils.py:196-209)."""
    df = (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .schema("`query-id` string, `corpus-id` string, score int")
        .csv(path)
    )
    return (
        df.select(
            F.col("query-id").alias("query_id"),
            F.col("corpus-id").alias("doc_id"),
            F.col("score").alias("rel"),
        )
        .where(F.col("rel") >= rel_threshold)
    )


def load_beir_dataset(
    spark: SparkSession,
    data_dir: str,
    splits: tuple[str, ...] = ("train", "dev", "test"),
) -> dict:
    """BEIR directory loader (dataset/beir_dataset.py:28-84): one unit of
    corpus.jsonl + queries.jsonl + qrels/<split>.tsv.

    Returns {"corpus": df(doc_id, title, text),
             "queries": {split: df(query_id, text)},
             "qrels": {split: df(query_id, doc_id, rel)}};
    splits without a qrels file are absent (reference sets them to None).
    Queries are filtered to qids present in the split's qrels via a
    broadcast semi join (the reference's filter_fn x["_id"] in qids,
    beir_dataset.py:79 — set-membership becomes a join at scale).
    """
    import os

    corpus = read_corpus_jsonl(spark, os.path.join(data_dir, "corpus.jsonl"))
    all_queries = normalize_id(
        spark.read.schema(
            StructType([StructField("_id", StringType()), StructField("text", StringType())])
        ).json(os.path.join(data_dir, "queries.jsonl")),
        out="query_id",
    )
    queries: dict[str, DataFrame] = {}
    qrels: dict[str, DataFrame] = {}
    for split in splits:
        p = os.path.join(data_dir, "qrels", f"{split}.tsv")
        if not os.path.exists(p):
            continue
        q = read_beir_qrels(spark, p)
        qrels[split] = q
        queries[split] = all_queries.join(
            F.broadcast(q.select("query_id").distinct()), "query_id", "left_semi"
        )
    return {"corpus": corpus, "queries": queries, "qrels": qrels}
