"""Deterministic retrieval fixtures (FIXTURES.md): pages / queries / qrels.

Seeded (42), pure (no wall-clock, no external data). pages follows the
BASELINE input_hint schema (url, warc_ts, html, text, lang) with Zipf-skewed
vocabulary so head-term skew paths are actually exercised at test scale
(FIXTURES.md: top term in >60% of docs).
"""

from __future__ import annotations

import datetime

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

QUERIES_SCHEMA = StructType(
    [StructField("query_id", StringType()), StructField("text", StringType())]
)

QRELS_SCHEMA = StructType(
    [
        StructField("query_id", StringType()),
        StructField("doc_id", StringType()),
        StructField("rel", IntegerType()),
    ]
)

_EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

_UNICODE_SNIPPETS = [
    "café résumé naïve",
    "42 alpha-7 beta_9",
    "中文 检索 引擎",
    "¡hola! ¿qué tal? — em—dash",
    "Größe STRASSE ÄÖÜ",
]


def gen_pages_rows(n_docs: int, vocab: int = 5000, seed: int = 42):
    rng = np.random.default_rng(seed)
    # Zipf s~1.1 over vocab; rejection-free: sample ranks via zipf then clip
    probs = 1.0 / np.arange(1, vocab + 1) ** 1.1
    probs /= probs.sum()
    rows = []
    for i in range(n_docs):
        length = int(rng.integers(20, 201))
        toks = rng.choice(vocab, size=length, p=probs)
        text = " ".join(f"term{t:04d}" for t in toks)
        if i % 50 == 7:  # ~2% unicode edge cases
            text = text + " " + _UNICODE_SNIPPETS[i % len(_UNICODE_SNIPPETS)]
        url = f"https://site{i % 97}.example/{i}"
        html = b"<html><body>" + text.encode("utf-8") + b"</body></html>"
        lang = ["en"] * 19 + ["de", "fr", "zh"]
        rows.append(
            (
                url,
                _EPOCH + datetime.timedelta(seconds=i),
                html,
                text,
                lang[int(rng.integers(0, 22)) % len(lang)],
            )
        )
    return rows


def gen_queries_rows(n_queries: int, vocab: int = 5000, seed: int = 43):
    rng = np.random.default_rng(seed)
    probs = 1.0 / np.arange(1, vocab + 1) ** 1.1
    probs /= probs.sum()
    rows = []
    for i in range(n_queries):
        nt = int(rng.integers(1, 7))
        toks = rng.choice(vocab, size=nt, p=probs)
        text = " ".join(f"term{t:04d}" for t in toks)
        rows.append((f"q{i}", text))
    if rows:
        # adversarial cases (FIXTURES.md §2)
        rows[0] = ("q0", "term0000 term0000 term0001")  # duplicate head term
        if len(rows) > 1:
            rows[1] = ("q1", "zzznotinvocab term0002")  # OOV term
        if len(rows) > 2:
            rows[2] = ("q2", "café 中文 term0003")  # unicode
    return rows


def gen_qrels_rows(pages_rows, queries_rows, seed: int = 44):
    """1-3 positives per query: docs containing the query's rarest term."""
    rng = np.random.default_rng(seed)
    rows = []
    for qid, qtext in queries_rows:
        qterms = [t for t in qtext.split() if t.startswith("term")]
        if not qterms:
            continue
        rare = max(qterms)  # higher term index == rarer under Zipf
        hits = [u for (u, _, _, text, _) in pages_rows if rare in text.split()]
        if not hits:
            continue
        n = min(len(hits), int(rng.integers(1, 4)))
        pick = rng.choice(len(hits), size=n, replace=False)
        for j in pick:
            rows.append((qid, hits[int(j)], int(rng.integers(1, 4))))
    return rows


def pages_df(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(gen_pages_rows(n_docs, seed=seed), PAGES_SCHEMA)


def queries_df(spark: SparkSession, n_queries: int, seed: int = 43) -> DataFrame:
    return spark.createDataFrame(gen_queries_rows(n_queries, seed=seed), QUERIES_SCHEMA)


def qrels_df(spark: SparkSession, pages_rows, queries_rows, seed: int = 44) -> DataFrame:
    return spark.createDataFrame(gen_qrels_rows(pages_rows, queries_rows, seed=seed), QRELS_SCHEMA)


def documents_as_pages(spark: SparkSession, sf_dir: str,
                       extra_cols: tuple = ()) -> DataFrame:
    """Adapt the driver's documents table to the pages contract
    (FIXTURES.md §1 alternate-corpus rule). extra_cols: further documents
    columns carried through verbatim — metadata for build_index
    store_attrs (the pages contract columns stay first and unchanged)."""
    import pyspark.sql.functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(_EPOCH).alias("warc_ts"),
        F.col("text").cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
        *[F.col(c) for c in extra_cols],
    )


def synth_pages_spark(spark: SparkSession, n_docs: int, vocab: int = 30000,
                      seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic Common-Crawl-style corpus, generated fully
    JVM-side (no driver loop, no Python UDF) — used for scale benchmarks.

    Zipf-ish skew via a log-uniform inverse CDF on a per-(doc,pos) hash:
    rank = floor(exp(u * ln(vocab))) spreads mass ~1/rank. Deterministic in
    (seed, doc_id, position) so any two runs (or cluster sizes) generate the
    identical corpus.
    """
    import pyspark.sql.functions as F

    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, 1, parts).withColumnRenamed("id", "i")
    doclen = (F.pmod(F.xxhash64(F.col("i"), F.lit(seed)), F.lit(181)) + 20).cast("int")
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.col("doclen") - 1),
            lambda pos: F.concat(
                F.lit("term"),
                F.lpad(
                    (
                        F.floor(
                            F.exp(
                                (F.pmod(F.xxhash64(F.col("i"), pos, F.lit(seed)), F.lit(1000000)) / 1000000.0)
                                * float(__import__("math").log(vocab))
                            )
                        )
                    ).cast("string"),
                    6,
                    "0",
                ),
            ),
        ),
    )
    return base.withColumn("doclen", doclen).select(
        F.concat(F.lit("https://site"), F.pmod(F.col("i"), F.lit(997)), F.lit(".example/"), F.col("i")).alias("url"),
        (F.lit(_EPOCH) + F.make_interval(secs=F.col("i").cast("double"))).alias("warc_ts"),
        F.encode(text, "utf-8").alias("html"),
        text.alias("text"),
        F.lit("en").alias("lang"),
    )
