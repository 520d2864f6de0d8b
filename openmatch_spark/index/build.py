"""Distributed inverted-index build (SURVEY §2.4 A10, north_rule).

Dataflow (one declarative plan per phase; Catalyst owns the physical plan):

  pages ──extract/tokenize (Arrow UDF)──► corpus(doc_id, terms, doclen)
        ├─ phase STATS (checkpointed): N, avgdl, dictionary(term, df, cf, idf)
        └─ phase POSTINGS (per shard batch, resumable):
             docmap:   shard-local dense doc_ord by doc_id sort
             explode ──groupBy(shard,term,doc)──► tf
                     ──join docmap + dictionary──► weight (float64, index-time BM25)
                     ──groupBy(shard,term,block)──► sorted block arrays
                     ──Arrow encode──► delta+varbyte docs, f64 scores, max_score
             write postings/docmap (dynamic partition overwrite by shard)
             append manifest row per shard   (write-then-manifest ⇒ idempotent resume)

Skew strategy (Zipf head terms like "the" appear in ~every doc):
  * the tf groupBy keys on (shard, term, doc_id) — doc_id spreads hot terms
    across all partitions; partial aggregation combines map-side.
  * block packing keys on (shard, term, block_id) where
    block_id = doc_ord // block_size — a head term's posting list is split
    into bounded groups of <= block_size rows, so no reducer ever receives
    an unbounded collect_list. This replaces hand-salting with a
    deterministic, globally-consistent split (block ids don't depend on the
    physical partitioning, so the index is identical under any parallelism).
  * doc-sharding bounds every per-(shard,term) list by docs-per-shard,
    which is what makes query-side groups bounded too.

At 10^12 docs: num_shards sized so a shard is ~100-250M docs, block_size 128,
postings partitioned by (shard, term_bucket) — an Iceberg-style layout where
query-time bucket pruning keeps scans to the terms actually queried.

Reference parity notes: the reference's index build is embarrassingly-parallel
encode + spill (dense_retriever.py:67-129) with rank-sliced sharding
(inference_dataset.py:216-235); Spark partitioning replaces the manual
sharding, shuffle replaces the barrier, and the manifest replaces the
`evaluated_steps` bookkeeping idea (driver/async_eval_dr.py:136-186).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from openmatch_spark.analysis import extract_corpus
from openmatch_spark.functions.bm25 import B, K1
from openmatch_spark.functions.codec import encode_postings
from openmatch_spark.index.layout import MANIFEST_SCHEMA, IndexPaths
from openmatch_spark.stats import global_stats, term_stats

# coarse ord-range per packing group: bounds any single reducer's list to
# <= 2^20 postings (16 MiB of (ord, weight)) regardless of term skew
_COARSE_RANGE = 1 << 20

_BLOCK_STRUCT = StructType(
    [
        StructField("first_ord", LongType()),
        StructField("last_ord", LongType()),
        StructField("n", IntegerType()),
        StructField("max_score", DoubleType()),
        StructField("docs", BinaryType()),
        StructField("scores", BinaryType()),
    ]
)


@pandas_udf(_BLOCK_STRUCT)
def _encode_block_udf(ords_s: pd.Series, weights_s: pd.Series) -> pd.DataFrame:
    """Encode one posting block: parallel (ords, weights) arrays -> payloads.

    Takes two primitive-array columns (Arrow hands them over as numpy
    arrays) instead of an array<struct> — struct rows materialize as Python
    dicts and were the dominant index-build cost at profile time.
    """
    first, last, n, mx, docs, scores = [], [], [], [], [], []
    for o, w in zip(ords_s, weights_s):
        ords = np.asarray(o, dtype=np.int64)
        wts = np.asarray(w, dtype=np.float64)
        first.append(int(ords[0]))
        last.append(int(ords[-1]))
        n.append(len(ords))
        mx.append(float(wts.max()))
        docs.append(encode_postings(ords))
        scores.append(wts.tobytes())
    return pd.DataFrame(
        {"first_ord": first, "last_ord": last, "n": n, "max_score": mx,
         "docs": docs, "scores": scores}
    )


def shard_col(doc_id_col, num_shards: int):
    """Deterministic doc shard: pmod(xxhash64(doc_id), S). Not part of the
    DuckDB-checked surface, so Spark's internal hash is fine here."""
    return F.pmod(F.xxhash64(doc_id_col), F.lit(num_shards)).cast("int")


def term_bucket_col(term_col, num_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(num_buckets)).cast("int")


def build_docmap(corpus_sharded: DataFrame) -> DataFrame:
    """(shard, doc_ord, doc_id, doclen): dense per-shard ordinal by doc_id sort.

    Sorting by doc_id makes ordinals (and hence posting payloads) a pure
    function of corpus content — identical index bytes under any parallelism
    (property-tested). row_number is a shard-local sort: one task per shard,
    parallel across shards.
    """
    w = Window.partitionBy("shard").orderBy("doc_id")
    return corpus_sharded.select(
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("doc_ord"),
        "doc_id",
        F.col("doclen").cast("long").alias("doclen"),
    )


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    analyzer: str = "dpr",
    num_shards: int = 8,
    num_term_buckets: int = 16,
    block_size: int = 128,
    k1: float = K1,
    b: float = B,
    shard_batch_size: int | None = None,
    resume: bool = False,
    fail_after_batches: int | None = None,
    timings: dict | None = None,
) -> dict:
    """Build (or resume) the BM25 index at index_dir. Returns stats dict.

    resume=True skips the STATS phase if stats.json exists (stats must be
    frozen across resumes or weights would drift) and skips shards already in
    the manifest. fail_after_batches is a test hook for kill/resume tests.
    """
    paths = IndexPaths(index_dir)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    t = timings if timings is not None else {}

    def _mark(name, t0):
        t[name] = t.get(name, 0.0) + (time.time() - t0)

    corpus = extract_corpus(pages, analyzer=analyzer).withColumn(
        "shard", shard_col(F.col("doc_id"), num_shards)
    )
    corpus.persist()

    # ---- phase STATS (atomic via stats.json tmp+rename) -------------------
    if resume and paths.has_stats():
        stats = paths.read_stats()
        dictionary = spark.read.parquet(paths.dictionary)
    else:
        t0 = time.time()
        g = global_stats(corpus)
        dictionary = term_stats(corpus).select(
            "term",
            "df",
            "cf",
            # Lucene idf, float64 (functions/bm25.py); computed JVM-side.
            F.log(F.lit(1.0) + (F.lit(float(g["n_docs"])) - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias("idf"),
            term_bucket_col(F.col("term"), num_term_buckets).alias("term_bucket"),
        )
        dictionary.write.mode("overwrite").parquet(paths.dictionary)
        dictionary = spark.read.parquet(paths.dictionary)
        stats = dict(
            g,
            analyzer=analyzer,
            num_shards=num_shards,
            num_term_buckets=num_term_buckets,
            block_size=block_size,
            k1=k1,
            b=b,
        )
        paths.write_stats(stats)
        _mark("stats_phase", t0)

    avgdl = float(stats["avgdl"]) if stats["avgdl"] else 1.0

    # ---- phase POSTINGS (per shard batch, manifest-resumable) -------------
    done: set[int] = set()
    if resume:
        try:
            done = {r["shard"] for r in spark.read.parquet(paths.manifest).select("shard").distinct().collect()}
        except Exception:
            done = set()
    todo = [s for s in range(num_shards) if s not in done]
    batch = shard_batch_size or len(todo) or 1
    batches = [todo[i : i + batch] for i in range(0, len(todo), batch)]

    for bi, shards in enumerate(batches):
        if fail_after_batches is not None and bi >= fail_after_batches:
            corpus.unpersist()
            raise RuntimeError(f"injected failure before batch {bi} (test hook)")
        part = corpus.where(F.col("shard").isin(shards))
        t0 = time.time()
        docmap = build_docmap(part)
        docmap.write.mode("overwrite").partitionBy("shard").parquet(paths.docmap)
        _mark("docmap_write", t0)
        t0 = time.time()

        tf = (
            part.select("shard", "doc_id", F.explode("terms").alias("term"))
            .groupBy("shard", "term", "doc_id")
            .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        )
        weighted = (
            tf.join(docmap.select("shard", "doc_id", "doc_ord", "doclen"), ["shard", "doc_id"])
            .join(dictionary.select("term", "idf", "term_bucket"), "term")
            .select(
                "shard",
                "term",
                "term_bucket",
                "doc_ord",
                (
                    F.col("idf")
                    * F.col("tf")
                    / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("doclen") / F.lit(avgdl)))
                ).alias("weight"),
            )
        )
        # Pack CONSECUTIVE postings into blocks of block_size. Grouping key
        # adds a coarse ord-range (2^20 ords) so a head term's per-shard list
        # never lands in one reducer unbounded (Zipf-skew defense) while tail
        # terms (df << range) still pack into a single dense block. Block
        # boundaries depend only on (ord order, block_size, range) — the
        # index is identical under any parallelism. The list is collected,
        # sorted and sliced JVM-side; Python sees only primitive arrays.
        per_block = block_size
        nblocks_per_grp = (_COARSE_RANGE + per_block - 1) // per_block
        grouped = (
            weighted.withColumn("grp", (F.col("doc_ord") / _COARSE_RANGE).cast("int"))
            .groupBy("shard", "term_bucket", "term", "grp")
            .agg(F.sort_array(F.collect_list(F.struct("doc_ord", "weight"))).alias("plist"))
        )
        sliced = grouped.select(
            "shard",
            "term_bucket",
            "term",
            "grp",
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.floor((F.size("plist") - 1) / per_block).cast("int"),
                    ),
                    lambda i: F.slice(F.col("plist"), i * per_block + 1, per_block),
                )
            ).alias("block_off", "chunk"),
        ).select(
            "shard",
            "term_bucket",
            "term",
            (F.col("grp").cast("long") * nblocks_per_grp + F.col("block_off")).cast("int").alias("block_id"),
            F.transform("chunk", lambda s: s["doc_ord"]).alias("ords"),
            F.transform("chunk", lambda s: s["weight"]).alias("weights"),
        )
        blocks = sliced.withColumn(
            "enc", _encode_block_udf("ords", "weights")
        ).select(
            "term",
            "term_bucket",
            "shard",
            "block_id",
            F.col("enc.first_ord").alias("first_ord"),
            F.col("enc.last_ord").alias("last_ord"),
            F.col("enc.n").alias("n"),
            F.col("enc.max_score").alias("max_score"),
            F.col("enc.docs").alias("docs"),
            F.col("enc.scores").alias("scores"),
        )
        # align physical partitioning with the directory layout before the
        # write: without this every write task emits a file into every
        # (shard, term_bucket) dir it holds rows for — tens of thousands of
        # tiny files whose creation overhead dominates and kills scaling.
        # Encoded blocks are compact, so this extra shuffle is cheap.
        blocks.repartition("shard", "term_bucket").write.mode("overwrite").partitionBy(
            "shard", "term_bucket"
        ).parquet(paths.postings)
        _mark("postings_write", t0)
        t0 = time.time()

        # write-then-manifest: a shard is committed only once its data is down.
        summary = (
            spark.read.parquet(paths.postings)
            .where(F.col("shard").isin(shards))
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_blocks"),
                F.sum("n").cast("long").alias("n_postings"),
            )
        )
        ndocs = docmap.groupBy("shard").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        manifest_rows = (
            ndocs.join(summary, "shard", "left")
            .select(
                F.col("shard").cast("int"),
                "n_docs",
                F.coalesce("n_blocks", F.lit(0)).cast("long").alias("n_blocks"),
                F.coalesce("n_postings", F.lit(0)).cast("long").alias("n_postings"),
                F.lit(time.time()).cast("double").alias("committed_at"),
            )
        )
        spark.createDataFrame(manifest_rows.collect(), MANIFEST_SCHEMA).write.mode("append").parquet(paths.manifest)
        _mark("manifest_commit", t0)

    corpus.unpersist()
    return stats
