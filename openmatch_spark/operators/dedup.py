"""Large-scale training-data deduplication operators.

No direct reference counterpart (OpenMatch consumes pre-cleaned corpora);
these are the corpus-preparation ops a 100 TB web-text pipeline needs before
indexing. All hashes are md5-based so every SQL-expressible variant can be
cross-checked bit-for-bit against the DuckDB oracle (functions/hashing.py).

Scale notes:
- exact: one groupBy on a 32-byte hash — shuffle is O(corpus keys), no skew
  (md5 keys are uniform).
- minhash LSH: signature computation is an explode+min agg (map-side combine
  collapses each doc's shingles before shuffle); candidate pairs come from a
  self-join on (band, band_hash) buckets, so the cross product is per-bucket,
  never global. Bucket skew (boilerplate pages) is bounded by pairs_per_bucket
  pruning.
- simhash: vectorized pandas UDF, 64-bit fingerprints; near-dup = Hamming
  distance <= d via banding on 4 x 16-bit chunks (pigeonhole: d<=3 pairs share
  at least one exact chunk).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from openmatch_spark.analysis import tokenize_col


def normalized_text(col, analyzer: str = "simple"):
    """Canonical text for exact dedup: lowercase tokens joined by one space
    (whitespace/punct-insensitive). SQL-equivalent:
    concat_ws(' ', tokens)."""
    return F.concat_ws(" ", tokenize_col(col, analyzer))


def exact_duplicates(corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(content_hash, n_docs, canonical_doc_id, doc_ids): groups with >1 doc.

    canonical = min doc_id (the survivor a dedup pass would keep).
    """
    hashed = corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.md5(normalized_text(F.col(text_col))).alias("content_hash"),
    )
    return (
        hashed.groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def shingles(corpus: DataFrame, n: int = 3, id_col: str = "doc_id",
             text_col: str = "text", analyzer: str = "simple") -> DataFrame:
    """(doc_id, shingle): distinct n-token shingles per doc (word n-grams)."""
    toks = corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        tokenize_col(F.col(text_col), analyzer).alias("terms"),
    )
    sh = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("terms") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("terms") - n),
                    lambda i: F.concat_ws(" ", F.slice(F.col("terms"), i + 1, n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("shingle"),
    )
    return sh.distinct()


def minhash_signatures(doc_shingles: DataFrame, num_hashes: int = 8) -> DataFrame:
    """(doc_id, mh_0..mh_{H-1}): portable MinHash via seeded md5 hex minima."""
    aggs = [
        F.min(F.md5(F.concat_ws("|", F.lit(str(h)), F.col("shingle")))).alias(f"mh_{h}")
        for h in range(num_hashes)
    ]
    return doc_shingles.groupBy("doc_id").agg(*aggs)


def minhash_candidate_pairs(
    signatures: DataFrame, num_bands: int = 4, num_hashes: int = 8
) -> DataFrame:
    """(doc_a, doc_b, n_bands): pairs sharing >=1 LSH band bucket (doc_a < doc_b).

    rows_per_band = num_hashes // num_bands; band hash = md5 of the band's
    concatenated minima. The self-join is per (band, band_hash) bucket.
    """
    rows = num_hashes // num_bands
    bands = None
    for b in range(num_bands):
        cols = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        one = signatures.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *cols)).alias("band_hash"),
        )
        bands = one if bands is None else bands.unionByName(one)
    left = bands.alias("l")
    right = bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )
    return pairs


def jaccard_pairs(doc_shingles: DataFrame, candidates: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_common, n_a, n_b, jaccard) for candidate pairs only.

    Joining shingle sets only for LSH candidates keeps the verification step
    O(candidates x shingles), never all-pairs.
    """
    sizes = doc_shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = doc_shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = doc_shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        candidates.select("doc_a", "doc_b")
        .join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            "n_a",
            "n_b",
            (F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))).alias("jaccard"),
        )
    )


@pandas_udf(LongType())
def simhash64_udf(terms: pd.Series) -> pd.Series:
    """64-bit SimHash over a doc's term list (tf-weighted, md5 bit mixing)."""
    import hashlib

    import numpy as np

    out = []
    for tl in terms:
        if tl is None or len(tl) == 0:
            out.append(0)
            continue
        vals, counts = np.unique(np.asarray(tl, dtype=object), return_counts=True)
        acc = np.zeros(64, dtype=np.int64)
        for t, c in zip(vals, counts):
            h = int.from_bytes(hashlib.md5(str(t).encode()).digest()[:8], "big")
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            acc += np.where(bits == 1, c, -c)
        fp = np.uint64(0)
        for i in range(64):
            if acc[i] > 0:
                fp |= np.uint64(1) << np.uint64(i)
        out.append(int(fp.astype(np.int64)))
    return pd.Series(out, dtype="int64")


def simhash_fingerprints(corpus: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", analyzer: str = "simple") -> DataFrame:
    """(doc_id, simhash): 64-bit fingerprints."""
    return corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        simhash64_udf(tokenize_col(F.col(text_col), analyzer)).alias("simhash"),
    )


def simhash_near_duplicates(fingerprints: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming): pairs within max_hamming bits.

    Banding on 4 x 16-bit chunks: any pair with hamming <= 3 agrees exactly on
    >= 1 chunk (pigeonhole), so candidates come from 4 bucket-joins, then the
    exact popcount filter.
    """
    chunks = None
    for i in range(4):
        c = fingerprints.select(
            "doc_id",
            "simhash",
            F.lit(i).alias("chunk"),
            F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk_val"),
        )
        chunks = c if chunks is None else chunks.unionByName(c)
    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).where(F.col("hamming") <= max_hamming).select("doc_a", "doc_b", "hamming")
