"""Incremental corpus deduplication against a persisted signature store.

deduplicate_corpus (operators/dedup.py) answers "which of THESE docs are
duplicates" in one batch pass; an incremental ingest (streaming/incremental
.py drains feeding maintain_index) instead sees the corpus drain by drain,
and re-running the batch pass over the accumulated corpus re-pays the full
signature cost at every compaction cadence — the one stage of the
curate/maintain story whose cost was not incremental (VERDICT r3 item 2).

This module makes near-dup dedup incremental in COST while keeping the
batch pass's answers: a small store of per-doc artifacts is persisted next
to the index, and each drain computes signatures for the NEW docs only,
joining new-vs-all on the same LSH band buckets.

Store layout (parquet dirs under store_dir; same driver-visible shared
filesystem assumption as the index's stats.json):

  hashes/    (content_hash, canon)       min doc_id per normalized-text md5
  bands/     (doc_id, band, band_hash)   LSH bands of every exact-survivor
  shingles/  (doc_id, shingle)           shingle sets of every exact-survivor

bands drive candidate generation (new docs join the union band table, cost
O(bucket x new-members), never old-vs-old); shingles let the exact-Jaccard
verification run without re-reading or re-tokenizing historical text —
storage linear in the corpus, the standard space-for-incrementality trade.

Equivalence contract (CORRECTNESS entry `dedup_incremental` + pytest):
the union of per-drain verdicts equals deduplicate_corpus over the union
corpus (greedy local-min rule), provided

  1. doc ids are strictly increasing across drains in STRING order (an
     arriving doc never has a smaller id than any already-seen doc — the
     natural property of ingest-assigned ids). Otherwise a later doc could
     retroactively become an earlier group's canonical, which an
     incremental pass that never revisits old verdicts cannot express.
  2. no LSH band bucket crosses max_bucket BETWEEN drains: a bucket that
     was pairable when a doc arrived but oversized in the final union
     would flip that doc's batch reason from 'near' to 'bucket'. (keep
     verdicts agree in the common cases, but are not guaranteed.)

Within those preconditions every stage reproduces the batch rule exactly:
exact groups extend stored groups, the near rule sees exactly the batch's
candidate edges incident to new docs (old-old edges were already seen in
earlier drains), and bucket canonicals are union minima.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from openmatch_spark.operators.dedup import (
    jaccard_pairs,
    minhash_bands,
    minhash_signatures,
    normalized_text,
    shingles,
)

_SCHEMAS = {
    "urls": "url_key string, canon string",
    "hashes": "content_hash string, canon string",
    "bands": "doc_id string, band int, band_hash string",
    "shingles": "doc_id string, shingle string",
}


def _store_path(store_dir: str, kind: str) -> str:
    return os.path.join(store_dir, kind)


def _read_store(spark: SparkSession, store_dir: str, kind: str) -> DataFrame:
    p = _store_path(store_dir, kind)
    if os.path.exists(p):
        return spark.read.parquet(p)
    return spark.createDataFrame([], _SCHEMAS[kind])


def incremental_deduplicate(
    spark: SparkSession,
    store_dir: str,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "simple",
    shingle_n: int = 3,
    num_hashes: int = 8,
    num_bands: int = 4,
    jaccard_threshold: float = 0.8,
    max_bucket: int = 1000,
    url_col: str | None = None,
    commit: bool = True,
) -> DataFrame:
    """Dedup verdicts (doc_id, keep, reason, dup_of) for THIS drain's docs
    against everything previously committed to the store, then (commit=True)
    append the drain's own artifacts so the next drain sees it.

    Parameters mirror deduplicate_corpus and MUST stay constant across the
    drains of one store (the store records bands/shingles computed under
    them; mixing parameters would compare incomparable signatures).
    url_col adds the canonical-url stage ahead of the content stages —
    keyed on url_dedup_key_col and backed by a fourth store table
    `urls/(url_key, canon)` — with the same union-equality contract as
    deduplicate_corpus(url_col=...) (pytest-pinned).

    The returned DataFrame is eagerly materialized (localCheckpoint): its
    plan reads the store as of NOW, and the commit below appends to those
    same paths — a lazy result re-evaluated after commit could observe its
    own drain.
    """
    old_hashes = _read_store(spark, store_dir, "hashes")
    old_bands = _read_store(spark, store_dir, "bands")
    old_shingles = _read_store(spark, store_dir, "shingles")

    ids = corpus.select(F.col(id_col).cast("string").alias("doc_id"))

    # ---- url stage (url_col set): extend stored canonical-url groups ------
    # same shape as the exact stage, keyed on the folded canonical url
    # (operators/transforms.py url_dedup_key_col); mirrors
    # deduplicate_corpus(url_col=...), so url drops leave before hashing
    drop_url = None
    add_urls = None
    if url_col is not None:
        from openmatch_spark.operators.transforms import url_dedup_key_col

        old_urls = _read_store(spark, store_dir, "urls")
        urls = corpus.select(
            F.col(id_col).cast("string").alias("doc_id"),
            url_dedup_key_col(F.col(url_col)).alias("_u"),
        ).where(F.col("_u").isNotNull() & (F.length("_u") > 0))
        umin = urls.groupBy("_u").agg(
            F.min("doc_id").alias("_new_min"), F.count(F.lit(1)).alias("_n")
        )
        umerged = umin.join(
            old_urls.withColumnRenamed("url_key", "_u"), "_u", "left"
        ).select(
            "_u",
            "_n",
            "_new_min",
            F.coalesce(F.least("canon", "_new_min"), F.col("_new_min")).alias("_canon"),
            F.col("canon").isNotNull().alias("_seen"),
        )
        drop_url = (
            urls.join(umerged, "_u")
            .where(
                (F.col("_seen") | (F.col("_n") > 1))
                & (F.col("doc_id") != F.col("_canon"))
            )
            .select("doc_id", F.col("_canon").alias("dup_of"))
            .withColumn("reason", F.lit("url"))
        )
        add_urls = umin.join(
            old_urls.withColumnRenamed("url_key", "_u"), "_u", "left_anti"
        ).select(F.col("_u").alias("url_key"), F.col("_new_min").alias("canon"))

    # ---- exact stage: extend stored content-hash groups -------------------
    hashed = corpus.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.md5(normalized_text(F.col(text_col), analyzer)).alias("_h"),
    )
    if drop_url is not None:
        hashed = hashed.join(drop_url.select("doc_id"), "doc_id", "left_anti")
    gmin_new = hashed.groupBy("_h").agg(
        F.min("doc_id").alias("_new_min"), F.count(F.lit(1)).alias("_n")
    )
    merged = gmin_new.join(
        old_hashes.withColumnRenamed("content_hash", "_h"), "_h", "left"
    ).select(
        "_h",
        "_n",
        "_new_min",
        # least() for robustness; under the monotone-id precondition a
        # stored canon is always the smaller one
        F.coalesce(F.least("canon", "_new_min"), F.col("_new_min")).alias("_canon"),
        F.col("canon").isNotNull().alias("_seen"),
    )
    drop_exact = (
        hashed.join(merged, "_h")
        .where((F.col("_seen") | (F.col("_n") > 1)) & (F.col("doc_id") != F.col("_canon")))
        .select("doc_id", F.col("_canon").alias("dup_of"))
        .withColumn("reason", F.lit("exact"))
    )

    new_surv = ids.join(drop_exact.select("doc_id"), "doc_id", "left_anti")
    if drop_url is not None:
        new_surv = new_surv.join(drop_url.select("doc_id"), "doc_id", "left_anti")
    surv_corpus = corpus.select(
        F.col(id_col).cast("string").alias("doc_id"), F.col(text_col).alias("text")
    ).join(new_surv, "doc_id", "left_semi")

    # ---- signatures for NEW exact-survivors only --------------------------
    sh_new = shingles(surv_corpus, n=shingle_n, analyzer=analyzer)
    sig_new = minhash_signatures(sh_new, num_hashes=num_hashes)
    bands_new = minhash_bands(sig_new, num_bands=num_bands, num_hashes=num_hashes)

    bands_all = old_bands.withColumn("_new", F.lit(0)).unionByName(
        bands_new.withColumn("_new", F.lit(1))
    )
    w = Window.partitionBy("band", "band_hash")
    counted = bands_all.withColumn("_bsz", F.count(F.lit(1)).over(w)).withColumn(
        "_bmin", F.min("doc_id").over(w)
    )

    # ---- near stage: candidates = union-bucket pairs incident to new docs
    # (old-old pairs were candidates of earlier drains); bucket cap applies
    # to the UNION size, same as the batch pass at this point in the ingest
    ok = counted.where(F.col("_bsz") <= max_bucket)
    cand = (
        ok.select("band", "band_hash", "doc_id").alias("l")
        .join(
            ok.where(F.col("_new") == 1)
            .select("band", "band_hash", "doc_id")
            .alias("r"),
            ["band", "band_hash"],
        )
        .where(F.col("l.doc_id") != F.col("r.doc_id"))
        .select(
            F.least("l.doc_id", "r.doc_id").alias("doc_a"),
            F.greatest("l.doc_id", "r.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # verification only needs the candidate docs' shingle sets
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_cand = old_shingles.unionByName(sh_new).join(cand_docs, "doc_id", "left_semi")
    verified = jaccard_pairs(sh_cand, cand).where(
        F.col("jaccard") >= jaccard_threshold
    )
    # the greedy local-min rule only ever drops the LARGER end of an edge,
    # and under monotone ids the larger end of a new-incident edge is a NEW
    # doc — restrict explicitly so a precondition violation can only lose
    # edges, never invent a retroactive drop of an old doc
    drop_near = (
        verified.join(
            new_surv.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi"
        )
        .select(F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("nbr"))
        .groupBy("doc_id")
        .agg(F.min("nbr").alias("dup_of"))
        .withColumn("reason", F.lit("near"))
    )

    # ---- bucket stage: union-oversized buckets, canon = union minimum -----
    drop_bucket = (
        counted.where(
            (F.col("_bsz") > max_bucket)
            & (F.col("_new") == 1)
            & (F.col("doc_id") != F.col("_bmin"))
        )
        .groupBy("doc_id")
        .agg(F.min("_bmin").alias("dup_of"))
        .withColumn("reason", F.lit("bucket"))
    )

    drops = drop_exact.unionByName(drop_near).unionByName(drop_bucket)
    if drop_url is not None:
        drops = drops.unionByName(drop_url)
    order = (
        F.when(F.col("reason") == "url", 0)
        .when(F.col("reason") == "exact", 1)
        .when(F.col("reason") == "near", 2)
        .otherwise(3)
    )
    wp = Window.partitionBy("doc_id").orderBy(order.asc(), F.col("dup_of").asc())
    drops = (
        drops.withColumn("_rn", F.row_number().over(wp))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    verdicts = (
        ids.join(drops, "doc_id", "left")
        .select("doc_id", F.col("reason").isNull().alias("keep"), "reason", "dup_of")
        .localCheckpoint(eager=True)
    )

    if commit:
        # materialize BEFORE writing — the append frames read the store
        # paths they are about to append to, and parquet file listing at
        # write time must not race the reads
        add_hashes = (
            gmin_new.join(
                old_hashes.withColumnRenamed("content_hash", "_h"),
                "_h",
                "left_anti",
            )
            .select(
                F.col("_h").alias("content_hash"), F.col("_new_min").alias("canon")
            )
            .localCheckpoint(eager=True)
        )
        add_bands = bands_new.localCheckpoint(eager=True)
        add_shingles = sh_new.localCheckpoint(eager=True)
        if add_urls is not None:
            add_urls = add_urls.localCheckpoint(eager=True)
            add_urls.write.mode("append").parquet(_store_path(store_dir, "urls"))
        add_hashes.write.mode("append").parquet(_store_path(store_dir, "hashes"))
        add_bands.write.mode("append").parquet(_store_path(store_dir, "bands"))
        add_shingles.write.mode("append").parquet(_store_path(store_dir, "shingles"))
    return verdicts
