"""Product quantization (PQ) for dense retrieval — the codebook-compression
lever beyond scalar int8 (Jégou et al. 2011, "Product quantization for
nearest neighbor search"; FAISS IndexPQ / IVFADC use the same scheme).

The vector is split into m subspaces; each subvector is replaced by the id
of its nearest of ksub learned centroids, so a 64-dim float64 vector
(512 B) becomes m small codes (m bytes at ksub <= 256) — a 128x cut in
resident bytes for the approximate phase. Query scoring is ADC
(asymmetric distance computation): per query precompute the m × ksub
look-up table of <q_sub, centroid> dots, then a doc's approximate score
is just m table gathers summed — no float vector is touched until the
exact rescore of the bounded candidate set.

Codebook training here is DISTRIBUTED and ENGINE-REPRODUCIBLE k-means,
not a driver-side sample fit: the init assigns every vector to a bucket
by portable md5 (deterministic in Spark / DuckDB / Python alike), each
Lloyd round is one cross-join against the broadcast (m × ksub) centroid
table + one map-side-combinable min aggregate + one element-wise mean —
pure DataFrame algebra over the full corpus, the same plan family the
IVF trainer uses. Every learned quantity is rounded (round_to) before it
feeds a comparison, so centroids, assignments, LUTs, and candidate cuts
are bit-comparable across engines (the house mmr/greedy determinism
rule). Empty clusters are simply dropped (their id never wins an argmin);
FAISS reassigns them from large clusters — at corpus scale with md5 init
they essentially never occur, and dropping is the honest distributed
behavior.

Two-phase retrieval contract (same as the int8 path): approximate-score
everything from codes, keep top k × rescore_factor per query (rounded
score, vec_id tie-break), exact-rescore only those against the float
vectors, cut to k. At 100 TB the codes table is what scans/shuffles;
the float table is touched for queries × k × factor rows only. Composes
with IVF bucketing (scan only probed cells' codes) exactly like IVFADC.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.functions.hashing import md5_rank_col


def _subvectors(df: DataFrame, id_col: str, vec_col: str, m: int, sub: int):
    """(id, j, sub) — one row per subspace j in [0, m), sub = the j-th
    dim/m slice. Pure projection + one explode."""
    parts = F.array(*[
        F.struct(
            F.lit(j).alias("j"),
            F.slice(F.col(vec_col), j * sub + 1, sub).alias("sub"),
        )
        for j in range(m)
    ])
    return df.select(
        F.col(id_col).cast("string").alias("id"),
        F.explode(parts).alias("p"),
    ).select("id", F.col("p.j").alias("j"), F.col("p.sub").alias("sub"))


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _mean_centroids(assigned: DataFrame, sub: int, round_to: int) -> DataFrame:
    """(j, cid, centroid) — element-wise mean of each cluster's
    subvectors, rounded so both engines carry identical codebooks."""
    return assigned.groupBy("j", "cid").agg(
        F.array(*[
            F.round(F.avg(F.element_at("sub", i + 1)), round_to)
            for i in range(sub)
        ]).alias("centroid")
    )


def _assign(subs: DataFrame, centroids: DataFrame, round_to: int) -> DataFrame:
    """(id, j, sub, cid) — nearest centroid per subvector: broadcast the
    (m × ksub) codebook, rounded squared L2, min struct (dist, cid) —
    one map-side-combinable aggregate, no window shuffle."""
    d = F.round(_sq_dist(F.col("sub"), F.col("centroid")), round_to)
    return (
        subs.join(F.broadcast(centroids), "j")
        .select(
            "id", "j", "sub",
            F.struct(d.alias("d"), F.col("cid").alias("cid")).alias("dc"),
        )
        .groupBy("id", "j")
        .agg(F.first("sub").alias("sub"), F.min("dc").alias("dc"))
        .select("id", "j", "sub", F.col("dc.cid").alias("cid"))
    )


def pq_train(
    embeddings: DataFrame,
    m: int = 4,
    ksub: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """Learn the PQ codebook: (j, cid, centroid array<double>) with
    j in [0, m), cid in [0, ksub). Init: portable md5(id) mod ksub
    buckets -> element-wise means; then `iters` Lloyd rounds (assign to
    nearest rounded centroid, re-mean). Deterministic in (seed, data) —
    identical in Spark, DuckDB, and Python."""
    if m <= 0 or ksub <= 0:
        raise ValueError(f"m and ksub must be positive, got {m}, {ksub}")
    dim = embeddings.select(
        F.size(F.col(vec_col)).alias("d")
    ).first()["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    subs = _subvectors(
        embeddings.select(
            F.col(id_col).cast("string").alias(id_col), vec_col
        ),
        id_col, vec_col, m, sub,
    )
    bucket = (
        F.conv(F.substring(md5_rank_col("id", seed=seed), 1, 8), 16, 10)
        .cast("long") % ksub
    ).cast("int")
    assigned = subs.withColumn("cid", bucket)
    centroids = _mean_centroids(assigned, sub, round_to)
    for _ in range(iters):
        centroids = F.broadcast(centroids).localCheckpoint(eager=True)
        assigned = _assign(subs, centroids, round_to)
        centroids = _mean_centroids(assigned, sub, round_to)
    return centroids


def pq_encode(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """(vec_id, j, code) — the persistable codes table: each subvector
    replaced by its nearest centroid id (rounded distance, cid
    tie-break). m small ints per vector: the 100 TB-resident form."""
    first = centroids.select("centroid").first()
    if first is None:
        raise ValueError("empty codebook")
    m = centroids.select(F.max("j")).first()[0] + 1
    sub = len(first["centroid"])
    subs = _subvectors(
        embeddings.select(
            F.col(id_col).cast("string").alias(id_col), vec_col
        ),
        id_col, vec_col, m, sub,
    )
    return _assign(subs, centroids, round_to).select(
        F.col("id").alias(id_col), "j", F.col("cid").alias("code")
    )


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    centroids: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    rescore_factor: int = 4,
    q_id_col: str = "query_id",
    q_vec_col: str = "embedding",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """(query_id, vec_id, score, rank) — two-phase ADC retrieval:

      1. LUT: per (query, j, cid) the dot <q_sub, centroid> (rounded) —
         queries × m × ksub rows, broadcast.
      2. approx: codes ⋈ LUT on (j, code) → one groupBy(query, doc)
         summing m gathers (rounded) — the only corpus-sized stage, and
         it touches CODES, never float vectors.
      3. cut to k × rescore_factor per query (approx DESC, vec_id ASC),
         exact-rescore the candidates against the float vectors
         (ascending-index fold = deterministic sum), final top-k on the
         rounded exact score.

    `score` is the EXACT inner product of the survivors — approximation
    affects recall only, never the reported values."""
    if k <= 0 or rescore_factor <= 0:
        raise ValueError("k and rescore_factor must be positive")
    first = centroids.select("centroid").first()
    if first is None:
        raise ValueError("empty codebook")
    m = centroids.select(F.max("j")).first()[0] + 1
    sub = len(first["centroid"])
    qsubs = _subvectors(
        queries.select(F.col(q_id_col).cast("string").alias(q_id_col), q_vec_col),
        q_id_col, q_vec_col, m, sub,
    ).withColumnRenamed("id", "query_id")
    lut = (
        qsubs.join(F.broadcast(centroids), "j")
        .select(
            "query_id", "j", F.col("cid").alias("code"),
            F.round(_dot(F.col("sub"), F.col("centroid")), round_to).alias("w"),
        )
    )
    approx = (
        codes.select(
            F.col(id_col).cast("string").alias("vec_id"), "j", "code"
        )
        .join(F.broadcast(lut), ["j", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("w"), round_to).alias("approx"))
    )
    wnd = Window.partitionBy("query_id").orderBy(
        F.desc("approx"), F.asc("vec_id")
    )
    cand = (
        approx.withColumn("_r", F.row_number().over(wnd))
        .where(F.col("_r") <= k * rescore_factor)
        .select("query_id", "vec_id")
    )
    qv = queries.select(
        F.col(q_id_col).cast("string").alias("query_id"),
        F.col(q_vec_col).alias("_qv"),
    )
    dv = embeddings.select(
        F.col(id_col).cast("string").alias("vec_id"),
        F.col(vec_col).alias("_dv"),
    )
    exact = (
        cand.join(dv, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id", "vec_id",
            F.round(_dot(F.col("_qv"), F.col("_dv")), round_to).alias("score"),
        )
    )
    wnd2 = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(wnd2))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )
