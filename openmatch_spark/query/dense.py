"""Dense-vector top-k retrieval (the reference's FAISS dataflow, Spark-first).

Mirrors the reference's embed -> shard -> partition-search -> score-merge
pipeline (dense_retriever.py:226-259 `search`, :318-335 `SuccessiveRetriever`,
utils.py:262-283 `merge_retrieval_results_by_score`) with the scoring kernel
swapped from FAISS IndexFlatIP to a broadcast-matrix numpy matmul per
partition:

  embeddings ─mapInPandas (broadcast Q, np.argpartition top-k per batch)─►
  per-partition partial top-k ─window (score DESC, vec_id ASC)─► global top-k

Two scale paths:
- brute force: exact, one scan, no shuffle of the corpus — shuffle size is
  O(partitions * queries * k).
- IVF-style bucketed: corpus pre-bucketed by nearest of C md5-seeded
  centroids (k-means-free deterministic sketch); queries probe nprobe
  buckets — scan cost drops to nprobe/C of the corpus. Exactness traded
  for scan reduction, recall measured against brute force in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

TOPK_SCHEMA = "query_id string, vec_id string, score double"


def mean_pool_col(embs, mask=None):
    """Masked mean pooling over a sequence of token vectors (reference
    utils.py:287-291 `mean_pooling`): sum of vectors at mask==1 positions
    divided by the mask sum (clamped to >=1). Pure JVM higher-order-function
    algebra — no UDF.

    embs: array<array<double>> column (seq_len x dim); mask: array<int>
    column of the same seq_len (None = all-ones). Returns array<double>.
    """
    if mask is None:
        kept = embs
    else:
        pairs = F.zip_with(embs, mask, lambda v, m: F.struct(v.alias("v"), m.alias("m")))
        kept = F.transform(
            F.filter(pairs, lambda p: p["m"] == 1), lambda p: p["v"]
        )
    zero = F.transform(F.element_at(embs, 1), lambda _: F.lit(0.0))
    total = F.aggregate(
        kept, zero, lambda acc, v: F.zip_with(acc, v, lambda a, x: a + x)
    )
    denom = F.greatest(F.size(kept), F.lit(1)).cast("double")
    return F.transform(total, lambda x: x / denom)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _queries_to_matrix(
    queries, vec_col: str = "embedding"
) -> tuple[list[str], np.ndarray]:
    """Accept queries as list[(qid, vector)] OR a DataFrame(query_id,
    <vec_col>); returns (qids, float64 matrix)."""
    if isinstance(queries, DataFrame):
        pdf = queries.select(
            F.col("query_id").cast("string").alias("query_id"), vec_col
        ).toPandas()
        qids = pdf["query_id"].tolist()
        Q = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]],
            dtype=np.float64,
        )
        return qids, Q
    return [q[0] for q in queries], np.asarray(
        [q[1] for q in queries], dtype=np.float64
    )


def _probe_order(M: np.ndarray, C: np.ndarray, p: int) -> np.ndarray:
    """(n, p) nearest-centroid ids per row — stable argsort, ties resolve
    to the smaller centroid id. THE single definition of probe/assignment
    tie-break semantics: ivf_topk_df's probe kernel and the dedup path's
    cosine_neardup_bucketed both use it, and the SQL oracles replicate it
    as ROW_NUMBER() ... ORDER BY cos DESC, cid ASC."""
    return np.argsort(-(M @ C.T), axis=1, kind="stable")[:, :p]


# DataFrame query batches above this route to the distributed cogroup plan
# instead of materializing the query matrix on the driver (the dense twin
# of bm25_search._DISTRIBUTED_TOKENIZE_MIN_QUERIES; reference analog: the
# memory-bounded SuccessiveRetriever, dense_retriever.py:318-335). At the
# default 768-dim float64 this keeps the driver hop under ~50 MB.
_DISTRIBUTED_BRUTE_MIN_QUERIES = 8192
# cell count for the routed exact plan: enough cells that the per-cell
# matmul state stays bounded, few enough that replicating each query
# n_centroids times stays cheap relative to scoring the full corpus
_ROUTED_N_CENTROIDS = 32


def brute_force_topk(
    embeddings: DataFrame,
    queries,
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
    distributed_min_queries: int = _DISTRIBUTED_BRUTE_MIN_QUERIES,
) -> DataFrame:
    """Exact top-k (query_id, vec_id, score, rank).

    queries: list[(qid, vector)] — the small-batch/p50 path, riding to
    executors in the UDF closure (the reference materializes encoded
    queries driver-side the same way, dense_retriever.py:226-241) — or a
    DataFrame(query_id, embedding) for large batches, where the matrix is
    shipped ONCE per executor as a torrent broadcast variable instead of
    being re-serialized into every task's closure. Row-identical either way
    (same kernel, same float64 matmul, same tie-break; tested).

    A cosine DataFrame batch LARGER than distributed_min_queries never
    touches the driver at all: it routes to ivf_topk_df with
    nprobe == n_centroids, which is EXACT brute force — every query probes
    every cell, so each (query, corpus vector) pair is scored exactly once
    and the per-query top-k is the global top-k; the cells only partition
    the work for the cogroup. Row-identical to the broadcast path (tested).
    """
    sc = embeddings.sparkSession.sparkContext
    if (
        isinstance(queries, DataFrame)
        and metric == "cosine"
        and len(queries.limit(distributed_min_queries + 1).take(distributed_min_queries + 1))
        > distributed_min_queries
    ):
        dim = len(queries.select(vec_col).first()[0])
        bucketed = assign_buckets(
            embeddings, dim=dim, n_centroids=_ROUTED_N_CENTROIDS,
            id_col=id_col, vec_col=vec_col,
        )
        if id_col != "vec_id":
            bucketed = bucketed.withColumnRenamed(id_col, "vec_id")
        if vec_col != "embedding":
            bucketed = bucketed.withColumnRenamed(vec_col, "embedding")
        q = queries
        if vec_col != "embedding":
            q = q.withColumnRenamed(vec_col, "embedding")
        return ivf_topk_df(
            bucketed, q, dim, k=k, n_centroids=_ROUTED_N_CENTROIDS,
            nprobe=_ROUTED_N_CENTROIDS, round_to=round_to,
        )
    qids, Q = _queries_to_matrix(queries, vec_col=vec_col)
    if not qids:
        return embeddings.sparkSession.createDataFrame(
            [], "query_id string, vec_id string, score double, rank int"
        )
    if metric == "cosine":
        Q = _normalize_rows(Q)
    bc = sc.broadcast((qids, Q)) if isinstance(queries, DataFrame) else None
    closure = None if bc is not None else (qids, Q)

    def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, Q_ = bc.value if bc is not None else closure
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]], dtype=np.float64
            )
            if metric == "cosine":
                M = _normalize_rows(M)
            S = Q_ @ M.T  # (nq, batch)
            kk = min(k, S.shape[1])
            idx = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            rows = {"query_id": [], "vec_id": [], "score": []}
            ids = pdf[id_col].astype(str).to_numpy()
            for qi in range(S.shape[0]):
                rows["query_id"].extend([qids_[qi]] * kk)
                rows["vec_id"].extend(ids[idx[qi]])
                rows["score"].extend(S[qi, idx[qi]])
            yield pd.DataFrame(rows)

    partial = embeddings.select(id_col, vec_col).mapInPandas(score_partition, TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    out = (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )
    if round_to is not None:
        # rank on raw scores; round only the emitted value (cross-engine hash)
        out = out.withColumn("score", F.round("score", round_to))
    return out


def _centroids(dim: int, n_centroids: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return _normalize_rows(rng.standard_normal((n_centroids, dim)))


def train_centroids_kmeans(
    embeddings: DataFrame,
    n_centroids: int,
    sample_size: int = 20_000,
    iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means (Lloyd's) over a bounded deterministic sample —
    the standard IVF training recipe: train on a few-10k sample, assign the
    full corpus distributedly with assign_buckets(centroids=...).

    The sample is the sample_size rows with smallest md5(id) — a
    TakeOrdered (scan + per-partition heap), never a full sort, so the
    training pass is one cheap corpus scan at any scale. Empty clusters
    keep their previous centroid. Returns L2-normalized (n_centroids, dim).
    """
    samp = (
        embeddings.select(F.col(id_col).cast("string").alias("_id"), vec_col)
        .orderBy(F.md5(F.col("_id")))
        .limit(sample_size)
    )
    pdf = samp.select(vec_col).toPandas()
    X = _normalize_rows(
        np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    )
    if len(X) < n_centroids:
        raise ValueError(f"sample ({len(X)}) smaller than n_centroids ({n_centroids})")
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(n_centroids):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize_rows(C)
    return C


def assign_buckets(
    embeddings: DataFrame,
    dim: int,
    n_centroids: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """(vec_id, embedding, bucket): IVF-style coarse quantization. Default
    centroids are deterministic seeded random projections (no training
    pass); pass centroids= (e.g. from train_centroids_kmeans) for trained
    cells — same plumbing either way. Assignment = argmax cosine (first
    max wins on ties, matching both np.argmax and the SQL oracle's
    ROW_NUMBER ... ORDER BY cos DESC, cid ASC).

    The embedding column keeps its INPUT element type: narrowing an
    array<double> source to float here would silently perturb every
    downstream score by ~1e-8 and break the routed-vs-broadcast
    row-identity contract (brute_force_topk)."""
    C = _normalize_rows(centroids) if centroids is not None else _centroids(dim, n_centroids, seed)
    vec_type = dict(embeddings.dtypes).get(vec_col, "array<float>")

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            M = _normalize_rows(
                np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            )
            b = np.argmax(M @ C.T, axis=1)
            out = pdf[[id_col, vec_col]].copy()
            out[id_col] = out[id_col].astype(str)
            out["bucket"] = b.astype("int32")
            yield out

    return embeddings.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} string, {vec_col} {vec_type}, bucket int"
    )


def ivf_topk(
    bucketed: DataFrame,
    queries,
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Approximate top-k scanning only each query's nprobe nearest buckets.

    Probe order is (cosine DESC, centroid_id ASC) — stable argsort, so ties
    resolve identically to the SQL oracle's window ordering.

    queries: list[(qid, vector)] (small-batch closure path) or a
    DataFrame(query_id, embedding) — the DataFrame path (ivf_topk_df) is
    fully distributed: probe assignment runs executor-side and queries meet
    the corpus through a cogroup ON bucket, so neither the corpus nor the
    query set ever materializes on the driver. Row-identical results
    (tested)."""
    if isinstance(queries, DataFrame):
        return ivf_topk_df(
            bucketed, queries, dim, k=k, n_centroids=n_centroids,
            nprobe=nprobe, seed=seed, centroids=centroids, round_to=round_to,
        )
    C = _normalize_rows(centroids) if centroids is not None else _centroids(dim, n_centroids, seed)
    if not queries:
        return bucketed.sparkSession.createDataFrame(
            [], "query_id string, vec_id string, score double, rank int"
        )
    qids = [q[0] for q in queries]
    Q = _normalize_rows(np.asarray([q[1] for q in queries], dtype=np.float64))
    probes = _probe_order(Q, C, nprobe)
    wanted = sorted({int(b) for row in probes for b in row})
    # partition-prune the scan to the union of probed buckets, then mask
    # per-query inside the kernel: each query scores ONLY its own probed
    # buckets (exact IVF semantics — a doc outside the probe set can never
    # displace one inside it)
    scan = bucketed.where(F.col("bucket").isin(wanted))
    probe_lists = [np.asarray(sorted(int(b) for b in probes[i])) for i in range(len(queries))]

    def score_partition(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = _normalize_rows(
                np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            )
            buckets = pdf["bucket"].to_numpy()
            ids = pdf["vec_id"].astype(str).to_numpy()
            S = Q @ M.T
            rows = {"query_id": [], "vec_id": [], "score": []}
            for qi in range(S.shape[0]):
                idxs = np.nonzero(np.isin(buckets, probe_lists[qi]))[0]
                if not len(idxs):
                    continue
                s = S[qi, idxs]
                kk = min(k, len(idxs))
                sel = np.argpartition(-s, kk - 1)[:kk]
                rows["query_id"].extend([qids[qi]] * kk)
                rows["vec_id"].extend(ids[idxs[sel]])
                rows["score"].extend(s[sel])
            yield pd.DataFrame(rows)

    partial = scan.select("vec_id", "embedding", "bucket").mapInPandas(
        score_partition, TOPK_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    out = (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )
    if round_to is not None:
        out = out.withColumn("score", F.round("score", round_to))
    return out


def ivf_topk_df(
    bucketed: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    round_to: int | None = None,
    bucket_splits: int = 1,
) -> DataFrame:
    """Fully distributed IVF top-k for LARGE query batches.

    Dataflow (the 100 TB shape — nothing driver-bound, nothing closure-
    bound beyond the small centroid table):

      queries ─mapInPandas (argmax vs broadcast centroids)─► nprobe
        (query_id, embedding, bucket) probe rows
      corpus(bucket) cogroup probes(bucket) ─applyInPandas matmul─►
        per-cell candidates ─window (score DESC, vec_id ASC)─► top-k

    Each query meets ONLY its probed cells (exact IVF semantics, same as
    the closure kernel's per-query mask); the corpus shuffles once, keyed
    by its storage key `bucket` — with the corpus bucketed/pre-partitioned
    on disk that exchange disappears entirely. Queries (the small side)
    replicate nprobe times.

    bucket_splits > 1 salts hot cells: corpus rows sub-split by
    hash(vec_id) % splits, probe rows replicated per split — per-task
    matmul state drops by the split factor while results stay identical
    (every (query, cell-vector) pair still scored exactly once).
    """
    C = _normalize_rows(centroids) if centroids is not None else _centroids(dim, n_centroids, seed)
    nprobe_ = nprobe
    splits = max(int(bucket_splits), 1)

    def probe_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            Qm = _normalize_rows(
                np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            )
            order = _probe_order(Qm, C, nprobe_)
            out = pd.DataFrame(
                {
                    "query_id": pdf["query_id"].astype(str).to_numpy().repeat(nprobe_),
                    "embedding": [list(map(float, v)) for v in pdf["embedding"] for _ in range(nprobe_)],
                    "bucket": order.reshape(-1).astype("int32"),
                }
            )
            yield out

    # probe rows carry the query vector at array<double>: narrowing to
    # float32 here would silently perturb scores vs the closure path.
    # localCheckpoint materializes the assignment ONCE — it feeds both the
    # pruning semi-join below and the cogroup, and recomputing it per
    # consumer would double the query-side work (and, over a
    # non-deterministic queries source, could prune a cell the second
    # evaluation then probes — silently dropping candidates).
    probes = (
        queries.select(
            F.col("query_id").cast("string").alias("query_id"), "embedding"
        )
        .mapInPandas(probe_fn, "query_id string, embedding array<double>, bucket int")
        .localCheckpoint(eager=True)
    )

    corpus = bucketed.select("vec_id", "embedding", "bucket")
    # prune unprobed cells BEFORE the cogroup shuffle: cells no query
    # probes would otherwise still shuffle their vectors just to meet an
    # empty query group. The distinct probed-bucket set is tiny (<=
    # n_centroids rows) — a broadcast semi-join keeps the pruning on the
    # scan side of the exchange.
    corpus = corpus.join(
        F.broadcast(probes.select("bucket").distinct()), "bucket", "left_semi"
    )
    if splits > 1:
        corpus = corpus.withColumn(
            "_salt", F.pmod(F.xxhash64("vec_id"), F.lit(splits)).cast("int")
        )
        probes = probes.crossJoin(
            F.broadcast(
                probes.sparkSession.range(splits).select(
                    F.col("id").cast("int").alias("_salt")
                )
            )
        )
        keys = ["bucket", "_salt"]
    else:
        keys = ["bucket"]

    def score_cell(corpus_pdf: pd.DataFrame, q_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(corpus_pdf) or not len(q_pdf):
            return pd.DataFrame({"query_id": [], "vec_id": [], "score": []})
        M = _normalize_rows(
            np.asarray([np.asarray(v, dtype=np.float64) for v in corpus_pdf["embedding"]])
        )
        Qm = _normalize_rows(
            np.asarray([np.asarray(v, dtype=np.float64) for v in q_pdf["embedding"]])
        )
        S = Qm @ M.T
        kk = min(k, S.shape[1])
        idx = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
        ids = corpus_pdf["vec_id"].astype(str).to_numpy()
        qids = q_pdf["query_id"].astype(str).to_numpy()
        rows = {"query_id": [], "vec_id": [], "score": []}
        for qi in range(S.shape[0]):
            rows["query_id"].extend([qids[qi]] * kk)
            rows["vec_id"].extend(ids[idx[qi]])
            rows["score"].extend(S[qi, idx[qi]])
        return pd.DataFrame(rows)

    partial = (
        corpus.groupBy(*keys)
        .cogroup(probes.groupBy(*keys))
        .applyInPandas(score_cell, TOPK_SCHEMA)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    out = (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )
    if round_to is not None:
        out = out.withColumn("score", F.round("score", round_to))
    return out


def knn_filtered_topk(
    embeddings: DataFrame,
    queries,
    predicate,
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """The ES `knn` query's `filter` semantics: the predicate restricts
    the CANDIDATE set BEFORE top-k (pre-filtering), so every query still
    gets k survivors from the allowed subset — unlike post-filtering a
    finished run, which silently returns fewer than k. predicate: a
    Column or SQL string over the embeddings frame's columns (attribute
    columns may be joined on beforehand by the caller).

    Pre-filtering is the correct 100 TB shape too: the predicate reaches
    the embeddings scan (PushedFilters when it's a plain column
    predicate), so excluded vectors never cost a dot product. Routing
    (closure / broadcast-matrix / cogroup) is inherited unchanged from
    brute_force_topk."""
    import pyspark.sql.functions as F  # local: keep module import surface

    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    return brute_force_topk(
        embeddings.where(cond), queries, k=k, metric=metric,
        id_col=id_col, vec_col=vec_col, round_to=round_to,
    )
