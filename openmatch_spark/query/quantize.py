"""Scalar int8 quantization for dense retrieval — the memory/bandwidth
lever the dense path needs at 100 TB (Lucene 9.10+ int8 HNSW quantization
and FAISS SQ8 use the same scheme: per-vector symmetric max-abs scaling).

    scale(v) = max_i |v_i| / 127          (0-vector => scale 0, all codes 0)
    q_i      = round(v_i / scale)         in [-127, 127]
    <u, v>  ~= scale(u) * scale(v) * Σ q_u[i] * q_v[i]

A float64 768-dim vector is 6 KB; its int8 codes are 768 bytes + one
scale — an 8× cut in scan, shuffle, and broadcast bytes for the
approximate phase. Retrieval is two-phase (the standard quantized-search
contract): score EVERYTHING with the cheap int8 dot, keep the top
k × rescore_factor candidates per query, rescore ONLY those with the
exact float vectors, and cut to k. Recall loss is confined to true
neighbors that fall below the approximate cut — rescore_factor is the
knob, and the report from quantization_error() tells you how much
headroom you need.

All algebra is JVM column expressions (transform / zip_with / aggregate
folds) — no UDF, no driver hop; the candidate cut is a window over the
approximate scores and the exact rescore joins only the bounded
(queries × k × factor) candidate set back to the float vectors.

Determinism contract for the oracle: approximate scores are ranked after
rounding to 6 dp with a vec_id tie-break, so the candidate set is stable
across engines (same rule replicated in DuckDB list algebra).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def quantize_col(vec):
    """(scale double, codes array<int>) struct for one vector column —
    per-vector symmetric max-abs int8 quantization."""
    scale = F.array_max(F.transform(vec, lambda x: F.abs(x))) / F.lit(127.0)
    codes = F.when(scale == 0.0, F.transform(vec, lambda x: F.lit(0))).otherwise(
        F.transform(vec, lambda x: F.round(x / scale).cast("int"))
    )
    return F.struct(scale.alias("scale"), codes.alias("codes"))


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, scale, codes) — the persistable quantized sidecar. Codes
    are int (value range [-127, 127]); write with a tinyint cast if the
    sink supports it for the full 8× byte cut."""
    q = quantize_col(F.col(vec_col))
    return embeddings.select(
        F.col(id_col).alias(id_col),
        q["scale"].alias("scale"),
        q["codes"].alias("codes"),
    )


def _int_dot(a, b):
    """Exact integer dot product of two code arrays (bigint fold — 768
    dims x 127² is far inside int64)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def quantized_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rescore_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int | None = None,
) -> DataFrame:
    """Two-phase quantized cosine top-k: (query_id, vec_id, score, rank)
    where score is the EXACT float cosine of the surviving candidates.

    Both sides are L2-normalized first (so the int8 dot approximates
    cosine directly), quantized with the same column algebra, scored with
    the exact-integer dot, cut per query to k * rescore_factor on the
    rounded approximate score (module-doc determinism contract), and the
    survivors rescored exactly."""
    if rescore_factor < 1:
        raise ValueError(f"rescore_factor must be >= 1, got {rescore_factor}")

    def _norm(vec):
        nrm = F.sqrt(
            F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
        )
        return F.when(nrm == 0.0, vec).otherwise(
            F.transform(vec, lambda x: x / nrm)
        )

    corpus = embeddings.select(
        F.col(id_col).cast("string").alias("vec_id"),
        F.col(vec_col).alias("_v"),
    ).withColumn("_nv", _norm(F.col("_v")))
    cq = corpus.select(
        "vec_id", quantize_col(F.col("_nv")).alias("_q")
    ).select("vec_id", F.col("_q.scale").alias("c_scale"),
             F.col("_q.codes").alias("c_codes"))

    qn = queries.select(
        F.col(query_id_col).cast("string").alias("query_id"),
        _norm(F.col(vec_col)).alias("_qv"),
    )
    qq = qn.select(
        "query_id", "_qv", quantize_col(F.col("_qv")).alias("_q")
    ).select("query_id", "_qv", F.col("_q.scale").alias("q_scale"),
             F.col("_q.codes").alias("q_codes"))

    # the approximate phase shuffles ONLY (query_id, vec_id, approx) rows
    # through the per-query window — never a vector of either kind
    approx = cq.crossJoin(
        F.broadcast(qq.select("query_id", "q_scale", "q_codes"))
    ).select(
        "query_id",
        "vec_id",
        F.round(
            F.col("q_scale") * F.col("c_scale")
            * _int_dot(F.col("q_codes"), F.col("c_codes")),
            6,
        ).alias("approx"),
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.desc("approx"), F.asc("vec_id")
    )
    cand = approx.withColumn("_r", F.row_number().over(wa)).where(
        F.col("_r") <= k * rescore_factor
    )

    # exact rescore: join the bounded candidate set back to the float
    # vectors (broadcast the candidates, scan the corpus once more)
    exact = cand.select("query_id", "vec_id").join(
        F.broadcast(qn.select("query_id", "_qv")), "query_id"
    ).join(
        corpus.select("vec_id", "_nv"), "vec_id"
    ).select(
        "query_id",
        "vec_id",
        F.aggregate(
            F.zip_with(F.col("_qv"), F.col("_nv"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    out = (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )
    if round_to is not None:
        out = out.withColumn("score", F.round("score", round_to))
    return out


def quantization_error(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-row audit: max/avg absolute reconstruction error and the avg
    cosine between each normalized vector and its dequantized self — how
    much signal int8 keeps on THIS corpus (pick rescore_factor with it)."""
    deq = F.zip_with(
        F.col("_q.codes"),
        F.col("_nv"),
        lambda c, _x: c.cast("double") * F.col("_q.scale"),
    )
    base = (
        embeddings.select(F.col(vec_col).alias("_v"))
        .withColumn(
            "_nv",
            F.transform(
                F.col("_v"),
                lambda x: x
                / F.sqrt(
                    F.aggregate(F.col("_v"), F.lit(0.0), lambda a, y: a + y * y)
                ),
            ),
        )
        .withColumn("_q", quantize_col(F.col("_nv")))
        .withColumn("_dq", deq)
        .select(
            F.array_max(
                F.zip_with(F.col("_nv"), F.col("_dq"), lambda a, b: F.abs(a - b))
            ).alias("max_err"),
            F.aggregate(
                F.zip_with(F.col("_nv"), F.col("_dq"), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dot"),
            F.sqrt(
                F.aggregate(
                    F.col("_dq"), F.lit(0.0), lambda acc, x: acc + x * x
                )
            ).alias("dq_norm"),
        )
    )
    return base.agg(
        F.max("max_err").alias("max_abs_err"),
        F.avg("max_err").alias("avg_max_abs_err"),
        F.avg(F.col("dot") / F.col("dq_norm")).alias("avg_self_cosine"),
    )
