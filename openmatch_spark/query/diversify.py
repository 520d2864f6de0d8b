"""Result diversification — Maximal Marginal Relevance (Carbonell &
Goldstein 1998): re-rank a candidate run so each pick balances relevance
against redundancy with what is already picked,

    MMR(c) = lam * rel(c) - (1 - lam) * max_{s in selected} sim(c, s)

with sim = cosine over an embedding column and maxsim = 0 for the first
pick (so pick 1 is the plain relevance argmax scaled by lam). Reference
counterpart: none — the reference returns raw FAISS top-k; MMR is the
standard diversification layer engines put on top of it.

Determinism contract: relevance and pairwise similarities are ROUNDED
(default 6 dp) before the greedy loop, and every tie breaks by doc_id
ASC — so the selection is reproducible across partitionings, runs, and
engines (the DuckDB oracle replays the same greedy on the same rounded
inputs step by step).

Scale shape: candidates are a (queries × depth)-bounded run, so the
embedding hydration broadcasts the run against the corpus-sized vector
table, and the greedy runs per query inside one applyInPandas over
depth-bounded groups (O(depth² ) sims per query — depth is 10s-100s by
construction). The corpus never shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_OUT_SCHEMA = "query_id string, doc_id string, mmr_score double, rank int"


def mmr_rerank(
    run: DataFrame,
    embeddings: DataFrame,
    lam: float = 0.7,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """(query_id, doc_id, mmr_score, rank) — top-k of ``run`` re-ranked by
    greedy MMR. run: (query_id, doc_id, score) candidates (doc_id keys
    into embeddings[id_col]); candidates without a vector are dropped —
    similarity to them is undefined, so they cannot participate."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    cand = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.round(F.col("score").cast("double"), round_to).alias("rel"),
    )
    vecs = embeddings.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    hydrated = vecs.join(F.broadcast(cand), "doc_id")

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        qid = pdf["query_id"].iloc[0]
        v = np.array(pdf["vec"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(v, axis=1)
        norms[norms == 0.0] = 1.0
        sims = np.round((v @ v.T) / np.outer(norms, norms), round_to)
        rel = pdf["rel"].to_numpy(dtype=np.float64)
        n = len(pdf)
        selected: list[int] = []
        maxsim = np.zeros(n, dtype=np.float64)
        out = []
        for rank in range(1, min(k, n) + 1):
            mmr = lam * rel - (1.0 - lam) * maxsim
            best, best_val = -1, None
            for i in range(n):  # n is depth-bounded; doc_id ASC tie-break
                if i in selected:
                    continue
                if best_val is None or mmr[i] > best_val:
                    best, best_val = i, mmr[i]
            selected.append(best)
            out.append((qid, pdf["doc_id"].iloc[best], float(best_val), rank))
            maxsim = np.maximum(maxsim, sims[:, best])
        return pd.DataFrame(
            out, columns=["query_id", "doc_id", "mmr_score", "rank"]
        )

    out = hydrated.groupBy("query_id").applyInPandas(_greedy, _OUT_SCHEMA)
    return out.select(
        "query_id", "doc_id", F.round("mmr_score", round_to).alias("mmr_score"),
        "rank",
    )
