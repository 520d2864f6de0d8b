"""Batch model inference plumbing (SURVEY §2.10 X1-X4): the canonical Spark
pattern for the reference's encode/rerank forwards.

The reference runs DataLoader batches through a per-process model with
rank-sliced sharding and pickle exchange (dense_retriever.py:67-129,
reranker.py:99-154). The Spark shape is an iterator mapInPandas UDF that
loads the model ONCE per executor python worker (not per batch), consumes
Arrow batches, and emits vectors/scores — partitioning replaces manual
sharding, shuffle replaces the file exchange.

No torch/transformers live in this sandbox, so the default model_loader is a
deterministic hashing "encoder" stub (clearly marked); the plumbing — schema,
batch shape, per-worker caching, broadcast of model config — is real and
tested. Swapping in a HF model is a one-function change:

    def loader():
        from transformers import AutoModel, AutoTokenizer
        ...
        return lambda texts: model(**tok(texts, ...)).last_hidden_state...
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_MODEL_CACHE: dict[str, object] = {}


def _stub_encoder_loader(dim: int = 16):
    """Deterministic fake encoder: md5-seeded unit vectors per text."""

    def load():
        import hashlib

        def encode(texts: list[str]) -> np.ndarray:
            out = np.zeros((len(texts), dim), dtype=np.float32)
            for i, t in enumerate(texts):
                h = hashlib.md5((t or "").encode()).digest()
                rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
                v = rng.standard_normal(dim).astype(np.float32)
                out[i] = v / (np.linalg.norm(v) or 1.0)
            return out

        return encode

    return load


def encode_texts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 16,
    model_loader: Callable | None = None,
    model_key: str = "stub-encoder",
    batch_size: int = 512,
) -> DataFrame:
    """(id, embedding array<float>) via iterator-style mapInPandas (X3).

    model_loader() runs at most once per executor worker (module-level
    cache keyed by model_key) — the per-executor model residency pattern.
    """
    loader = model_loader or _stub_encoder_loader(dim)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if model_key not in _MODEL_CACHE:
            _MODEL_CACHE[model_key] = loader()
        model = _MODEL_CACHE[model_key]
        for pdf in batches:
            for s in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[s : s + batch_size]
                vecs = model(chunk[text_col].tolist())
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].astype(str),
                        "embedding": [v.tolist() for v in vecs],
                    }
                )

    out_schema = f"{id_col} string, embedding array<float>"
    return df.select(F.col(id_col).cast("string"), F.col(text_col)).mapInPandas(
        run, out_schema
    )


def encode_and_index_dense(
    corpus: DataFrame,
    out_path: str,
    num_shards: int = 8,
    **encode_kw,
) -> None:
    """Corpus -> embedding shards on disk (S12 embedding-shard sink):
    the reference's spill-every-max_inmem_docs pickle files become a
    shard-partitioned parquet table (Spark handles the spill)."""
    emb = encode_texts(corpus, **encode_kw)
    emb.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(emb.columns[0])), F.lit(num_shards)).cast("int")
    ).write.mode("overwrite").partitionBy("shard").parquet(out_path)


def write_train_groups(groups: DataFrame, out_dir: str, shard_size: int = 45000) -> None:
    """Train-group JSONL sink (S13, build_hn.py:73-94 semantics): rows
    (query_id, positives, negatives) as sharded JSONL, ~shard_size rows per
    file via repartition."""
    n = max(1, (groups.count() + shard_size - 1) // shard_size)
    groups.repartition(n).write.mode("overwrite").json(out_dir)
