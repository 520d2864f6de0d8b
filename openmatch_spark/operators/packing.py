"""Sequence packing: group documents into fixed token-budget training rows.

Pretraining consumes fixed-length sequences, not documents; packing multiple
short documents per sequence (T5's "packing", GPT-style document concat)
recovers the throughput short docs would otherwise waste as padding. The
reference repo has no packing stage; this extends the engine's
training-data-pipeline family with the standard recipe.

Two strategies, same output shape `(doc_id, bucket, seq_id, n_tokens, pos)`
— one row per doc, `seq_id` the packed sequence it lands in (unique within
its bucket), `pos` its 1-based position inside that sequence:

- **greedy** (default; exact): within each bucket, docs in doc_id order
  fill a sequence until the next doc would exceed ``max_tokens``, then a
  new sequence starts; an oversized doc gets a sequence of its own. This
  is sequential by nature, so it runs as one ``applyInPandas`` pass per
  bucket — the legitimate Pandas-UDF case (same as sessionization), with
  O(group) streaming state.
- **offset** (zero-UDF): ``seq_id = 1 + floor(cumsum_before / max_tokens)``
  over the same ordering — pure window algebra that stays entirely in
  whole-stage codegen. Sequences may overshoot ``max_tokens`` by at most
  one document (the straddling doc is assigned to the bin where it
  starts); downstream truncation absorbs the tail. Use it when the packer
  feeds a tokenizer that truncates anyway.

Scale shape: docs are hash-bucketed (``n_buckets``) so no task ever sees
more than ~corpus/n_buckets rows; each bucket packs independently — the
standard distributed-packing decomposition. One shuffle on bucket (both
strategies), nothing driver-side. Determinism: bucket AND order derive only
from (doc_id, seed), never from partitioning.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.functions.hashing import md5_rank_col

__all__ = ["pack_sequences"]

_OUT_SCHEMA = (
    "doc_id string, bucket long, seq_id long, n_tokens long, pos long"
)


def pack_sequences(
    corpus: DataFrame,
    max_tokens: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "simple",
    strategy: str = "greedy",
    seed: int = 42,
) -> DataFrame:
    """Assign every doc to a (bucket, seq_id) packed training sequence.

    Token counts use the analyzer's token count
    (textstats.token_count_col); swap in bpe_token_count_col upstream by
    pre-computing an ``n_tokens`` column — if the input already has one,
    it is used as-is.
    """
    from openmatch_spark.operators.textstats import token_count_col

    if strategy not in ("greedy", "offset"):
        raise ValueError(f"unknown packing strategy: {strategy!r}")

    cols = [F.col(id_col).cast("string").alias("doc_id")]
    if "n_tokens" in corpus.columns:
        cols.append(F.col("n_tokens").cast("long").alias("n_tokens"))
    else:
        cols.append(
            F.coalesce(
                token_count_col(F.col(text_col), analyzer), F.lit(0)
            ).cast("long").alias("n_tokens")
        )
    # portable bucket: first 8 md5 hex chars mod n_buckets — reproducible in
    # SQL/python, independent of Spark's hash partitioner
    docs = corpus.select(
        *cols,
        (
            F.conv(F.substring(md5_rank_col(F.col(id_col), seed=seed), 1, 8), 16, 10)
            .cast("long") % n_buckets
        ).alias("bucket"),
    )

    w = Window.partitionBy("bucket").orderBy("doc_id")

    if strategy == "offset":
        before = F.coalesce(
            F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        seq = (F.lit(1) + F.floor(before / F.lit(max_tokens))).cast("long")
        return (
            docs.withColumn("seq_id", seq)
            .withColumn(
                "pos",
                F.row_number().over(
                    Window.partitionBy("bucket", "seq_id").orderBy("doc_id")
                ).cast("long"),
            )
            .select("doc_id", "bucket", "seq_id", "n_tokens", "pos")
        )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        seq_ids, poss = [], []
        seq_id, fill, pos = 0, 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if seq_id == 0 or fill + n > max_tokens:
                seq_id += 1
                fill = n
                pos = 1
            else:
                fill += n
                pos += 1
            seq_ids.append(seq_id)
            poss.append(pos)
        pdf = pdf.assign(seq_id=pd.array(seq_ids, dtype="int64"),
                         pos=pd.array(poss, dtype="int64"))
        return pdf[["doc_id", "bucket", "seq_id", "n_tokens", "pos"]]

    return docs.groupBy("bucket").applyInPandas(_pack, _OUT_SCHEMA)
