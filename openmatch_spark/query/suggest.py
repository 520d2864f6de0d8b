"""Term prefix suggestion (autocomplete) over the index dictionary.

For each prefix, the top-k vocabulary terms by document frequency — the
suggester every search box needs, answered entirely from the dictionary
table (never the postings). Prefixes arrive as literals, so each scan
carries a StringStartsWith pushed filter (parquet row-group min/max stats
skip non-matching groups); the per-prefix top-k is a window over the
already-filtered slice. The loop is over PREFIXES (a handful), not data —
each iteration contributes one branch to a single unioned plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.index.load import BM25Index


def suggest_terms(index: BM25Index, prefixes: list[str], k: int = 10) -> DataFrame:
    """(prefix, term, df, rank): top-k terms per prefix by df DESC, term ASC.

    Empty/None prefixes are rejected — an empty prefix would rank the whole
    vocabulary, which is a corpus-stats query (term_stats), not a suggest."""
    if not prefixes or any(not p for p in prefixes):
        raise ValueError("prefixes must be non-empty strings")
    out = None
    for p in sorted(set(prefixes)):
        sliced = (
            index.dictionary.where(F.col("term").startswith(p))
            .select(
                F.lit(p).alias("prefix"),
                "term",
                F.col("df").cast("long").alias("df"),
            )
        )
        out = sliced if out is None else out.unionByName(sliced)
    w = Window.partitionBy("prefix").orderBy(F.desc("df"), F.asc("term"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("prefix", "term", "df", "rank")
    )
