"""Query-time aggregates beside the ranked run: total hit counts
(Lucene's TotalHitCountCollector / ES track_total_hits) and numeric
stats over the hit set (ES stats aggregation).

Both are bounded, single-shuffle plans: hit counting decodes only the
vocabulary-pruned postings (same scan as search) and never ranks or
hydrates; hit stats joins the (queries × k)-bounded run against the
attribute columns with a broadcast, one groupBy.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from openmatch_spark.index.load import BM25Index
from openmatch_spark.query.bm25_search import (
    _DISTRIBUTED_TOKENIZE_MIN_QUERIES,
    decoded_query_postings,
)


def count_hits(
    index: BM25Index,
    queries: DataFrame,
    distributed_threshold: int = _DISTRIBUTED_TOKENIZE_MIN_QUERIES,
) -> DataFrame:
    """(query_id, n_hits) — the number of live documents matching AT LEAST
    one query term (the default OR semantics a top-k search ranks over).
    Queries whose every term is out-of-vocabulary report 0, not absence —
    a count surface that silently drops queries misreads as an error.

    Cheaper than search: the same pruned postings decode, but no weights
    are aggregated, no window runs, and the docmap is never touched —
    count-distinct on (shard, doc_ord) per query is the whole job."""
    q = queries.select(F.col("query_id").cast("string").alias("query_id"))
    zero = q.distinct().select("query_id", F.lit(0).cast("long").alias("n_hits"))
    decoded, qterms = decoded_query_postings(index, queries, distributed_threshold)
    if decoded is None:
        return zero
    counted = (
        decoded.join(qterms, "term")
        .groupBy("query_id")
        .agg(F.countDistinct("shard", "doc_ord").alias("n_hits"))
    )
    return (
        zero.join(counted.withColumnRenamed("n_hits", "_n"), "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_hits"),
        )
    )


def hit_percentiles(
    run: DataFrame,
    docs: DataFrame,
    stat_col: str,
    percentiles: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """(query_id, p, value) — ES percentiles aggregation over the hit set,
    one row per (query, requested percentile). EXACT linear-interpolation
    percentiles (SQL PERCENTILE_CONT semantics), not ES's t-digest sketch:
    the hit set is (queries × k)-bounded so exactness is affordable, and
    it keeps the surface oracle-checkable. NULL attribute values are
    ignored (a query whose hits all lack the attribute reports NULL)."""
    if not percentiles:
        raise ValueError("percentiles must name at least one fraction")
    if any(not 0.0 <= p <= 1.0 for p in percentiles):
        raise ValueError(f"percentiles must be in [0, 1], got {percentiles}")
    ps = list(percentiles)
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    attrs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col(stat_col).cast("double").alias("_v"),
    )
    hydrated = attrs.join(F.broadcast(base), "doc_id")
    agg = hydrated.groupBy("query_id").agg(
        F.percentile("_v", F.array(*[F.lit(p) for p in ps])).alias("_q")
    )
    # percentile() of an all-NULL group is NULL (not an array) — coalesce
    # so the query still reports one NULL row per requested percentile
    null_arr = F.array(*[F.lit(None).cast("double") for _ in ps])
    pairs = F.arrays_zip(
        F.array(*[F.lit(float(p)) for p in ps]).alias("p"),
        F.coalesce(F.col("_q"), null_arr).alias("value"),
    )
    return agg.select(
        "query_id", F.explode(pairs).alias("_e")
    ).select("query_id", F.col("_e.p").alias("p"), F.col("_e.value").alias("value"))


def hit_stats(
    run: DataFrame,
    docs: DataFrame,
    stat_cols: list[str],
) -> DataFrame:
    """(query_id, facet, n, min, max, avg, sum) — ES stats aggregation over
    the hit set, one row per (query, numeric attribute). NULL attribute
    values are excluded from min/max/avg/sum but reported via n (count of
    NON-null values), matching ES. run: (query_id, doc_id)."""
    if not stat_cols:
        raise ValueError("stat_cols must name at least one attribute column")
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    attrs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        *[F.col(c).cast("double").alias(c) for c in stat_cols],
    )
    hydrated = attrs.join(F.broadcast(base), "doc_id")
    stack_expr = "stack({n}, {pairs}) as (facet, value)".format(
        n=len(stat_cols),
        pairs=", ".join(f"'{c}', {c}" for c in stat_cols),
    )
    return (
        hydrated.select("query_id", F.expr(stack_expr))
        .groupBy("query_id", "facet")
        .agg(
            F.count("value").cast("long").alias("n"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            F.avg("value").alias("avg"),
            F.sum("value").alias("sum"),
        )
    )


def hit_cardinality(
    run: DataFrame,
    docs: DataFrame,
    cols: list[str],
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """(query_id, facet, cardinality) — the ES `cardinality` aggregation
    over the hit set: per query, the number of DISTINCT values of each
    attribute among the hit docs, NULLs excluded (ES semantics: a missing
    field contributes nothing).

    approx=True swaps the exact distinct for approx_count_distinct
    (HyperLogLog++, relative error `rsd`) — the 100 TB path: the hit set
    here is queries × k bounded so exact is affordable, but the same
    surface over an unbounded candidate set (e.g. cardinality under a
    filter, no top-k) needs the sketch, and HLL merges map-side without
    holding the distinct set. Exact mode is the oracle-checked one.

    Same bounded plan as hit_stats: one broadcast hydrate of the run,
    stack() unpivot, one groupBy."""
    if not cols:
        raise ValueError("cols must name at least one attribute column")
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    attrs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        *[F.col(c).cast("string").alias(c) for c in cols],
    )
    hydrated = attrs.join(F.broadcast(base), "doc_id")
    stack_expr = "stack({n}, {pairs}) as (facet, value)".format(
        n=len(cols),
        pairs=", ".join(f"'{c}', {c}" for c in cols),
    )
    unpivoted = hydrated.select("query_id", F.expr(stack_expr)).where(
        F.col("value").isNotNull()
    )
    agg = (
        F.approx_count_distinct("value", rsd)
        if approx
        else F.countDistinct("value")
    )
    return unpivoted.groupBy("query_id", "facet").agg(
        agg.cast("long").alias("cardinality")
    )
