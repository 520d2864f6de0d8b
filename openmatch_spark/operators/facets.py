"""Faceted result counts — the aggregation panel beside a search-results
page ("source: src3 (12) · lang: en (40)").

For each query, count the hit docs per value of each requested attribute
column. Pure column algebra: hydrate the (bounded, queries × k) run
against the attribute columns with a broadcast join, unpivot the facet
columns with stack(), and one groupBy. Facet values are stringified so
heterogeneous attribute types share one output schema; NULL attribute
values count under the literal '(null)' bucket rather than vanishing —
a facet panel that silently drops rows misreports the hit count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

NULL_BUCKET = "(null)"


def facet_counts(
    run: DataFrame,
    docs: DataFrame,
    facet_cols: list[str],
) -> DataFrame:
    """(query_id, facet, value, n_docs) counts over the run's documents.

    run: (query_id, doc_id); docs: (doc_id, <attr> ...) — any column in
    facet_cols is counted per distinct stringified value."""
    if not facet_cols:
        raise ValueError("facet_cols must name at least one attribute column")
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    attrs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(NULL_BUCKET)).alias(c)
            for c in facet_cols
        ],
    )
    hydrated = attrs.join(F.broadcast(base), "doc_id")
    stack_expr = "stack({n}, {pairs}) as (facet, value)".format(
        n=len(facet_cols),
        pairs=", ".join(f"'{c}', {c}" for c in facet_cols),
    )
    return (
        hydrated.select("query_id", F.expr(stack_expr))
        .groupBy("query_id", "facet", "value")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
