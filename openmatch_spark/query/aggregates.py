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


def hit_percentile_ranks(
    run: DataFrame,
    docs: DataFrame,
    stat_col: str,
    values: tuple[float, ...],
) -> DataFrame:
    """(query_id, value, percent) — the ES `percentile_ranks` aggregation
    (the inverse of percentiles): for each REQUESTED value, the share of
    observed attribute values ≤ it, as a percentage. EXACT definition
    100·|{v : v ≤ x}|/n rather than ES's t-digest interpolation — the hit
    set is (queries × k)-bounded so exactness is affordable and keeps the
    surface oracle-checkable; NULL attribute values are excluded from
    both numerator and denominator, and a query with no non-NULL values
    reports NULL (never a division error)."""
    if not values:
        raise ValueError("values must name at least one probe value")
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    attrs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col(stat_col).cast("double").alias("_v"),
    )
    hydrated = attrs.join(F.broadcast(base), "doc_id")
    aggs = [F.count("_v").alias("_n")] + [
        F.sum((F.col("_v") <= F.lit(float(x))).cast("long")).alias(f"_le_{i}")
        for i, x in enumerate(values)
    ]
    agg = hydrated.groupBy("query_id").agg(*aggs)
    pairs = F.arrays_zip(
        F.array(*[F.lit(float(x)) for x in values]).alias("value"),
        F.array(
            *[
                F.when(
                    F.col("_n") > 0,
                    F.lit(100.0) * F.col(f"_le_{i}") / F.col("_n"),
                )
                for i in range(len(values))
            ]
        ).alias("percent"),
    )
    return agg.select("query_id", F.explode(pairs).alias("_e")).select(
        "query_id",
        F.col("_e.value").alias("value"),
        F.col("_e.percent").alias("percent"),
    )


def top_metrics(
    run: DataFrame,
    docs: DataFrame,
    sort_col: str,
    metric_cols: list[str],
    ascending: bool = False,
    size: int = 1,
) -> DataFrame:
    """(query_id, pos, sort_value, <metric cols...>) — the ES
    `top_metrics` aggregation: the metric values carried by the docs at
    the top of an attribute sort, per query. NULL sort values sort last
    (they only appear if fewer than `size` docs carry the attribute —
    ES's nulls-last behavior); ties break on doc_id ASC so the surface
    is deterministic and oracle-replayable."""
    if not metric_cols:
        raise ValueError("metric_cols must name at least one metric column")
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    attrs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col(sort_col).cast("double").alias("sort_value"),
        *[F.col(c) for c in metric_cols],
    )
    hydrated = attrs.join(F.broadcast(base), "doc_id")
    from pyspark.sql import Window

    order = (
        F.asc_nulls_last("sort_value") if ascending
        else F.desc_nulls_last("sort_value")
    )
    w = Window.partitionBy("query_id").orderBy(order, F.asc("doc_id"))
    return (
        hydrated.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= size)
        .select("query_id", "pos", "sort_value", *metric_cols)
    )


def hit_extended_stats(
    run: DataFrame,
    docs: DataFrame,
    stat_cols: list[str],
    sigma: float = 2.0,
) -> DataFrame:
    """(query_id, facet, n, min, max, avg, sum, sum_of_squares, variance,
    variance_sampling, std_deviation, std_deviation_sampling, std_upper,
    std_lower) — the ES `extended_stats` aggregation over the hit set.
    Variance/std default to the POPULATION estimators (ES's `variance` /
    `std_deviation` fields) with the (n-1) sampling variants beside them;
    std bounds are avg ± sigma·std_deviation (ES default sigma=2).

    Population variance is computed two-pass (centered moments via a
    per-query window mean) rather than from raw power sums — at web-scale
    attribute magnitudes sum(x²) − n·mean² cancels catastrophically, and
    the hit set is (queries × k)-bounded so the second pass is free.
    n-1 variants and bounds are NULL where undefined (n<2 / n=0)."""
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
    unpivoted = hydrated.select("query_id", F.expr(stack_expr))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id", "facet")
    centered = unpivoted.withColumn("_mean", F.avg("value").over(w)).withColumn(
        "_d", F.col("value") - F.col("_mean")
    )
    n = F.count("value").cast("long")
    m2 = F.avg(F.col("_d") * F.col("_d"))  # population variance, NULL @ n=0
    agg = centered.groupBy("query_id", "facet").agg(
        n.alias("n"),
        F.min("value").alias("min"),
        F.max("value").alias("max"),
        F.avg("value").alias("avg"),
        F.sum("value").alias("sum"),
        F.sum(F.col("value") * F.col("value")).alias("sum_of_squares"),
        m2.alias("variance"),
    )
    var_samp = F.when(
        F.col("n") > 1,
        F.col("variance") * F.col("n") / (F.col("n") - F.lit(1)),
    )
    out = agg.withColumn("variance_sampling", var_samp).withColumn(
        "std_deviation", F.sqrt("variance")
    ).withColumn("std_deviation_sampling", F.sqrt("variance_sampling"))
    return out.select(
        "query_id", "facet", "n", "min", "max", "avg", "sum",
        "sum_of_squares", "variance", "variance_sampling",
        "std_deviation", "std_deviation_sampling",
        (F.col("avg") + F.lit(float(sigma)) * F.col("std_deviation")).alias("std_upper"),
        (F.col("avg") - F.lit(float(sigma)) * F.col("std_deviation")).alias("std_lower"),
    )


def hit_weighted_avg(
    run: DataFrame,
    docs: DataFrame,
    value_col: str,
    weight_col: str,
    value_missing: float | None = None,
    weight_missing: float | None = None,
) -> DataFrame:
    """(query_id, weighted_avg) — the ES `weighted_avg` aggregation over
    the hit set: Σ(value·weight)/Σ(weight). ES missing semantics: a hit
    whose value (or weight) is NULL is skipped entirely unless the
    corresponding `*_missing` default is configured, in which case the
    default is substituted. A query whose every hit was skipped (or whose
    weights sum to 0) reports NULL rather than vanishing."""
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    attrs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col(value_col).cast("double").alias("_v"),
        F.col(weight_col).cast("double").alias("_w"),
    )
    hydrated = attrs.join(F.broadcast(base), "doc_id")
    v = (
        F.coalesce(F.col("_v"), F.lit(float(value_missing)))
        if value_missing is not None
        else F.col("_v")
    )
    w = (
        F.coalesce(F.col("_w"), F.lit(float(weight_missing)))
        if weight_missing is not None
        else F.col("_w")
    )
    # a NULL on either side nulls the product AND must null the weight in
    # the denominator (the whole hit is skipped, not just its numerator)
    pair_w = F.when(v.isNotNull() & w.isNotNull(), w)
    agg = hydrated.groupBy("query_id").agg(
        F.sum(v * pair_w).alias("_num"), F.sum(pair_w).alias("_den")
    )
    return agg.select(
        "query_id",
        F.when(F.col("_den") != 0.0, F.col("_num") / F.col("_den")).alias(
            "weighted_avg"
        ),
    )


def hit_value_count(
    run: DataFrame,
    docs: DataFrame,
    cols: list[str],
) -> DataFrame:
    """(query_id, facet, value_count) — the ES `value_count` aggregation:
    per query, the number of NON-NULL values of each attribute across the
    hit set (scalar columns: one potential value per hit; ES would count
    each element of a multi-valued field, which for an array column here
    is F.size — document at the call site)."""
    if not cols:
        raise ValueError("cols must name at least one attribute column")
    return _count_unpivoted(run, docs, cols, missing=False, out="value_count")


def hit_missing(
    run: DataFrame,
    docs: DataFrame,
    cols: list[str],
) -> DataFrame:
    """(query_id, facet, n_missing) — the ES `missing` aggregation: per
    query, how many hit docs LACK the attribute (NULL). The complement of
    hit_value_count over the same hit set; a hit doc absent from `docs`
    entirely also counts as missing (left join)."""
    if not cols:
        raise ValueError("cols must name at least one attribute column")
    return _count_unpivoted(run, docs, cols, missing=True, out="n_missing")


def _count_unpivoted(
    run: DataFrame, docs: DataFrame, cols: list[str], missing: bool, out: str
) -> DataFrame:
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    attrs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        *[F.col(c).cast("string").alias(c) for c in cols],
    )
    # left join FROM the run so docs absent from the attribute table still
    # contribute (as missing) — the reverse of hit_stats' inner hydrate
    hydrated = base.join(F.broadcast(attrs), "doc_id", "left")
    stack_expr = "stack({n}, {pairs}) as (facet, value)".format(
        n=len(cols),
        pairs=", ".join(f"'{c}', {c}" for c in cols),
    )
    unpivoted = hydrated.select("query_id", F.expr(stack_expr))
    flag = F.col("value").isNull() if missing else F.col("value").isNotNull()
    return unpivoted.groupBy("query_id", "facet").agg(
        F.sum(flag.cast("long")).alias(out)
    )


def hit_filters(
    run: DataFrame,
    docs: DataFrame,
    filters: dict[str, "str | F.Column"],
) -> DataFrame:
    """(query_id, facet, n) — the ES `filters` aggregation over the hit
    set: per query, how many hits satisfy each NAMED predicate (a hit may
    match several; buckets are independent, not partitioning). Every named
    bucket is emitted for every query, zero-count included — ES always
    returns the full bucket list. Predicates are Columns or SQL strings
    over the doc attribute columns; NULL predicate results count as
    non-matching (SQL three-valued logic folded to false)."""
    if not filters:
        raise ValueError("filters must name at least one predicate")
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    hydrated = docs.join(F.broadcast(base), "doc_id")
    counts = [
        F.sum(
            F.coalesce(
                (F.expr(pred) if isinstance(pred, str) else pred).cast("boolean"),
                F.lit(False),
            ).cast("long")
        ).alias(name)
        for name, pred in filters.items()
    ]
    agg = hydrated.groupBy("query_id").agg(*counts)
    stack_expr = "stack({n}, {pairs}) as (facet, n)".format(
        n=len(filters),
        pairs=", ".join(f"'{name}', `{name}`" for name in filters),
    )
    return agg.select("query_id", F.expr(stack_expr))


def matrix_stats(
    run: DataFrame,
    docs: DataFrame,
    cols: list[str],
) -> DataFrame:
    """(query_id, field_x, field_y, n, mean_x, covariance, correlation,
    skewness_x, kurtosis_x) — the ES `matrix_stats` aggregation over the
    hit set, in long form: one row per (query, ordered field pair)
    including the diagonal. ES row-drop semantics: a hit with a NULL in
    ANY requested field is excluded from the whole matrix (n is therefore
    identical on every row of a query's matrix).

    Estimator choices (documented because engines disagree): covariance is
    POPULATION covariance; correlation is Pearson (NULL when either field
    is constant, never NaN); skewness/kurtosis are the population moment
    ratios g1 = m3/m2^1.5 and EXCESS g2 = m4/m2² − 3, computed two-pass
    from centered moments (cancellation-safe), NULL when m2 = 0.

    Plan: one broadcast hydrate, a per-query window mean per field, one
    groupBy over (queries × k)-bounded rows — the pair expansion happens
    in the projection (len(cols)² columns), not by exploding rows."""
    if len(cols) < 2:
        raise ValueError("matrix_stats needs at least two columns")
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    attrs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        *[F.col(c).cast("double").alias(c) for c in cols],
    )
    hydrated = attrs.join(F.broadcast(base), "doc_id")
    keep = None
    for c in cols:
        cond = F.col(c).isNotNull()
        keep = cond if keep is None else (keep & cond)
    rows = hydrated.where(keep)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id")
    for c in cols:
        rows = rows.withColumn(f"_d_{c}", F.col(c) - F.avg(c).over(w))
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in cols:
        d = F.col(f"_d_{c}")
        aggs += [
            F.avg(c).alias(f"_mean_{c}"),
            F.avg(d * d).alias(f"_m2_{c}"),
            F.avg(d * d * d).alias(f"_m3_{c}"),
            F.avg(d * d * d * d).alias(f"_m4_{c}"),
        ]
    for i, cx in enumerate(cols):
        for cy in cols[i + 1:]:
            aggs.append(
                F.avg(F.col(f"_d_{cx}") * F.col(f"_d_{cy}")).alias(f"_cov_{cx}_{cy}")
            )
    agg = rows.groupBy("query_id").agg(*aggs)

    def _cov(cx: str, cy: str) -> F.Column:
        if cx == cy:
            return F.col(f"_m2_{cx}")
        a, b = (cx, cy) if cols.index(cx) < cols.index(cy) else (cy, cx)
        return F.col(f"_cov_{a}_{b}")

    pair_structs = []
    for cx in cols:
        m2x = F.col(f"_m2_{cx}")
        nz = (m2x > 0)
        skew = F.when(nz, F.col(f"_m3_{cx}") / F.pow(m2x, F.lit(1.5)))
        kurt = F.when(nz, F.col(f"_m4_{cx}") / (m2x * m2x) - F.lit(3.0))
        for cy in cols:
            m2y = F.col(f"_m2_{cy}")
            corr = F.when(
                nz & (m2y > 0), _cov(cx, cy) / F.sqrt(m2x * m2y)
            )
            pair_structs.append(
                F.struct(
                    F.lit(cx).alias("field_x"),
                    F.lit(cy).alias("field_y"),
                    _cov(cx, cy).alias("covariance"),
                    corr.alias("correlation"),
                    F.col(f"_mean_{cx}").alias("mean_x"),
                    skew.alias("skewness_x"),
                    kurt.alias("kurtosis_x"),
                )
            )
    return (
        agg.select(
            "query_id", "n", F.explode(F.array(*pair_structs)).alias("_p")
        )
        .select(
            "query_id",
            F.col("_p.field_x").alias("field_x"),
            F.col("_p.field_y").alias("field_y"),
            "n",
            F.col("_p.mean_x").alias("mean_x"),
            F.col("_p.covariance").alias("covariance"),
            F.col("_p.correlation").alias("correlation"),
            F.col("_p.skewness_x").alias("skewness_x"),
            F.col("_p.kurtosis_x").alias("kurtosis_x"),
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


def hit_string_stats(
    run: DataFrame,
    docs: DataFrame,
    text_col: str,
) -> DataFrame:
    """(query_id, n, min_length, max_length, avg_length, entropy) — the
    ES `string_stats` aggregation (with show_distribution's entropy) over
    the hit set's string attribute. Lengths are codepoint counts; entropy
    is the Shannon entropy (log base 2, ES's convention) of the CHARACTER
    distribution pooled across all of the query's hit values. NULL values
    are excluded everywhere; a query whose hits are all-NULL reports n=0
    with NULL stats (ES omits the agg — one schema keeps it hashable).

    Plan: one broadcast hydration of the (queries × k)-bounded run, a
    length agg, and a char-explode agg over the same bounded frame —
    strings are doc-bounded so the explode is hit_chars-sized, never
    corpus-sized. All JVM (split/explode/log2), no UDF."""
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    attrs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col(text_col).cast("string").alias("_s"),
    )
    hydrated = attrs.join(F.broadcast(base), "doc_id").where(
        F.col("_s").isNotNull()
    )
    lens = (
        base.select("query_id")
        .distinct()
        .join(
            hydrated.groupBy("query_id").agg(
                F.count("_s").cast("long").alias("n"),
                F.min(F.length("_s")).cast("long").alias("min_length"),
                F.max(F.length("_s")).cast("long").alias("max_length"),
                F.avg(F.length("_s")).alias("avg_length"),
            ),
            "query_id",
            "left",
        )
        .withColumn("n", F.coalesce("n", F.lit(0).cast("long")))
    )
    chars = (
        hydrated.select(
            "query_id",
            F.explode(F.split("_s", "")).alias("_c"),
        )
        .where(F.col("_c") != "")
        .groupBy("query_id", "_c")
        .agg(F.count(F.lit(1)).cast("double").alias("_cnt"))
    )
    from pyspark.sql import Window

    tot = Window.partitionBy("query_id")
    ent = (
        chars.withColumn("_p", F.col("_cnt") / F.sum("_cnt").over(tot))
        .groupBy("query_id")
        .agg((-F.sum(F.col("_p") * F.log2("_p"))).alias("entropy"))
    )
    return lens.join(ent, "query_id", "left").select(
        "query_id", "n", "min_length", "max_length", "avg_length", "entropy"
    )


def hit_median_absolute_deviation(
    run: DataFrame,
    docs: DataFrame,
    stat_col: str,
) -> DataFrame:
    """(query_id, mad) — the ES `median_absolute_deviation` aggregation:
    median(|x - median(x)|) over the hit set's attribute. EXACT medians
    (linear-interpolated `percentile(0.5)`, the same definition as
    DuckDB's `median`) rather than ES's t-digest approximation — the hit
    set is (queries × k)-bounded so two exact passes are free and keep
    the surface oracle-checkable. NULLs excluded; all-NULL → NULL."""
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    attrs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col(stat_col).cast("double").alias("_v"),
    )
    hydrated = attrs.join(F.broadcast(base), "doc_id")
    med = hydrated.groupBy("query_id").agg(
        F.percentile("_v", F.lit(0.5)).alias("_med")
    )
    return (
        hydrated.join(F.broadcast(med), "query_id")
        .groupBy("query_id")
        .agg(
            F.percentile(F.abs(F.col("_v") - F.col("_med")), F.lit(0.5))
            .alias("mad")
        )
    )


def hit_boxplot(
    run: DataFrame,
    docs: DataFrame,
    stat_col: str,
) -> DataFrame:
    """(query_id, min, max, q1, q2, q3, lower, upper) — the ES `boxplot`
    aggregation over the hit set's attribute. q1/q2/q3 are exact
    linear-interpolated quartiles (ES uses t-digest; exact keeps the
    oracle bit-comparable). lower/upper are the Tukey whiskers ES
    reports: the smallest observation ≥ q1 − 1.5·IQR and the largest
    observation ≤ q3 + 1.5·IQR (clamped to actual data points, never the
    fence itself). NULLs excluded. Two bounded passes: quartiles per
    query, then a broadcast join back for the conditional min/max."""
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    attrs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col(stat_col).cast("double").alias("_v"),
    )
    hydrated = attrs.join(F.broadcast(base), "doc_id")
    q = hydrated.groupBy("query_id").agg(
        F.min("_v").alias("min"),
        F.max("_v").alias("max"),
        F.percentile("_v", F.lit(0.25)).alias("q1"),
        F.percentile("_v", F.lit(0.5)).alias("q2"),
        F.percentile("_v", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    fenced = hydrated.join(F.broadcast(q), "query_id")
    return (
        fenced.groupBy("query_id")
        .agg(
            F.first("min").alias("min"),
            F.first("max").alias("max"),
            F.first("q1").alias("q1"),
            F.first("q2").alias("q2"),
            F.first("q3").alias("q3"),
            F.min(
                F.when(
                    F.col("_v") >= F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")),
                    F.col("_v"),
                )
            ).alias("lower"),
            F.max(
                F.when(
                    F.col("_v") <= F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")),
                    F.col("_v"),
                )
            ).alias("upper"),
        )
    )


_T_TEST_MODES = ("paired", "homoscedastic", "heteroscedastic")


def hit_t_test(
    run: DataFrame,
    docs: DataFrame,
    col_a: str,
    col_b: str,
    mode: str = "heteroscedastic",
) -> DataFrame:
    """(query_id, n_a, n_b, t_stat, df) — the ES `t_test` metric
    aggregation (two-field form) over the hit set: Student's t between
    the two numeric attributes.

    Modes (ES names):
      paired           both fields on the same hit; rows with EITHER
                       side NULL are dropped (ES requires no missing
                       values for paired); t = mean(d)/(sd(d)/sqrt(n)),
                       df = n-1, d = a-b. n_a == n_b == n.
      homoscedastic    unpaired, pooled sample variance, df = n_a+n_b-2.
      heteroscedastic  unpaired Welch (ES default), Welch-Satterthwaite
                       df. Unpaired modes use each field's non-NULL
                       values independently.

    Deviation from ES (documented): ES reports the p-value; the
    incomplete-beta CDF behind it is not expressible in column algebra
    or the SQL oracle, so this surface reports the t statistic and
    degrees of freedom instead (p = 2 * (1 - T_cdf(|t|, df)) for anyone
    who needs it driver-side). Degenerate inputs (n < 2 per side, zero
    variance) yield NULL t_stat rather than an error.

    Plan: one broadcast hydration of the (queries x k)-bounded run and
    one groupBy — sample variances via var_samp, everything JVM-side.
    """
    if mode not in _T_TEST_MODES:
        raise ValueError(f"mode must be one of {_T_TEST_MODES}, got {mode!r}")
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    attrs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col(col_a).cast("double").alias("_a"),
        F.col(col_b).cast("double").alias("_b"),
    )
    hyd = attrs.join(F.broadcast(base), "doc_id")
    if mode == "paired":
        d = F.when(
            F.col("_a").isNotNull() & F.col("_b").isNotNull(),
            F.col("_a") - F.col("_b"),
        )
        agg = hyd.groupBy("query_id").agg(
            F.count(d).cast("long").alias("n_a"),
            F.avg(d).alias("_m"),
            F.var_samp(d).alias("_v"),
        )
        t = F.when(
            (F.col("n_a") >= 2) & (F.col("_v") > 0),
            F.col("_m") / F.sqrt(F.col("_v") / F.col("n_a")),
        )
        return agg.select(
            "query_id",
            "n_a",
            F.col("n_a").alias("n_b"),
            t.alias("t_stat"),
            F.when(F.col("n_a") >= 2, (F.col("n_a") - 1).cast("double"))
            .alias("df"),
        )
    agg = hyd.groupBy("query_id").agg(
        F.count("_a").cast("long").alias("n_a"),
        F.count("_b").cast("long").alias("n_b"),
        F.avg("_a").alias("_ma"),
        F.avg("_b").alias("_mb"),
        F.var_samp("_a").alias("_va"),
        F.var_samp("_b").alias("_vb"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    va, vb = F.col("_va"), F.col("_vb")
    ok = (na >= 2) & (nb >= 2) & va.isNotNull() & vb.isNotNull()
    if mode == "homoscedastic":
        sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
        denom = F.sqrt(sp2 * (1.0 / na + 1.0 / nb))
        t = F.when(ok & (denom > 0), (F.col("_ma") - F.col("_mb")) / denom)
        df = F.when(ok, (na + nb - 2).cast("double"))
    else:  # heteroscedastic / Welch
        se2 = va / na + vb / nb
        t = F.when(
            ok & (se2 > 0), (F.col("_ma") - F.col("_mb")) / F.sqrt(se2)
        )
        df = F.when(
            ok & (se2 > 0),
            (se2 * se2)
            / (
                (va / na) * (va / na) / (na - 1)
                + (vb / nb) * (vb / nb) / (nb - 1)
            ),
        )
    return agg.select(
        "query_id", "n_a", "n_b", t.alias("t_stat"), df.alias("df")
    )
