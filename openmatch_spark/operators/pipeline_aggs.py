"""Elasticsearch pipeline aggregations over an already-aggregated bucket
frame: derivative, cumulative_sum, moving window functions, serial
differencing, bucket_script, bucket_selector, and bucket_sort.

ES runs these on the reduce node AFTER the shard aggregations merge
(search aggs docs; reference exposes no analog — this is engine-specific
parity territory, same as the facets family). Here the input is whatever
a facets/date_histogram call produced: a bucket frame
(group_cols..., order_col, value_col) that is parent-cardinality bounded
(queries × buckets), so every operator below is pure window algebra over
one hash partitioning on the parent key — a single bounded shuffle, no
corpus pass, no UDF. At 100 TB the bucket frame is still tiny (it is
post-aggregation), which is exactly why ES can afford to run these
coordinator-side; we keep them distributed anyway so a
million-parent-bucket frame (e.g. per-host histograms over the crawl)
never funnels through the driver.

Ordering contract: buckets are sequenced by order_col ASC within the
parent partition (ES histogram buckets are inherently key-ordered). Gap
policy is ES's skip-less default: the window walks the buckets that
EXIST (sparse histograms — the facets family emits no empty buckets),
matching gap_policy=skip with the sparse frame.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

_MOVING_FNS = {
    "avg": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def _seq_window(group_cols: list[str], order_col: str) -> Window:
    return Window.partitionBy(*group_cols).orderBy(F.col(order_col).asc())


def derivative(
    buckets: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str],
    out_col: str = "derivative",
) -> DataFrame:
    """ES `derivative`: value minus the previous bucket's value within the
    parent. The first bucket of each parent has no predecessor and reports
    NULL (ES omits the field there; a NULL column keeps one schema)."""
    w = _seq_window(group_cols, order_col)
    v = F.col(value_col).cast("double")
    return buckets.withColumn(out_col, v - F.lag(v, 1).over(w))


def cumulative_sum(
    buckets: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str],
    out_col: str = "cumulative_sum",
) -> DataFrame:
    """ES `cumulative_sum`: running total of value over the bucket
    sequence, inclusive of the current bucket."""
    w = _seq_window(group_cols, order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return buckets.withColumn(
        out_col, F.sum(F.col(value_col).cast("double")).over(w)
    )


def serial_diff(
    buckets: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str],
    lag: int = 1,
    out_col: str = "serial_diff",
) -> DataFrame:
    """ES `serial_diff`: value minus the value `lag` buckets back (lag=1
    is the derivative; seasonal lags expose period-over-period change).
    Buckets without a lag-back predecessor report NULL."""
    if lag <= 0:
        raise ValueError(f"lag must be positive, got {lag}")
    w = _seq_window(group_cols, order_col)
    v = F.col(value_col).cast("double")
    return buckets.withColumn(out_col, v - F.lag(v, lag).over(w))


def moving_fn(
    buckets: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str],
    fn: str = "avg",
    window: int = 5,
    shift: int = 0,
    out_col: str = "moving_fn",
) -> DataFrame:
    """ES `moving_fn`: apply an aggregate over a sliding window of
    buckets. ES window semantics: with shift=0 the window covers the
    `window` buckets STRICTLY BEFORE the current one (rows
    [i-window, i-1]); shift slides it right, so shift=1 includes the
    current bucket ([i-window+1, i]). Buckets whose window is entirely
    before the partition start report NULL (ES returns null there too).

    fn: one of avg/sum/min/max (MovingFunctions.unweightedAvg etc.).
    """
    if fn not in _MOVING_FNS:
        raise ValueError(f"fn must be one of {sorted(_MOVING_FNS)}, got {fn!r}")
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    w = _seq_window(group_cols, order_col).rowsBetween(
        -window + shift, shift - 1
    )
    return buckets.withColumn(
        out_col, _MOVING_FNS[fn](F.col(value_col).cast("double")).over(w)
    )


def bucket_script(
    buckets: DataFrame, out_col: str, expr: str | Column
) -> DataFrame:
    """ES `bucket_script`: a derived per-bucket metric computed from the
    bucket's own columns (e.g. a ratio of two sub-aggregations). The
    "script" is a SQL expression string (or a ready Column) — it stays
    inside codegen instead of ES's interpreted Painless."""
    col = F.expr(expr) if isinstance(expr, str) else expr
    return buckets.withColumn(out_col, col)


def bucket_selector(buckets: DataFrame, predicate: str | Column) -> DataFrame:
    """ES `bucket_selector`: drop buckets failing a predicate over their
    own metrics. Runs AFTER metric pipelines by construction (it is a
    filter on the frame you already built), matching ES's pipeline
    ordering."""
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    return buckets.where(cond)


def bucket_sort(
    buckets: DataFrame,
    group_cols: list[str],
    sort: list[tuple[str, str]],
    size: int | None = None,
    from_: int = 0,
    pos_col: str | None = None,
) -> DataFrame:
    """ES `bucket_sort`: reorder the parent's buckets by metric columns
    and keep a [from_, from_+size) slice. sort: [(col, 'asc'|'desc'),
    ...]; ties broken by order of remaining columns only — callers
    wanting determinism include a unique column last (the contract
    entries do). pos_col, if named, exposes the 1-based post-sort
    position (handy for paging assertions and the oracle hash)."""
    if not sort:
        raise ValueError("sort must name at least one (column, direction)")
    if from_ < 0:
        raise ValueError(f"from_ must be >= 0, got {from_}")
    order = []
    for col, direction in sort:
        d = direction.lower()
        if d not in ("asc", "desc"):
            raise ValueError(f"direction must be asc|desc, got {direction!r}")
        order.append(F.col(col).asc() if d == "asc" else F.col(col).desc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    pos = pos_col or "_pos"
    out = buckets.withColumn(pos, F.row_number().over(w))
    lo = F.col(pos) > from_
    hi = F.col(pos) <= from_ + size if size is not None else F.lit(True)
    out = out.where(lo & hi)
    return out if pos_col else out.drop(pos)


def sibling_bucket_agg(
    buckets: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str],
    fn: str = "stats",
) -> DataFrame:
    """ES sibling pipeline aggregations (`avg_bucket` / `min_bucket` /
    `max_bucket` / `sum_bucket` / `stats_bucket`): collapse a parent's
    bucket metrics into ONE row per parent.

    fn='stats' emits (group_cols..., n, min, max, avg, sum); the scalar
    fns emit (group_cols..., value) plus — for min/max — `keys`, the
    ascending comma-joined list of order_col values attaining the
    extremum (ES min_bucket/max_bucket report the bucket keys alongside
    the value; a joined string keeps one flat, hashable schema).

    Same scale story as the rest of the module: one bounded groupBy over
    the post-aggregation bucket frame."""
    if fn not in ("avg", "min", "max", "sum", "stats"):
        raise ValueError(f"fn must be avg|min|max|sum|stats, got {fn!r}")
    v = F.col(value_col).cast("double")
    g = buckets.groupBy(*group_cols)
    if fn == "stats":
        return g.agg(
            F.count(v).cast("long").alias("n"),
            F.min(v).alias("min"),
            F.max(v).alias("max"),
            F.avg(v).alias("avg"),
            F.sum(v).alias("sum"),
        )
    if fn in ("avg", "sum"):
        agg = F.avg(v) if fn == "avg" else F.sum(v)
        return g.agg(agg.alias("value"))
    ext = F.min(v) if fn == "min" else F.max(v)
    # keys of the extremal buckets: collect (value, key) pairs in the same
    # agg pass, then filter to the pairs attaining the extremum — one
    # bounded groupBy, no second join (the frame is post-aggregation)
    agg = g.agg(
        ext.alias("value"),
        F.collect_list(
            F.struct(
                v.alias("v"), F.col(order_col).cast("string").alias("k")
            )
        ).alias("_pairs"),
    )
    keys = F.array_join(
        F.array_sort(
            F.transform(
                F.filter(F.col("_pairs"), lambda p: p["v"] == F.col("value")),
                lambda p: p["k"],
            )
        ),
        ",",
    )
    return agg.withColumn("keys", keys).drop("_pairs")


def percentiles_bucket(
    buckets: DataFrame,
    value_col: str,
    group_cols: list[str],
    percents: tuple[float, ...] = (25.0, 50.0, 75.0),
) -> DataFrame:
    """ES `percentiles_bucket`: exact percentiles of a sibling metric
    across the parent's buckets, one (group_cols..., percent, value) row
    per requested percent. ES documents this one as EXACT (unlike the
    t-digest `percentiles` metric agg) with linear interpolation between
    closest ranks — Spark's `percentile` (and DuckDB's quantile_cont)
    use the same definition, so the oracle is bit-comparable."""
    if not percents:
        raise ValueError("percents must name at least one percent")
    if any(not 0.0 <= p <= 100.0 for p in percents):
        raise ValueError(f"percents must be in [0, 100], got {percents}")
    v = F.col(value_col).cast("double")
    agg = buckets.groupBy(*group_cols).agg(
        F.percentile(v, F.array(*[F.lit(p / 100.0) for p in percents]))
        .alias("_q")
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(float(p)) for p in percents]).alias("percent"),
        F.col("_q").alias("value"),
    )
    return agg.select(*group_cols, F.explode(pairs).alias("_e")).select(
        *group_cols,
        F.col("_e.percent").alias("percent"),
        F.col("_e.value").alias("value"),
    )


_NORMALIZE_METHODS = (
    "rescale_0_1", "rescale_0_100", "percent_of_sum", "mean", "z-score",
    "softmax",
)


def normalize_buckets(
    buckets: DataFrame,
    value_col: str,
    group_cols: list[str],
    method: str = "percent_of_sum",
    out_col: str = "normalized",
) -> DataFrame:
    """ES `normalize` pipeline aggregation: rescale a bucket metric
    within its parent. Methods (ES search-aggregations-pipeline-normalize
    docs, same formulas):

      rescale_0_1      (x - min) / (max - min)
      rescale_0_100    100 * (x - min) / (max - min)
      percent_of_sum   x / sum(x)
      mean             (x - avg) / (max - min)
      z-score          (x - avg) / population_stddev
      softmax          e^x / sum(e^x)

    Degenerate parents (max == min, sum == 0, stddev == 0) produce NULL
    rather than a division error — ES skips the value there too. One
    unbounded window per parent (the frame is post-aggregation bounded);
    no ordering needed, so no sort in the exchange."""
    if method not in _NORMALIZE_METHODS:
        raise ValueError(
            f"method must be one of {_NORMALIZE_METHODS}, got {method!r}"
        )
    w = Window.partitionBy(*group_cols)
    x = F.col(value_col).cast("double")
    rng = F.max(x).over(w) - F.min(x).over(w)
    rng = F.when(rng != 0.0, rng)  # NULL-out degenerate spans
    if method == "rescale_0_1":
        col = (x - F.min(x).over(w)) / rng
    elif method == "rescale_0_100":
        col = F.lit(100.0) * (x - F.min(x).over(w)) / rng
    elif method == "percent_of_sum":
        s = F.sum(x).over(w)
        col = x / F.when(s != 0.0, s)
    elif method == "mean":
        col = (x - F.avg(x).over(w)) / rng
    elif method == "z-score":
        sd = F.stddev_pop(x).over(w)
        col = (x - F.avg(x).over(w)) / F.when(sd != 0.0, sd)
    else:  # softmax
        col = F.exp(x) / F.sum(F.exp(x)).over(w)
    return buckets.withColumn(out_col, col)


_FIXED_UNIT_SECONDS = {
    "second": 1.0,
    "minute": 60.0,
    "hour": 3600.0,
    "day": 86400.0,
    "week": 604800.0,
}
_CALENDAR_UNIT_MONTHS = {"month": 1.0, "quarter": 3.0, "year": 12.0}
_CALENDAR_INTERVALS = {
    "day": "1 day", "week": "1 week", "month": "1 month",
    "quarter": "3 month", "year": "1 year", "hour": "1 hour",
    "minute": "1 minute", "second": "1 second",
}


def bucket_rate(
    buckets: DataFrame,
    value_col: str,
    bucket_col: str,
    calendar_interval: str,
    unit: str,
    out_col: str = "rate",
) -> DataFrame:
    """ES `rate` aggregation inside a date_histogram: re-express each
    bucket's metric as a per-`unit` rate, dividing by the bucket's TRUE
    calendar span in that unit (a January bucket divides a per-day rate
    by 31, February by 28/29 — ES semantics exactly).

    `bucket_col` holds the bucket START as 'yyyy-MM-dd HH:mm:ss' text
    (the date_histogram_facets key); the bucket end is start + one
    `calendar_interval`. Fixed-length units (second..week) divide the
    actual span in seconds; calendar units (month/quarter/year) divide
    the span in months — both exact for calendar buckets. ES requires
    unit <= interval; spans shorter than the unit are still well-defined
    (fractional divisor) so that restriction is not enforced here.

    One projection over the post-aggregation bucket frame — no shuffle,
    no UDF."""
    if calendar_interval not in _CALENDAR_INTERVALS:
        raise ValueError(
            f"calendar_interval must be one of "
            f"{sorted(_CALENDAR_INTERVALS)}, got {calendar_interval!r}"
        )
    if unit not in _FIXED_UNIT_SECONDS and unit not in _CALENDAR_UNIT_MONTHS:
        raise ValueError(
            f"unit must be one of "
            f"{sorted(_FIXED_UNIT_SECONDS) + sorted(_CALENDAR_UNIT_MONTHS)},"
            f" got {unit!r}"
        )
    start = F.to_timestamp(F.col(bucket_col))
    end = start + F.expr(
        f"INTERVAL {_CALENDAR_INTERVALS[calendar_interval]}"
    )
    if unit in _FIXED_UNIT_SECONDS:
        divisor = (end.cast("double") - start.cast("double")) / F.lit(
            _FIXED_UNIT_SECONDS[unit]
        )
    else:
        divisor = F.months_between(end, start) / F.lit(
            _CALENDAR_UNIT_MONTHS[unit]
        )
    return buckets.withColumn(
        out_col, F.col(value_col).cast("double") / divisor
    )


def moving_percentiles(
    buckets: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str],
    window: int,
    percents: tuple[float, ...] = (50.0,),
    shift: int = 0,
    out_prefix: str = "p",
) -> DataFrame:
    """ES `moving_percentiles`: percentiles of a bucket metric over the
    moving_fn sliding frame — with shift=0 the window is the `window`
    buckets STRICTLY BEFORE the current one, shift slides right, and a
    bucket whose frame is empty reports NULL (ES semantics throughout).
    EXACT linear-interpolated percentiles (ES wraps the t-digest; the
    frame is window-bounded so exact is free and oracle-comparable).
    One output column per requested percent: `<out_prefix><percent:g>`.
    One window pass per percent over the post-aggregation frame — no
    shuffle beyond the one ordering exchange Spark shares across them."""
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    if not percents:
        raise ValueError("percents must name at least one percent")
    if any(not 0.0 <= p <= 100.0 for p in percents):
        raise ValueError(f"percents must be in [0, 100], got {percents}")
    w = _seq_window(group_cols, order_col).rowsBetween(
        -window + shift, shift - 1
    )
    out = buckets
    for p in percents:
        out = out.withColumn(
            f"{out_prefix}{p:g}",
            F.percentile(
                F.col(value_col).cast("double"), F.lit(p / 100.0)
            ).over(w),
        )
    return out


def change_point(
    buckets: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str],
    min_segment: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """ES `change_point` aggregation, the documented step-change subset:
    find the split of each parent's ordered bucket series that maximally
    reduces the two-segment sum of squared errors, and classify:

      type = 'indeterminable'  fewer than 2 * min_segment buckets (ES
                               returns the same verdict on short series)
             'stationary'      best reduction ratio < threshold, or the
                               series is constant (zero total SSE)
             'step_change'     otherwise; change_bucket is the FIRST
                               bucket of the new regime

    reduction_ratio = (SSE_total - SSE_left - SSE_right) / SSE_total in
    [0, 1]; 1.0 means two perfectly flat segments. ES's spike/dip/trend
    sub-detectors and its ML-derived p-value are documented out — this
    is the deterministic, oracle-replicable core.

    Plan: prefix sums of x and x^2 over one ordered window give every
    candidate split's segment SSEs in closed form — pure projection
    algebra, no UDF, one exchange for the ordering; the argmax is one
    more window. Output: one row per group
    (group_cols..., type, change_bucket, left_mean, right_mean,
    reduction_ratio)."""
    if min_segment < 1:
        raise ValueError(f"min_segment must be >= 1, got {min_segment}")
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    x = F.col(value_col).cast("double")
    w_ord = (
        Window.partitionBy(*group_cols)
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_grp = Window.partitionBy(*group_cols)
    w_seq = Window.partitionBy(*group_cols).orderBy("_ord")
    d = buckets.select(
        *group_cols,
        F.col(order_col).alias("_ord"),
        x.alias("_x"),
    ).select(
        "*",
        F.row_number().over(w_seq).alias("_i"),
        F.sum("_x").over(w_ord).alias("_cs"),
        F.sum(F.col("_x") * F.col("_x")).over(w_ord).alias("_cs2"),
        F.count(F.lit(1)).over(w_grp).alias("_n"),
        F.sum("_x").over(w_grp).alias("_s"),
        F.sum(F.col("_x") * F.col("_x")).over(w_grp).alias("_s2"),
        F.lead("_ord").over(w_seq).alias("_next"),
    )
    i, n = F.col("_i"), F.col("_n")
    cs, cs2 = F.col("_cs"), F.col("_cs2")
    s, s2 = F.col("_s"), F.col("_s2")
    sse_all = s2 - s * s / n
    sse_l = cs2 - cs * cs / i
    sse_r = (s2 - cs2) - (s - cs) * (s - cs) / (n - i)
    valid = (i >= F.lit(min_segment)) & ((n - i) >= F.lit(min_segment))
    ratio = F.when(
        valid & (sse_all > 0), (sse_all - sse_l - sse_r) / sse_all
    )
    cand = d.select(
        *group_cols,
        "_i", "_n", "_next",
        ratio.alias("_ratio"),
        (cs / i).alias("_lmean"),
        # the last row has an empty right segment — ANSI mode makes the
        # ungated n-i division a hard error, so gate it (invalid splits
        # never win the argmax anyway)
        F.when(n > i, (s - cs) / (n - i)).alias("_rmean"),
    )
    pick = Window.partitionBy(*group_cols).orderBy(
        F.desc_nulls_last("_ratio"), F.asc("_i")
    )
    best = cand.withColumn("_r", F.row_number().over(pick)).where(
        F.col("_r") == 1
    )
    typ = (
        F.when(F.col("_n") < 2 * min_segment, F.lit("indeterminable"))
        .when(
            F.col("_ratio").isNull()
            | (F.col("_ratio") < F.lit(float(threshold))),
            F.lit("stationary"),
        )
        .otherwise(F.lit("step_change"))
    )
    keep = typ == F.lit("step_change")
    return best.select(
        *group_cols,
        typ.alias("type"),
        F.when(keep, F.col("_next")).alias("change_bucket"),
        F.when(keep, F.col("_lmean")).alias("left_mean"),
        F.when(keep, F.col("_rmean")).alias("right_mean"),
        F.when(keep, F.col("_ratio")).alias("reduction_ratio"),
    )


def bucket_count_ks_test(
    buckets: DataFrame,
    value_col: str,
    order_col: str,
    group_cols: list[str],
    expected_col: str | None = None,
) -> DataFrame:
    """ES `bucket_count_ks_test`, the deterministic-statistic core:
    Kolmogorov-Smirnov distances between each group's cumulative
    bucket-count distribution (buckets ordered by order_col) and an
    expected cumulative distribution — uniform across the group's
    buckets by default, or proportional to expected_col when given
    (ES's `fractions` array). Per group:

      d_greater   = max over buckets of (actual_cdf - expected_cdf)
      d_less      = max of (expected_cdf - actual_cdf)
      d_two_sided = max of |actual_cdf - expected_cdf|

    ES's Monte-Carlo / ML-derived p-values for these alternatives are
    documented out — the D statistics are the replicable core a rule
    can threshold on. Groups with a zero count total (or zero expected
    total) report NULL distances.

    Plan: two ordered-window prefix sums and one groupBy — the same
    single-exchange shape as the sibling pipeline aggs; no UDF."""
    x = F.col(value_col).cast("double")
    e = F.col(expected_col).cast("double") if expected_col else F.lit(1.0)
    w_ord = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_grp = Window.partitionBy(*group_cols)
    d = buckets.select(
        *group_cols,
        F.col(order_col),
        F.when(
            F.sum(x).over(w_grp) > 0, F.sum(x).over(w_ord) / F.sum(x).over(w_grp)
        ).alias("_ca"),
        F.when(
            F.sum(e).over(w_grp) > 0, F.sum(e).over(w_ord) / F.sum(e).over(w_grp)
        ).alias("_ce"),
    )
    diff = F.col("_ca") - F.col("_ce")
    return d.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_buckets"),
        F.when(
            F.max(diff).isNotNull(), F.greatest(F.max(diff), F.lit(0.0))
        ).alias("d_greater"),
        F.when(
            F.max(diff).isNotNull(), F.greatest(F.max(-diff), F.lit(0.0))
        ).alias("d_less"),
        F.max(F.abs(diff)).alias("d_two_sided"),
    )
