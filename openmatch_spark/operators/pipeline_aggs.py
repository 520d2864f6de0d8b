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
