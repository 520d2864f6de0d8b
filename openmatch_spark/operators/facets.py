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
from pyspark.sql import DataFrame, Window

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


def range_facets(
    run: DataFrame,
    docs: DataFrame,
    ranges: dict[str, list[tuple]],
) -> DataFrame:
    """(query_id, facet, bucket, n_docs) — Elasticsearch range-aggregation
    semantics over the hit set: for each numeric attribute, count hits per
    half-open bucket [lo, hi) from an EXPLICIT bucket list. Buckets may
    overlap (a doc then counts in each bucket it falls in — ES allows and
    documents this); None means unbounded on that side. Docs matching no
    bucket (or with a NULL attribute) land in '(other)'.

    ranges: {col: [(lo, hi), ...]} with numeric or None endpoints. Bucket
    labels are '[lo,hi)' with '*' for an open side — deterministic, so the
    output is oracle-comparable. Plan: the run is bounded (queries × k);
    one broadcast hydrate join, one CASE/array projection per facet, one
    groupBy — same shape as facet_counts.
    """
    if not ranges:
        raise ValueError("ranges must name at least one attribute column")
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )

    def _lbl(lo, hi):
        ls = "*" if lo is None else f"{float(lo):g}"
        hs = "*" if hi is None else f"{float(hi):g}"
        return f"[{ls},{hs})"

    out = None
    for col, buckets in sorted(ranges.items()):
        if not buckets:
            raise ValueError(f"ranges[{col!r}] is empty")
        v = F.col(col).cast("double")
        membership = F.array(*[
            F.when(
                v.isNotNull()
                & (F.lit(True) if lo is None else (v >= F.lit(float(lo))))
                & (F.lit(True) if hi is None else (v < F.lit(float(hi)))),
                F.lit(_lbl(lo, hi)),
            )
            for lo, hi in buckets
        ])
        hits = F.filter(membership, lambda x: x.isNotNull())
        bucketed = (
            docs.select(
                F.col("doc_id").cast("string").alias("doc_id"),
                F.when(F.size(hits) > 0, hits)
                .otherwise(F.array(F.lit("(other)")))
                .alias("_buckets"),
            )
            .join(F.broadcast(base), "doc_id")
            .select(
                "query_id",
                F.lit(col).alias("facet"),
                F.explode("_buckets").alias("bucket"),
            )
        )
        out = bucketed if out is None else out.unionByName(bucketed)
    return out.groupBy("query_id", "facet", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


def histogram_facets(
    run: DataFrame,
    docs: DataFrame,
    intervals: dict[str, float],
    min_doc_count: int = 1,
    extended_bounds: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """(query_id, facet, bucket_lo, n_docs) — Elasticsearch histogram
    aggregation over the hit set: fixed-width buckets keyed by their lower
    edge, bucket_lo = floor(value / interval) * interval (origin 0); NULL
    attributes are skipped. One broadcast hydrate + one groupBy.

    min_doc_count follows ES: the default 1 emits only occupied buckets
    (sparse); 0 DENSIFIES — every bucket between a (query, facet) group's
    min and max occupied bucket appears with n_docs 0, the gaps generated
    with sequence() over bucket ordinals (a per-group-bounded explode,
    never corpus-shaped); higher values filter. extended_bounds widens the
    densified span per facet column (ES semantics: forces empty edge
    buckets beyond the data). Deviation, documented: a (query, facet)
    group with NO occupied bucket at all emits nothing even under
    extended_bounds — the span is derived from the counts frame, and a
    query absent from it has no group to widen."""
    if not intervals:
        raise ValueError("intervals must name at least one attribute column")
    if min_doc_count < 0:
        raise ValueError(f"min_doc_count must be >= 0, got {min_doc_count}")
    if extended_bounds and min_doc_count > 0:
        raise ValueError("extended_bounds requires min_doc_count=0 (ES rule)")
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    out = None
    for col, width in sorted(intervals.items()):
        if not width or width <= 0:
            raise ValueError(f"intervals[{col!r}] must be > 0, got {width}")
        v = F.col(col).cast("double")
        part = (
            docs.select(
                F.col("doc_id").cast("string").alias("doc_id"),
                (F.floor(v / F.lit(float(width))) * F.lit(float(width))).alias(
                    "bucket_lo"
                ),
            )
            .where(F.col("bucket_lo").isNotNull())
            .join(F.broadcast(base), "doc_id")
            .select(
                "query_id",
                F.lit(col).alias("facet"),
                F.lit(float(width)).alias("_w"),
                "bucket_lo",
            )
        )
        out = part if out is None else out.unionByName(part)
    counts = out.groupBy("query_id", "facet", "_w", "bucket_lo").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    if min_doc_count == 0:
        spans = counts.groupBy("query_id", "facet", "_w").agg(
            F.min("bucket_lo").alias("_mn"), F.max("bucket_lo").alias("_mx")
        )
        for col, (lo, hi) in sorted((extended_bounds or {}).items()):
            snap_lo = F.floor(F.lit(float(lo)) / F.col("_w")) * F.col("_w")
            snap_hi = F.floor(F.lit(float(hi)) / F.col("_w")) * F.col("_w")
            is_col = F.col("facet") == F.lit(col)
            spans = spans.withColumn(
                "_mn", F.when(is_col, F.least("_mn", snap_lo)).otherwise(F.col("_mn"))
            ).withColumn(
                "_mx", F.when(is_col, F.greatest("_mx", snap_hi)).otherwise(F.col("_mx"))
            )
        grid = spans.select(
            "query_id", "facet", "_mn",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.round((F.col("_mx") - F.col("_mn")) / F.col("_w")).cast("long"),
                )
            ).alias("_i"),
            "_w",
        ).select(
            "query_id", "facet",
            # ordinal * width, the SAME product shape as the counts side's
            # floor(v/w)*w — bit-identical keys, so the join always lands
            (
                (F.round(F.col("_mn") / F.col("_w")).cast("long") + F.col("_i"))
                * F.col("_w")
            ).alias("bucket_lo"),
        )
        return grid.join(
            counts.drop("_w"), ["query_id", "facet", "bucket_lo"], "left"
        ).select(
            "query_id", "facet", "bucket_lo",
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
        )
    filtered = counts.drop("_w")
    if min_doc_count > 1:
        filtered = filtered.where(F.col("n_docs") >= min_doc_count)
    return filtered


def facet_top_hits(
    run: DataFrame,
    docs: DataFrame,
    facet_col: str,
    n: int = 3,
) -> DataFrame:
    """(query_id, value, doc_id, score, pos) — the ES `top_hits`
    sub-aggregation: within each query's hit set, the top-n docs PER
    facet value by (score DESC, doc_id ASC), pos 1-based within the
    bucket. NULL attribute values bucket under NULL_BUCKET so hits never
    silently vanish from the grouped view.

    run: (query_id, doc_id, score). Same plan family as facet_counts —
    one broadcast hydrate of the (queries × k)-bounded run, one window."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("score").cast("double").alias("score"),
    )
    attrs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.coalesce(F.col(facet_col).cast("string"), F.lit(NULL_BUCKET)).alias(
            "value"
        ),
    )
    hydrated = attrs.join(F.broadcast(base), "doc_id")
    w = Window.partitionBy("query_id", "value").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        hydrated.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= n)
        .select("query_id", "value", "doc_id", "score", "pos")
    )


DATE_INTERVALS = ("year", "quarter", "month", "week", "day", "hour", "minute")


def _parse_dh_offset(offset: str):
    """ES date_histogram `offset` ('+6h', '-30m', '1d') -> a Spark
    interval column. Units: m(inutes), h(ours), d(ays)."""
    import re as _re

    m = _re.fullmatch(r"([+-]?)(\d+)([mhd])", offset)
    if not m:
        raise ValueError(
            f"offset must look like '+6h' / '-30m' / '1d', got {offset!r}"
        )
    n = (-1 if m.group(1) == "-" else 1) * int(m.group(2))
    unit = m.group(3)
    return F.make_interval(
        days=F.lit(n if unit == "d" else 0),
        hours=F.lit(n if unit == "h" else 0),
        mins=F.lit(n if unit == "m" else 0),
    )


def date_histogram_facets(
    run: DataFrame,
    docs: DataFrame,
    ts_col: str,
    interval: str = "month",
    offset: str | None = None,
    time_zone: str | None = None,
) -> DataFrame:
    """(query_id, facet, bucket, n_docs) — the Elasticsearch
    `date_histogram` aggregation (calendar_interval flavor) over the hit
    set: hits counted per calendar bucket of a timestamp attribute, the
    bucket keyed by its START formatted 'yyyy-MM-dd HH:mm:ss' (ES keys
    buckets by start; a fixed text key makes the output engine- and
    timezone-representation-independent). Sparse like ES: empty buckets
    absent. NULL timestamps count under NULL_BUCKET rather than vanishing
    (ES drops docs missing the field; a curation dashboard should not).

    interval: one of DATE_INTERVALS — both Spark's and ANSI date_trunc's
    vocabulary, so the oracle replica is a literal date_trunc. 'week'
    means ISO Monday-start in both engines.

    offset (ES `offset`, e.g. '+6h'): bucket boundaries shift by the
    duration — bucket start = trunc(ts - offset) + offset, ES's rule.
    time_zone (ES `time_zone`): timestamps are interpreted as UTC and
    bucketed on their wall-clock time in that zone (named zones and
    fixed '+HH:MM' offsets, via from_utc_timestamp); the bucket key is
    the LOCAL bucket start — ES likewise keys in the requested zone.

    Plan: identical to facet_counts — the run is queries × k bounded, so
    one broadcast hydrate join + one groupBy; the truncation is a pure
    projection on the docs scan. At 100 TB the shuffle carries only
    (query, bucket) partial counts (map-side combined).
    """
    if interval not in DATE_INTERVALS:
        raise ValueError(
            f"interval must be one of {DATE_INTERVALS}, got {interval!r}"
        )
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    ts = F.col(ts_col).cast("timestamp")
    if time_zone is not None:
        ts = F.from_utc_timestamp(ts, time_zone)
    if offset is not None:
        iv = _parse_dh_offset(offset)
        start = F.date_trunc(interval, ts - iv) + iv
    else:
        start = F.date_trunc(interval, ts)
    bucketed = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.coalesce(
            F.date_format(start, "yyyy-MM-dd HH:mm:ss"),
            F.lit(NULL_BUCKET),
        ).alias("bucket"),
    )
    return (
        bucketed.join(F.broadcast(base), "doc_id")
        .select("query_id", F.lit(ts_col).alias("facet"), "bucket")
        .groupBy("query_id", "facet", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


OTHER_BUCKET = "(other)"


def terms_facets(
    run: DataFrame,
    docs: DataFrame,
    facet_cols: list[str],
    size: int = 5,
) -> DataFrame:
    """(query_id, facet, value, n_docs, pos) — the ES `terms` aggregation
    proper: per query and attribute, the top `size` values by doc count
    (count DESC, value ASC — ES's _count,_key order), pos 1-based, plus
    one OTHER_BUCKET row carrying sum_other_doc_count (the tail mass ES
    reports as metadata; a row keeps one schema) whenever the tail is
    non-empty. NULL attribute values count under NULL_BUCKET like
    facet_counts — they compete for the top like any value.

    Same bounded plan as facet_counts + one window for the size cut and
    one groupBy for the tail sum."""
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    counts = facet_counts(run, docs, facet_cols)
    w = Window.partitionBy("query_id", "facet").orderBy(
        F.desc("n_docs"), F.asc("value")
    )
    ranked = counts.withColumn("pos", F.row_number().over(w))
    top = ranked.where(F.col("pos") <= size).select(
        "query_id", "facet", "value", "n_docs", "pos"
    )
    other = (
        ranked.where(F.col("pos") > size)
        .groupBy("query_id", "facet")
        .agg(F.sum("n_docs").cast("long").alias("n_docs"))
        .select(
            "query_id",
            "facet",
            F.lit(OTHER_BUCKET).alias("value"),
            "n_docs",
            F.lit(None).cast("int").alias("pos"),
        )
    )
    return top.unionByName(other)


def composite_facets(
    docs: DataFrame,
    sources: list[tuple],
    size: int = 10,
    after: dict | None = None,
    count_col: str = "n_docs",
) -> DataFrame:
    """The ES `composite` aggregation: multi-source buckets in a STABLE
    key order with `after`-key pagination, so a client can walk EVERY
    bucket of an index page by page (terms/date_histogram aggs cap at
    `size` and shard_size; composite is ES's only exhaustive-enumeration
    agg — the analog of paging a GROUP BY).

    sources: [(name, column-expression or column name), ...] — each
    becomes an output column; a histogram source is just an expression
    (e.g. `F.floor(F.col("n_chars") / 500) * 500`). Buckets are ordered
    ascending by the source tuple (ES orders by each source's order,
    default asc; nulls FIRST as in ES missing_bucket ordering — though
    rows where ANY source is NULL are dropped by default, ES
    missing_bucket=false). after: {name: value} — the LAST bucket key of
    the previous page; strictly-greater buckets are returned.

    Plan shape for 100 TB: one groupBy on the source tuple (map-side
    combined), the after-key cut is a pushed filter on the aggregated
    frame, and the page materializes via sort+limit — Spark compiles
    orderBy().limit(size) to TakeOrderedAndProject, a per-partition
    top-size + driver merge of size-bounded partials, NOT a global sort.
    Each page is one bounded job; the full walk streams the bucket set
    through the driver one page at a time, never all at once."""
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    if not sources:
        raise ValueError("sources must name at least one (name, expr)")
    names = [n for n, _ in sources]
    if after is not None and set(after) != set(names):
        raise ValueError(
            f"after must key exactly the source names {names}, got {sorted(after)}"
        )
    keyed = docs.select(
        *[
            (F.col(e) if isinstance(e, str) else e).alias(n)
            for n, e in sources
        ]
    )
    for n in names:
        keyed = keyed.where(F.col(n).isNotNull())
    buckets = keyed.groupBy(*names).agg(
        F.count(F.lit(1)).cast("long").alias(count_col)
    )
    if after is not None:
        # lexicographic strictly-greater over the source tuple
        cond = F.lit(False)
        eq = F.lit(True)
        for n in names:
            a = F.lit(after[n])
            cond = cond | (eq & (F.col(n) > a))
            eq = eq & (F.col(n) == a)
        buckets = buckets.where(cond)
    return buckets.orderBy(*[F.col(n).asc() for n in names]).limit(size)


def adjacency_matrix_facets(
    run: DataFrame,
    docs: DataFrame,
    filters: dict[str, "str | F.Column"],
    separator: str = "&",
) -> DataFrame:
    """(query_id, key, n_docs) — the ES `adjacency_matrix` aggregation
    over the hit set: one bucket per named predicate plus one per
    UNORDERED pair of predicates (key "a&b", names joined by `separator`
    in sorted-name order, ES's convention). ES omits empty buckets — so
    does this (a dense matrix over f² pairs is exactly what the operator
    exists to avoid); callers needing zeros outer-join the key list.

    Plan: one broadcast hydrate of the (queries × k)-bounded run, every
    intersection computed as a conjunction column in the SAME single
    groupBy pass (f + f(f−1)/2 sum columns) — no join per pair, no second
    shuffle. NULL predicate results fold to false (SQL 3VL)."""
    if not filters:
        raise ValueError("filters must name at least one predicate")
    names = sorted(filters)
    if any(separator in n for n in names):
        raise ValueError(f"filter names must not contain {separator!r}")
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    hydrated = docs.join(F.broadcast(base), "doc_id")
    flag = {
        n: F.coalesce(
            (F.expr(p) if isinstance(p, str) else p).cast("boolean"),
            F.lit(False),
        )
        for n, p in filters.items()
    }
    sums = [F.sum(flag[n].cast("long")).alias(n) for n in names]
    keys = list(names)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            key = f"{a}{separator}{b}"
            keys.append(key)
            sums.append(F.sum((flag[a] & flag[b]).cast("long")).alias(key))
    agg = hydrated.groupBy("query_id").agg(*sums)
    stack_expr = "stack({n}, {pairs}) as (key, n_docs)".format(
        n=len(keys), pairs=", ".join(f"'{k}', `{k}`" for k in keys)
    )
    return agg.select("query_id", F.expr(stack_expr)).where(F.col("n_docs") > 0)


def multi_terms_facets(
    run: DataFrame,
    docs: DataFrame,
    cols: list[str],
    size: int = 5,
    key_separator: str = "|",
) -> DataFrame:
    """(query_id, key, n_docs, pos) — the ES `multi_terms` aggregation:
    top `size` COMPOSITE keys (the tuple of attribute values) by hit-doc
    count. ES semantics: a doc missing ANY key component is excluded from
    the aggregation entirely (unlike `terms`' missing bucket). Key is the
    component values joined by `key_separator`; ordering is count DESC
    then key ASC — callers whose values may contain the separator must
    pick another, the tie order is over the JOINED string (documented so
    the oracle can replay it)."""
    if len(cols) < 2:
        raise ValueError("multi_terms needs at least two key columns")
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    attrs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        *[F.col(c).cast("string").alias(c) for c in cols],
    )
    hydrated = attrs.join(F.broadcast(base), "doc_id")
    keep = None
    for c in cols:
        cond = F.col(c).isNotNull()
        keep = cond if keep is None else (keep & cond)
    counted = (
        hydrated.where(keep)
        .select(
            "query_id",
            F.concat_ws(key_separator, *[F.col(c) for c in cols]).alias("key"),
        )
        .groupBy("query_id", "key")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("n_docs"), F.asc("key"))
    return (
        counted.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= size)
    )


def rare_terms_facets(
    run: DataFrame,
    docs: DataFrame,
    facet_cols: list[str],
    max_doc_count: int = 1,
) -> DataFrame:
    """(query_id, facet, value, n_docs) — the ES `rare_terms` aggregation
    over the hit set: the LONG TAIL (values held by at most
    `max_doc_count` hit docs), the complement of `terms`' head. ES
    computes this approximately with a CuckooFilter because its contexts
    are unbounded; the hit set here is (queries × k)-bounded so exact is
    affordable and oracle-checkable — over an unbounded candidate set,
    aggregate corpus-wide df first and filter (same shape as term_stats).
    NULL values are excluded (ES: missing values don't participate unless
    configured). Ordered by count ASC within (query, facet) by contract;
    no size cut — rarity IS the cut."""
    if max_doc_count <= 0:
        raise ValueError(f"max_doc_count must be positive, got {max_doc_count}")
    counts = facet_counts(run, docs, facet_cols)
    return counts.where(
        (F.col("n_docs") <= max_doc_count) & (F.col("value") != NULL_BUCKET)
    )


def diversified_sample(
    run: DataFrame,
    docs: DataFrame,
    field: str,
    shard_size: int = 100,
    max_docs_per_value: int = 1,
) -> DataFrame:
    """The ES `diversified_sampler` aggregation's sampling step: reduce
    the run to the best-ranked `shard_size` hits per query while keeping
    AT MOST `max_docs_per_value` docs per value of `field` (host / source
    de-biasing before a sub-aggregation; run sub-aggs over the returned
    frame). NULL field values form one competing group, matching ES's
    treatment of missing de-dup keys. Output keeps the run's columns plus
    `sample_rank` (1-based, by original rank). Two windows over the
    bounded run — rank must be present (the engine's runs always carry
    it)."""
    if shard_size <= 0 or max_docs_per_value <= 0:
        raise ValueError("shard_size and max_docs_per_value must be positive")
    base = run.withColumn("query_id", F.col("query_id").cast("string")).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    attrs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.coalesce(F.col(field).cast("string"), F.lit(NULL_BUCKET)).alias("_dv"),
    )
    hydrated = base.join(F.broadcast(attrs), "doc_id", "left").withColumn(
        "_dv", F.coalesce(F.col("_dv"), F.lit(NULL_BUCKET))
    )
    per_value = Window.partitionBy("query_id", "_dv").orderBy(F.asc("rank"))
    kept = hydrated.withColumn("_vpos", F.row_number().over(per_value)).where(
        F.col("_vpos") <= max_docs_per_value
    )
    overall = Window.partitionBy("query_id").orderBy(F.asc("rank"))
    return (
        kept.withColumn("sample_rank", F.row_number().over(overall))
        .where(F.col("sample_rank") <= shard_size)
        .drop("_dv", "_vpos")
    )


# coarse -> fine; auto_date_histogram picks the FINEST rung that still
# fits the bucket target (ES's ladder minus sub-minute rungs, single-unit)
AUTO_DATE_LADDER = ("year", "quarter", "month", "week", "day", "hour", "minute")


def auto_date_histogram_facets(
    run: DataFrame,
    docs: DataFrame,
    ts_col: str,
    target_buckets: int = 10,
) -> DataFrame:
    """(query_id, facet, interval, bucket, n_docs) — the ES
    `auto_date_histogram` aggregation: per query, pick the FINEST calendar
    interval from AUTO_DATE_LADDER whose occupied-bucket count stays
    within `target_buckets`, then bucket the hits at that rung (interval
    rides along, as ES reports it). Falls back to the coarsest rung when
    even 'year' overflows (ES caps the same way). NULL timestamps are
    dropped (ES's missing-field rule; the fixed-interval surface keeps
    them under NULL_BUCKET — callers wanting an audit trail use that one).

    Plan: two passes over the (queries × k)-bounded hydrated hit set —
    one groupBy computing countDistinct per rung (|ladder| expressions,
    one shuffle), a broadcast of the per-query choice back onto the
    bucketed rows, one counting groupBy. Nothing corpus-shaped."""
    if target_buckets <= 0:
        raise ValueError(f"target_buckets must be positive, got {target_buckets}")
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    ts = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
    ).where(F.col("_ts").isNotNull())
    hyd = ts.join(F.broadcast(base), "doc_id")
    for rung in AUTO_DATE_LADDER:
        hyd = hyd.withColumn(
            f"_b_{rung}",
            F.date_format(F.date_trunc(rung, F.col("_ts")), "yyyy-MM-dd HH:mm:ss"),
        )
    counts = hyd.groupBy("query_id").agg(
        *[
            F.countDistinct(f"_b_{rung}").alias(f"_n_{rung}")
            for rung in AUTO_DATE_LADDER
        ]
    )
    # finest rung within target: walk coarse -> fine, keep the last that fits
    choice = F.lit(AUTO_DATE_LADDER[0])
    for rung in AUTO_DATE_LADDER[1:]:
        choice = F.when(
            F.col(f"_n_{rung}") <= target_buckets, F.lit(rung)
        ).otherwise(choice)
    chosen = counts.select("query_id", choice.alias("interval"))
    bucket = None
    for rung in AUTO_DATE_LADDER:
        this = F.col(f"_b_{rung}")
        bucket = this if bucket is None else F.when(
            F.col("interval") == rung, this
        ).otherwise(bucket)
    return (
        hyd.join(F.broadcast(chosen), "query_id")
        .select(
            "query_id",
            F.lit(ts_col).alias("facet"),
            "interval",
            bucket.alias("bucket"),
        )
        .groupBy("query_id", "facet", "interval", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def date_range_facets(
    run: DataFrame,
    docs: DataFrame,
    ts_col: str,
    ranges: list[tuple],
) -> DataFrame:
    """(query_id, bucket, n_docs) — the ES `date_range` aggregation over
    the hit set: count hits per half-open timestamp bucket [from, to),
    endpoints as 'yyyy-MM-dd HH:mm:ss' text or None for an open side.
    ES semantics kept exactly: `from` is inclusive, `to` exclusive,
    ranges may overlap, EVERY requested range appears per query even at
    zero count, and hits with a NULL timestamp are ignored (no
    `missing` parameter).

    Bucket labels are 'from..to' with '*' for an open side. Plan: one
    broadcast hydrate of the (queries x k)-bounded run, a membership
    array projection, one groupBy; the zero-fill cross-join is bounded
    by distinct queries x len(ranges)."""
    if not ranges:
        raise ValueError("ranges must name at least one date range")
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )

    def _lbl(lo, hi):
        return f"{lo or '*'}..{hi or '*'}"

    ts = F.to_timestamp(F.col(ts_col))
    membership = F.array(*[
        F.when(
            ts.isNotNull()
            & (F.lit(True) if lo is None
               else (ts >= F.to_timestamp(F.lit(lo))))
            & (F.lit(True) if hi is None
               else (ts < F.to_timestamp(F.lit(hi)))),
            F.lit(_lbl(lo, hi)),
        )
        for lo, hi in ranges
    ])
    counts = (
        docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.filter(membership, lambda x: x.isNotNull()).alias("_m"),
        )
        .join(F.broadcast(base), "doc_id")
        .select("query_id", F.explode("_m").alias("bucket"))
        .groupBy("query_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    rframe = docs.sparkSession.createDataFrame(
        [(_lbl(lo, hi),) for lo, hi in ranges], "bucket string"
    )
    grid = base.select("query_id").distinct().crossJoin(F.broadcast(rframe))
    return grid.join(counts, ["query_id", "bucket"], "left").select(
        "query_id", "bucket",
        F.coalesce("n_docs", F.lit(0).cast("long")).alias("n_docs"),
    )


def categorize_text(
    docs: DataFrame,
    text_col: str = "text",
    max_tokens: int | None = None,
    min_doc_count: int = 1,
    top_n: int | None = None,
) -> DataFrame:
    """ES `categorize_text` aggregation, the deterministic core: group
    semi-structured text (log lines, error messages) by its stable
    token pattern. Tokens are lowercased [a-z0-9]+ runs; any token
    containing a digit is a variable part (ids, sizes, timestamps) and
    is dropped — the category key is the remaining token sequence,
    optionally truncated to the first max_tokens tokens (ES's
    similarity_threshold ML merge of near-identical patterns is
    documented out; this is the exact-pattern subset an oracle can
    replicate).

    Plan: the key is pure projection algebra (split / filter / slice /
    array_join — no UDF), so categorization is one codegen pass over
    the scan plus a single groupBy exchange on the category key; at
    100 TB that is the same shape as any word-count. Output one row per
    category: (category, n_tokens, doc_count, rank), doc_count desc,
    category asc, rank dense over that order; min_doc_count prunes the
    long tail BEFORE ranking (matching ES's bucket pruning), top_n cuts
    after."""
    if min_doc_count < 1:
        raise ValueError(f"min_doc_count must be >= 1, got {min_doc_count}")
    if max_tokens is not None and max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), "[^a-z0-9]+"),
        lambda t: (t != "") & ~t.rlike("[0-9]"),
    )
    if max_tokens is not None:
        toks = F.slice(toks, 1, max_tokens)
    cats = (
        docs.select(toks.alias("_toks"))
        .select(
            F.array_join("_toks", " ").alias("category"),
            F.size("_toks").cast("int").alias("n_tokens"),
        )
        .groupBy("category", "n_tokens")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
        .where(F.col("doc_count") >= min_doc_count)
    )
    w = Window.orderBy(F.desc("doc_count"), F.asc("category"))
    out = cats.withColumn("rank", F.row_number().over(w).cast("int"))
    if top_n is not None:
        out = out.where(F.col("rank") <= top_n)
    return out


_IPV4_RE = r"^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"


def _ipv4_to_long(ip: str) -> int:
    parts = ip.split(".")
    if len(parts) != 4 or any(not p.isdigit() or int(p) > 255 for p in parts):
        raise ValueError(f"not a dotted-quad IPv4 address: {ip!r}")
    a, b, c, d = (int(p) for p in parts)
    return (a << 24) | (b << 16) | (c << 8) | d


def _ip_range_bounds(spec: dict) -> tuple[str, int, int]:
    """-> (bucket_label, lo_inclusive, hi_exclusive) from an ES-style
    range spec: {"mask": "a.b.c.d/len"} or {"from": ip|None, "to":
    ip|None} — from inclusive, to exclusive, None = open end."""
    if "mask" in spec:
        ip, _, bits = spec["mask"].partition("/")
        n = int(bits)
        if not 0 <= n <= 32:
            raise ValueError(f"mask length out of range: {spec['mask']!r}")
        width = 1 << (32 - n)
        lo = _ipv4_to_long(ip) & ~(width - 1)
        return spec["mask"], lo, lo + width
    lo = _ipv4_to_long(spec["from"]) if spec.get("from") else 0
    hi = _ipv4_to_long(spec["to"]) if spec.get("to") else 1 << 32
    return f"{spec.get('from') or '*'}..{spec.get('to') or '*'}", lo, hi


def ip_range_facets(
    run: DataFrame,
    docs: DataFrame,
    ip_col: str,
    ranges: list[dict],
) -> DataFrame:
    """(query_id, bucket, n_docs) — ES `ip_range` aggregation over the
    run's documents. ranges: ES-style specs ({"mask": "10.0.0.0/16"} or
    {"from": ..., "to": ...}); from is inclusive, to exclusive,
    overlapping ranges each count the doc (ES semantics). IPv4 only
    (IPv6 needs 128-bit arithmetic — documented out); rows whose ip_col
    is NULL or not a dotted quad fall in no bucket, and every requested
    range appears with an explicit zero instead of vanishing.

    Plan: each spec compiles driver-side to numeric [lo, hi) bounds;
    membership is a projection over the broadcast-hydrated run (same
    shape as range_facets) — one exchange for the count groupBy."""
    if not ranges:
        raise ValueError("ranges must name at least one ip range")
    bounds = [_ip_range_bounds(s) for s in ranges]
    base = run.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    p = F.split(F.col(ip_col), r"\.")
    num = F.when(
        F.col(ip_col).rlike(_IPV4_RE),
        p[0].cast("long") * 16777216 + p[1].cast("long") * 65536
        + p[2].cast("long") * 256 + p[3].cast("long"),
    )
    membership = F.array(*[
        F.when((num >= F.lit(lo)) & (num < F.lit(hi)), F.lit(label))
        for label, lo, hi in bounds
    ])
    counts = (
        docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.filter(membership, lambda x: x.isNotNull()).alias("_m"),
        )
        .join(F.broadcast(base), "doc_id")
        .select("query_id", F.explode("_m").alias("bucket"))
        .groupBy("query_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    rframe = docs.sparkSession.createDataFrame(
        [(label,) for label, _, _ in bounds], "bucket string"
    )
    grid = base.select("query_id").distinct().crossJoin(F.broadcast(rframe))
    return grid.join(counts, ["query_id", "bucket"], "left").select(
        "query_id", "bucket",
        F.coalesce("n_docs", F.lit(0).cast("long")).alias("n_docs"),
    )
