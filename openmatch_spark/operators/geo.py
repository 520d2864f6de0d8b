"""Geo query operators: ES geo_distance search (filter by radius, sort
by distance), geo_bounding_box filtering, and the geotile_grid bucket
aggregation — over any frame carrying lat/lon degree columns.

Plans are scan-shaped: the distance/tile expressions are per-row column
algebra (functions/geo.py), the radius and box predicates filter ON the
scan (pushdown-friendly arithmetic, no UDF), nearest-k compiles to
TakeOrderedAndProject (per-partition top-k + driver merge of k-bounded
partials — no global sort), and the grid aggregation is one map-side
combined groupBy on the tile key. All of it survives 100× data: nothing
driver-bound, one bounded shuffle each.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from openmatch_spark.functions.geo import (
    geohash_cell,
    geotile_cell,
    haversine_km,
    in_bounding_box,
)


def geo_distance_search(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    center_lat: float,
    center_lon: float,
    radius_km: float | None = None,
    k: int | None = None,
    id_col: str = "doc_id",
    out_col: str = "distance_km",
) -> DataFrame:
    """ES geo_distance query + _geo_distance sort: rows within
    radius_km of the center (if given), nearest-first, cut to k (if
    given), with the computed distance exposed. Ties broken by id_col
    so results are deterministic. NULL coordinates never match (ES
    ignores docs missing the field)."""
    if radius_km is None and k is None:
        raise ValueError("give radius_km, k, or both — an unbounded "
                         "unsorted geo scan is a full-table echo")
    if radius_km is not None and radius_km < 0:
        raise ValueError(f"radius_km must be >= 0, got {radius_km}")
    if k is not None and k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    d = df.where(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    ).withColumn(out_col, haversine_km(lat_col, lon_col, center_lat, center_lon))
    if radius_km is not None:
        d = d.where(F.col(out_col) <= F.lit(float(radius_km)))
    d = d.orderBy(F.col(out_col).asc(), F.col(id_col).asc())
    return d.limit(k) if k is not None else d


def geo_bounding_box_filter(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    top: float,
    left: float,
    bottom: float,
    right: float,
) -> DataFrame:
    """ES geo_bounding_box query: rows inside the (top,left)-(bottom,
    right) box, antimeridian-aware, NULL coordinates excluded."""
    return df.where(
        F.col(lat_col).isNotNull()
        & F.col(lon_col).isNotNull()
        & in_bounding_box(lat_col, lon_col, top, left, bottom, right)
    )


def geotile_grid_facets(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    zoom: int,
    size: int | None = None,
    cell_col: str = "cell",
) -> DataFrame:
    """ES geotile_grid aggregation: doc counts per Web-Mercator 'z/x/y'
    tile at `zoom`. size keeps the top-`size` cells (count DESC, cell
    ASC — ES bucket order) with a 1-based pos; size=None enumerates all
    occupied cells (pos still attached for a deterministic hash). NULL
    coordinates are dropped (ES skips docs missing the field).

    The pos window is unpartitioned but runs over the POST-aggregation
    cell frame, which is bounded by 4^zoom (≤65k rows at zoom 8), not
    the corpus — the same single-reducer top-N every ES coordinating
    node performs."""
    if size is not None and size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    cells = (
        df.where(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .select(geotile_cell(lat_col, lon_col, zoom).alias(cell_col))
        .groupBy(cell_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    w = Window.orderBy(F.desc("n_docs"), F.asc(cell_col))
    ranked = cells.withColumn("pos", F.row_number().over(w))
    return ranked.where(F.col("pos") <= size) if size is not None else ranked


def geohash_grid_facets(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    precision: int,
    size: int | None = None,
    cell_col: str = "cell",
) -> DataFrame:
    """ES geohash_grid aggregation: doc counts per base32 geohash cell
    of length `precision`. Same contract as geotile_grid_facets — size
    keeps the top-`size` cells (count DESC, cell ASC, ES bucket order)
    with a 1-based pos, size=None enumerates all occupied cells; NULL
    coordinates are dropped (ES skips docs missing the field).

    The pos window is unpartitioned but runs over the POST-aggregation
    cell frame — bounded by 32^precision occupied cells, not the
    corpus (the same single-reducer top-N an ES coordinating node
    performs)."""
    if size is not None and size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    cells = (
        df.where(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .select(geohash_cell(lat_col, lon_col, precision).alias(cell_col))
        .groupBy(cell_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    w = Window.orderBy(F.desc("n_docs"), F.asc(cell_col))
    ranked = cells.withColumn("pos", F.row_number().over(w))
    return ranked.where(F.col("pos") <= size) if size is not None else ranked


def geo_bounds(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """ES `geo_bounds` aggregation: the smallest lat/lon box enclosing
    the points — (top, left, bottom, right) per group (or one global
    row when group_cols is None/empty; a `n_points` column rides along).
    NULL coordinates are skipped (ES: missing fields don't participate);
    a group with no valid points reports NULL bounds with n_points 0.
    ES's wrap_longitude antimeridian mode is NOT implemented — left/right
    are plain min/max lon (documented deviation; fixture data never
    straddles ±180)."""
    keys = list(group_cols or [])
    valid = F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    lat = F.when(valid, F.col(lat_col).cast("double"))
    lon = F.when(valid, F.col(lon_col).cast("double"))
    aggs = [
        F.max(lat).alias("top"),
        F.min(lon).alias("left"),
        F.min(lat).alias("bottom"),
        F.max(lon).alias("right"),
        F.sum(valid.cast("long")).alias("n_points"),
    ]
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def geo_centroid(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """ES `geo_centroid` aggregation: arithmetic mean coordinate of the
    points per group (ES's definition — a flat average of lat and lon,
    not a spherical centroid; fine away from poles/antimeridian, same
    caveat ES documents). Rows with a NULL in EITHER coordinate are
    skipped whole (a half-coordinate must not skew one axis); `count`
    matches ES's reported point count."""
    keys = list(group_cols or [])
    valid = F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    lat = F.when(valid, F.col(lat_col).cast("double"))
    lon = F.when(valid, F.col(lon_col).cast("double"))
    aggs = [
        F.avg(lat).alias("lat"),
        F.avg(lon).alias("lon"),
        F.sum(valid.cast("long")).alias("count"),
    ]
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def geo_distance_facets(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    origin_lat: float,
    origin_lon: float,
    ranges_km: list[tuple],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group_cols..., bucket, n_docs) — the ES `geo_distance`
    aggregation: ring buckets by haversine distance from an origin,
    half-open [from, to) in km, open ends via None. ES semantics kept
    exactly: requested rings may overlap (a point counts in every ring
    containing it), EVERY requested ring appears in the output even at
    zero count, and rows with NULL coordinates are ignored.

    Bucket labels are '[lo,hi)' with '*' for an open side. Plan: the
    distance is scan-side column algebra; ring membership explodes at
    most len(ranges_km) rows per point into one map-side-combined
    groupBy; the zero-fill is a broadcast cross-join of the (bounded)
    distinct group set with the ring list."""
    if not ranges_km:
        raise ValueError("ranges_km must name at least one ring")
    group_cols = list(group_cols or [])

    def _lbl(lo, hi):
        ls = "*" if lo is None else f"{float(lo):g}"
        hs = "*" if hi is None else f"{float(hi):g}"
        return f"[{ls},{hs})"

    dist = haversine_km(lat_col, lon_col, origin_lat, origin_lon)
    membership = F.array(*[
        F.when(
            (F.lit(True) if lo is None else (dist >= F.lit(float(lo))))
            & (F.lit(True) if hi is None else (dist < F.lit(float(hi)))),
            F.lit(_lbl(lo, hi)),
        )
        for lo, hi in ranges_km
    ])
    pts = df.where(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    )
    counts = (
        pts.select(
            *group_cols,
            F.explode(F.filter(membership, lambda x: x.isNotNull()))
            .alias("bucket"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    rings = pts.sparkSession.createDataFrame(
        [(_lbl(lo, hi),) for lo, hi in ranges_km], "bucket string"
    )
    if group_cols:
        grid = pts.select(*group_cols).distinct().crossJoin(
            F.broadcast(rings)
        )
    else:
        grid = rings
    return grid.join(counts, group_cols + ["bucket"], "left").select(
        *group_cols, "bucket",
        F.coalesce("n_docs", F.lit(0).cast("long")).alias("n_docs"),
    )


def geo_line(
    points: DataFrame,
    lat_col: str,
    lon_col: str,
    sort_col: str,
    group_cols: list[str],
    size: int = 10000,
) -> DataFrame:
    """ES `geo_line` aggregation: per group, the track connecting the
    points ordered ascending by sort_col (ES sort_order=ASC), truncated
    to the `size` points with the SMALLEST sort values when the group
    overflows (ES keeps by sort order and reports complete=false).
    Sort ties break on (lon, lat) so the track is deterministic — ES
    leaves tie order to shard iteration, which an oracle can't replay.
    Rows with a NULL coordinate or sort value carry no position on the
    track and are dropped.

    Output per group: (group_cols..., line, n_points, complete) where
    line is WKT — 'LINESTRING (lon lat, lon lat, ...)' with %.2f
    coordinates (the synthetic grids are 0.01-degree; WKT is lon-first).
    Single-point groups still emit (degenerate one-coordinate string),
    matching ES's behavior of returning whatever track exists.

    Plan: one window ranks points within the group, the size cap
    filters BEFORE the collect (per-group state is bounded by `size`,
    never by the group's raw point count), then one groupBy packs the
    capped track; array_sort orders inside the JVM. Two exchanges on
    the same key; no UDF."""
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    s, la, lo = F.col(sort_col), F.col(lat_col), F.col(lon_col)
    w = Window.partitionBy(*group_cols).orderBy(
        s.asc(), lo.asc(), la.asc()
    )
    wg = Window.partitionBy(*group_cols)
    ranked = points.where(
        s.isNotNull() & la.isNotNull() & lo.isNotNull()
    ).select(
        *group_cols,
        s.alias("_s"), la.alias("_la"), lo.alias("_lo"),
        F.row_number().over(w).alias("_r"),
        F.count(F.lit(1)).over(wg).alias("_n"),
    )
    packed = (
        ranked.where(F.col("_r") <= size)
        .groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_s", "_lo", "_la"))
            ).alias("_pts"),
            F.max("_n").alias("_total"),
        )
    )
    coord = lambda p: F.concat(  # noqa: E731
        F.format_number(p["_lo"], 2), F.lit(" "), F.format_number(p["_la"], 2)
    )
    return packed.select(
        *group_cols,
        F.concat(
            F.lit("LINESTRING ("),
            F.array_join(F.transform("_pts", coord), ", "),
            F.lit(")"),
        ).alias("line"),
        F.size("_pts").cast("int").alias("n_points"),
        (F.col("_total") <= F.lit(size)).alias("complete"),
    )
