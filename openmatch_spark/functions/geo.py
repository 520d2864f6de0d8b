"""Geo column algebra: haversine great-circle distance, Web-Mercator
geotile cells, and bounding-box predicates — the expression layer under
the ES geo_distance query / geotile_grid aggregation analogs in
operators/geo.py.

Everything here is a pure Column expression (JVM trig inside
whole-stage codegen, no UDF), so geo predicates stay pushdown-friendly
and a 100 TB scan pays only per-row arithmetic. Formulas follow the
published conventions: haversine on the WGS84 mean radius, geotile keys
"z/x/y" on the Web-Mercator projection exactly as ES's geotile_grid /
OSM slippy-map tiles define them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius
# Web-Mercator is undefined at the poles; ES clamps to +-85.05112878
# (the latitude where the square projection closes)
MERCATOR_MAX_LAT = 85.05112878


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in km between two (degree) points:
    2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))). Accepts column
    names, Columns, or literals (floats)."""
    la1, lo1 = F.radians(_lit(lat1)), F.radians(_lit(lon1))
    la2, lo2 = F.radians(_lit(lat2)), F.radians(_lit(lon2))
    dlat, dlon = la2 - la1, lo2 - lo1
    h = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(la1) * F.cos(la2) * F.pow(F.sin(dlon / 2), 2)
    )
    # guard fp drift pushing h a hair above 1 (antipodal points)
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(F.least(h, F.lit(1.0))))


def _lit(v) -> Column:
    if isinstance(v, Column):
        return v
    if isinstance(v, str):
        return F.col(v)
    return F.lit(float(v))


def geotile_cell(lat, lon, zoom: int) -> Column:
    """'z/x/y' Web-Mercator tile key at `zoom` (ES geotile_grid / OSM
    slippy-map convention):

        x = floor((lon + 180) / 360 · 2^z)
        y = floor((1 − ln(tan φ + sec φ) / π) / 2 · 2^z),  φ = radians(lat)

    both clamped to [0, 2^z − 1] (lon=180 and the pole clamp land on the
    last tile). Latitudes beyond ±85.05112878° are clamped to the
    projection edge first, as ES does. NULL coordinates yield NULL."""
    if not 0 <= zoom <= 29:
        raise ValueError(f"zoom must be in [0, 29], got {zoom}")
    n = F.lit(float(2 ** zoom))
    latc = F.greatest(
        F.least(_lit(lat).cast("double"), F.lit(MERCATOR_MAX_LAT)),
        F.lit(-MERCATOR_MAX_LAT),
    )
    lonc = _lit(lon).cast("double")
    phi = F.radians(latc)
    x = F.floor((lonc + 180.0) / 360.0 * n)
    y = F.floor(
        (1.0 - F.log(F.tan(phi) + 1.0 / F.cos(phi)) / F.lit(3.141592653589793))
        / 2.0 * n
    )
    top = F.lit(2 ** zoom - 1)
    x = F.greatest(F.least(x, top), F.lit(0)).cast("long")
    y = F.greatest(F.least(y, top), F.lit(0)).cast("long")
    return F.concat_ws("/", F.lit(str(zoom)), x.cast("string"), y.cast("string"))


def in_bounding_box(lat, lon, top: float, left: float, bottom: float,
                    right: float) -> Column:
    """ES geo_bounding_box predicate. Handles boxes crossing the
    antimeridian (left > right) by splitting the longitude test, as ES
    does. Edges are inclusive."""
    latp = (_lit(lat) <= F.lit(float(top))) & (_lit(lat) >= F.lit(float(bottom)))
    lo = _lit(lon)
    if left <= right:
        lonp = (lo >= F.lit(float(left))) & (lo <= F.lit(float(right)))
    else:  # box wraps the antimeridian
        lonp = (lo >= F.lit(float(left))) | (lo <= F.lit(float(right)))
    return latp & lonp
