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


GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_cell(lat, lon, precision: int) -> Column:
    """Standard geohash (Niemeyer base32) of length `precision` — the
    key format of ES's geohash_grid aggregation. The textbook bisection
    recurrence in closed form: each coordinate quantized to the floor
    bin of its bit half (lon gets ceil(5p/2) bits, lat floor(5p/2)),
    the two halves interleaved lon-first MSB-first into one ≤60-bit
    word (precision ≤ 12), 5 bits per base32 character.

    Pure integer column algebra (floor + shift + mask inside
    whole-stage codegen, no UDF), with the double arithmetic written in
    the exact literal order a SQL oracle replays — so Spark, DuckDB,
    and any reference geohash library agree character-for-character.
    lat=90 / lon=180 clamp into the last bin (the standard convention);
    NULL coordinates yield NULL."""
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in [1, 12], got {precision}")
    total = 5 * precision
    nlon = (total + 1) // 2  # lon owns the even (first) interleave slots
    nlat = total // 2
    latd = _lit(lat).cast("double")
    lond = _lit(lon).cast("double")

    # The naive floor((v - lo) / range * 2^n) suffers 3 float roundings
    # and can land one bin off the canonical bisection near boundaries
    # (the wiki point 57.64911,10.40744 @11 chars ends 'h' not 'j').
    # Bin boundaries ARE exact doubles (range/2^n = 45·2^k, so every
    # k·width+lo is exact), so one ±1 correction against the exact
    # boundary recovers bisection exactly — closed form, no recursion,
    # same ops a SQL oracle replays verbatim.
    def _quantize(v, vmin: float, vrange: float, n: int):
        width = vrange / (2 ** n)  # exact python double (45 · 2^k)
        top = F.lit(2 ** n - 1)
        k0 = F.greatest(
            F.least(
                F.floor((v - F.lit(vmin)) / F.lit(vrange) * F.lit(float(2 ** n))),
                top,
            ),
            F.lit(0),
        ).cast("long")
        lo_edge = k0.cast("double") * F.lit(width) + F.lit(vmin)
        hi_edge = (k0 + 1).cast("double") * F.lit(width) + F.lit(vmin)
        k1 = (
            F.when(v < lo_edge, k0 - 1)
            .when(v >= hi_edge, k0 + 1)
            .otherwise(k0)
        )
        return F.greatest(F.least(k1, top), F.lit(0)).cast("long")

    lat_bits = _quantize(latd, -90.0, 180.0, nlat)
    lon_bits = _quantize(lond, -180.0, 360.0, nlon)
    # Interleave via ONE aggregate() fold with the bit words bound once
    # in the fold state (an unrolled 5p-term sum would inline the floor
    # expressions 5p times and overflow janino's generated-method limit,
    # and a combined 5p-bit word exceeds double-exact range at p ≥ 11).
    # Bits stream MSB-first into a 5-bit register flushed to a base32
    # char — every intermediate stays < 2^30, exact in the double
    # divisions that stand in for shifts.
    alphabet = F.array(*[F.lit(c) for c in GEOHASH_BASE32])

    def _step(st, j):
        even = j % 2 == 0
        word = F.when(even, st["lo"]).otherwise(st["la"])
        idx = (
            F.when(even, F.lit(nlon - 1)).otherwise(F.lit(nlat - 1))
            - F.floor(j / 2).cast("int")
        )
        bit = (
            F.floor(word / F.pow(F.lit(2.0), idx.cast("double"))).cast("long")
            % 2
        )
        cur2 = st["cur"] * 2 + bit
        flush = j % 5 == 4  # total = 5p, so the last bit always flushes
        return F.struct(
            st["lo"].alias("lo"),
            st["la"].alias("la"),
            F.when(flush, F.lit(0).cast("long")).otherwise(cur2).alias("cur"),
            F.when(
                flush,
                F.concat(
                    st["s"], F.element_at(alphabet, cur2.cast("int") + 1)
                ),
            )
            .otherwise(st["s"])
            .alias("s"),
        )

    cell = F.aggregate(
        F.sequence(F.lit(0), F.lit(total - 1)),
        F.struct(
            lon_bits.alias("lo"),
            lat_bits.alias("la"),
            F.lit(0).cast("long").alias("cur"),
            F.lit("").alias("s"),
        ),
        _step,
        lambda st: st["s"],
    )
    # least/greatest skip NULLs (they'd resolve to the clamp bound), so
    # NULL propagation needs the explicit guard
    return F.when(latd.isNotNull() & lond.isNotNull(), cell)


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
