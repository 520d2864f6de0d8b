"""Geo column algebra + operators: haversine, geotile cells, bounding
boxes, geo_distance search, geotile_grid aggregation."""

import pytest

import pyspark.sql.functions as F

from openmatch_spark.functions.geo import (
    geotile_cell,
    haversine_km,
    in_bounding_box,
)
from openmatch_spark.operators.geo import (
    geo_bounding_box_filter,
    geo_distance_search,
    geotile_grid_facets,
)


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_haversine_known_values(spark):
    # one degree of longitude at the equator ~ 111.19 km
    assert _eval(spark, haversine_km(0.0, 0.0, 0.0, 1.0)) == pytest.approx(
        111.19, abs=0.05
    )
    # same point -> 0; antipodal -> half the circumference (~20,015 km)
    assert _eval(spark, haversine_km(12.5, -7.25, 12.5, -7.25)) == 0.0
    assert _eval(spark, haversine_km(0.0, 0.0, 0.0, 180.0)) == pytest.approx(
        20015.1, abs=0.5
    )
    # symmetric
    d1 = _eval(spark, haversine_km(48.85, 2.35, 40.71, -74.0))
    d2 = _eval(spark, haversine_km(40.71, -74.0, 48.85, 2.35))
    assert d1 == pytest.approx(d2, rel=1e-12)
    assert d1 == pytest.approx(5837.0, abs=10)  # Paris -> NYC


def test_geotile_cells(spark):
    assert _eval(spark, geotile_cell(F.lit(37.0), F.lit(-122.0), 0)) == "0/0/0"
    # equator/prime-meridian corner at zoom 1: x=1, y=1 (y grows southward)
    assert _eval(spark, geotile_cell(F.lit(0.0), F.lit(0.0), 1)) == "1/1/1"
    # poles clamp to the projection edge, lon=180 clamps to the last column
    assert _eval(spark, geotile_cell(F.lit(90.0), F.lit(0.0), 3)) == "3/4/0"
    assert _eval(spark, geotile_cell(F.lit(-90.0), F.lit(0.0), 3)) == "3/4/7"
    assert _eval(spark, geotile_cell(F.lit(0.0), F.lit(180.0), 3)) == "3/7/4"
    with pytest.raises(ValueError):
        geotile_cell(F.lit(0.0), F.lit(0.0), 30)


def test_bounding_box_antimeridian(spark):
    def hit(lat, lon, **box):
        return _eval(spark, in_bounding_box(F.lit(lat), F.lit(lon), **box))

    box = dict(top=10.0, left=170.0, bottom=-10.0, right=-170.0)
    assert hit(0.0, 175.0, **box)
    assert hit(0.0, -175.0, **box)
    assert not hit(0.0, 0.0, **box)
    assert not hit(20.0, 175.0, **box)  # latitude out
    # normal box, edges inclusive
    nbox = dict(top=1.0, left=-1.0, bottom=-1.0, right=1.0)
    assert hit(1.0, 1.0, **nbox)
    assert not hit(1.0001, 0.0, **nbox)


@pytest.fixture(scope="module")
def points(spark):
    rows = [
        ("p1", 0.0, 0.0),
        ("p2", 0.0, 1.0),      # ~111 km from p1
        ("p3", 0.0, 10.0),     # ~1112 km
        ("p4", 50.0, 50.0),    # far
        ("p5", None, 3.0),     # null lat -> never matches
    ]
    return spark.createDataFrame(rows, "doc_id string, lat double, lon double")


def test_geo_distance_search_radius_and_k(points):
    got = geo_distance_search(points, "lat", "lon", 0.0, 0.0,
                              radius_km=2000.0, k=10).collect()
    assert [r["doc_id"] for r in got] == ["p1", "p2", "p3"]
    assert got[0]["distance_km"] == 0.0
    assert got[1]["distance_km"] == pytest.approx(111.19, abs=0.05)
    # k alone cuts nearest-first without a radius
    top2 = geo_distance_search(points, "lat", "lon", 0.0, 0.0, k=2).collect()
    assert [r["doc_id"] for r in top2] == ["p1", "p2"]


def test_geo_distance_search_validates(points):
    with pytest.raises(ValueError):
        geo_distance_search(points, "lat", "lon", 0.0, 0.0)
    with pytest.raises(ValueError):
        geo_distance_search(points, "lat", "lon", 0.0, 0.0, radius_km=-1.0)
    with pytest.raises(ValueError):
        geo_distance_search(points, "lat", "lon", 0.0, 0.0, k=0)


def test_geo_bounding_box_filter(points):
    got = geo_bounding_box_filter(points, "lat", "lon",
                                  top=5.0, left=-5.0, bottom=-5.0, right=5.0)
    assert {r["doc_id"] for r in got.collect()} == {"p1", "p2"}


def test_geotile_grid_counts(points):
    # zoom 2: p1/p2/p3 share tile (2/2/1)? x=floor((lon+180)/360*4)
    out = {r["cell"]: r["n_docs"]
           for r in geotile_grid_facets(points, "lat", "lon", 2).collect()}
    assert sum(out.values()) == 4  # null-lat row dropped
    assert out["2/2/2"] >= 2  # equator points land in row y=2 at zoom 2
    with pytest.raises(ValueError):
        geotile_grid_facets(points, "lat", "lon", 2, size=0)


def _ref_geohash(lat, lon, precision):
    # textbook bisection — the definition every geohash library implements
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
    bits, out, even, ch = 0, [], True, 0
    while len(out) < precision:
        rng, v = (lon_rng, lon) if even else (lat_rng, lat)
        mid = (rng[0] + rng[1]) / 2
        ch <<= 1
        if v >= mid:
            ch |= 1
            rng[0] = mid
        else:
            rng[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(b32[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_cell_matches_bisection_reference(spark):
    from openmatch_spark.functions.geo import geohash_cell

    assert _ref_geohash(57.64911, 10.40744, 11) == "u4pruydqqvj"  # wiki golden
    pts = [
        (57.64911, 10.40744), (0.0, 0.0), (90.0, 180.0), (-90.0, -180.0),
        (89.99, 179.99), (45.0, 90.0), (-33.87, 151.21), (0.0001, -0.0001),
    ] + [
        (-80.0 + (i * 37 % 16000) / 100.0, -180.0 + (i * 7919 % 36000) / 100.0)
        for i in range(1, 50)
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for p in (1, 2, 5, 11, 12):  # odd totals, 5-bit boundary, >53-bit word
        got = [r[0] for r in df.select(geohash_cell("lat", "lon", p)).collect()]
        assert got == [_ref_geohash(la, lo, p) for la, lo in pts], p


def test_geohash_cell_null_and_validation(spark):
    from openmatch_spark.functions.geo import geohash_cell

    r = spark.createDataFrame(
        [(None, 1.0), (1.0, None), (1.0, 1.0)], "lat double, lon double"
    ).select(geohash_cell("lat", "lon", 4)).collect()
    assert [x[0] for x in r][:2] == [None, None]
    assert r[2][0] == _ref_geohash(1.0, 1.0, 4)
    with pytest.raises(ValueError, match="precision"):
        geohash_cell("lat", "lon", 0)
    with pytest.raises(ValueError, match="precision"):
        geohash_cell("lat", "lon", 13)


def test_geohash_grid_facets_counts_and_order(spark):
    from openmatch_spark.operators.geo import geohash_grid_facets

    # three points share a precision-2 cell, two share another, one alone
    pts = [(10.001, 10.001), (10.002, 10.002), (10.003, 10.001),
           (-40.0, 100.0), (-40.001, 100.001), (70.0, -120.0),
           (None, 5.0), (5.0, None)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    out = geohash_grid_facets(df, "lat", "lon", precision=2).collect()
    got = {r["cell"]: (r["n_docs"], r["pos"]) for r in out}
    c3 = _ref_geohash(10.001, 10.001, 2)
    c2 = _ref_geohash(-40.0, 100.0, 2)
    c1 = _ref_geohash(70.0, -120.0, 2)
    assert got[c3] == (3, 1) and got[c2] == (2, 2) and got[c1] == (1, 3)
    assert sum(n for n, _ in got.values()) == 6  # NULL coordinates dropped
    top = geohash_grid_facets(df, "lat", "lon", precision=2, size=2).collect()
    assert [r["cell"] for r in sorted(top, key=lambda r: r["pos"])] == [c3, c2]
