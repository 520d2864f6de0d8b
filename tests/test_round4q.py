"""change_point: step-change detection over ordered bucket series."""

import pytest


def _series(spark, rows):
    return spark.createDataFrame(
        [(g, f"b{i:02d}", float(v)) for g, series in rows
         for i, v in enumerate(series)],
        "g string, bucket string, v double",
    )


def test_change_point_clean_step(spark):
    from openmatch_spark.operators.pipeline_aggs import change_point

    b = _series(spark, [("up", [1, 1, 1, 5, 5, 5])])
    r = change_point(b, "v", "bucket", ["g"]).collect()[0]
    assert r["type"] == "step_change"
    # the new regime starts at the 4th bucket
    assert r["change_bucket"] == "b03"
    assert r["left_mean"] == 1.0 and r["right_mean"] == 5.0
    assert abs(r["reduction_ratio"] - 1.0) < 1e-12


def test_change_point_stationary_constant_and_short(spark):
    from openmatch_spark.operators.pipeline_aggs import change_point

    b = _series(spark, [
        ("flat", [3, 3, 3, 3, 3]),          # zero SSE -> stationary
        ("noise", [1, 2, 1, 2, 1, 2]),      # no real step
        ("short", [1, 9, 9]),               # < 2*min_segment buckets
    ])
    out = {r["g"]: r for r in change_point(b, "v", "bucket", ["g"]).collect()}
    assert out["flat"]["type"] == "stationary"
    assert out["flat"]["change_bucket"] is None
    assert out["noise"]["type"] == "stationary"
    assert out["short"]["type"] == "indeterminable"
    # min_segment=1 makes the short series decidable
    loose = {r["g"]: r for r in change_point(
        b, "v", "bucket", ["g"], min_segment=1).collect()}
    assert loose["short"]["type"] == "step_change"
    assert loose["short"]["change_bucket"] == "b01"
    with pytest.raises(ValueError):
        change_point(b, "v", "bucket", ["g"], min_segment=0)
    with pytest.raises(ValueError):
        change_point(b, "v", "bucket", ["g"], threshold=0.0)


def test_change_point_picks_best_split_earliest_tie(spark):
    from openmatch_spark.operators.pipeline_aggs import change_point

    # step at index 2 (values 0,0 | 10,10,10,10): the exact split wins
    b = _series(spark, [("s", [0, 0, 10, 10, 10, 10])])
    r = change_point(b, "v", "bucket", ["g"]).collect()[0]
    assert r["change_bucket"] == "b02"
    assert abs(r["reduction_ratio"] - 1.0) < 1e-12


def test_categorize_text_patterns(spark):
    from openmatch_spark.operators.facets import categorize_text

    logs = spark.createDataFrame(
        [("GET /api/users/17 returned 200 in 5 ms",),
         ("GET /api/users/99 returned 200 in 810 ms",),
         ("get api users 3 returned 4 in 9 ms",),   # same pattern, punct-free
         ("cache miss for key k42",),
         (None,), ("12 34 56",)],                   # all-variable -> empty key
        "msg string",
    )
    out = {r["category"]: r for r in
           categorize_text(logs, "msg").collect()}
    assert out["get api users returned in ms"]["doc_count"] == 3
    assert out["get api users returned in ms"]["n_tokens"] == 6
    assert out["get api users returned in ms"]["rank"] == 1
    assert out["cache miss for key"]["doc_count"] == 1
    assert out[""]["doc_count"] == 2  # null text and all-digit text


def test_categorize_text_caps_and_pruning(spark):
    from openmatch_spark.operators.facets import categorize_text
    import pytest

    logs = spark.createDataFrame(
        [("alpha beta gamma delta",), ("alpha beta gamma epsilon",),
         ("zeta only once",)],
        "msg string",
    )
    # max_tokens=3 merges the two alpha-beta-gamma variants
    out = {r["category"]: r["doc_count"] for r in
           categorize_text(logs, "msg", max_tokens=3).collect()}
    assert out == {"alpha beta gamma": 2, "zeta only once": 1}
    # min_doc_count prunes BEFORE ranking; top_n cuts after
    kept = categorize_text(logs, "msg", max_tokens=3,
                           min_doc_count=2).collect()
    assert len(kept) == 1 and kept[0]["rank"] == 1
    top = categorize_text(logs, "msg", max_tokens=3, top_n=1).collect()
    assert len(top) == 1 and top[0]["category"] == "alpha beta gamma"
    with pytest.raises(ValueError):
        categorize_text(logs, "msg", min_doc_count=0)
    with pytest.raises(ValueError):
        categorize_text(logs, "msg", max_tokens=0)


def test_bucket_count_ks_test(spark):
    from openmatch_spark.operators.pipeline_aggs import bucket_count_ks_test

    b = _series(spark, [
        ("uni", [2, 2, 2, 2]),      # exactly uniform -> all D = 0
        ("front", [8, 0, 0, 0]),    # mass up front -> d_greater = 0.75
        ("back", [0, 0, 0, 8]),     # mass at the back -> d_less = 0.75
        ("zero", [0, 0, 0]),        # zero total -> NULL distances
    ])
    out = {r["g"]: r for r in
           bucket_count_ks_test(b, "v", "bucket", ["g"]).collect()}
    assert out["uni"]["d_two_sided"] == 0.0
    assert abs(out["front"]["d_greater"] - 0.75) < 1e-12
    assert out["front"]["d_less"] == 0.0
    assert abs(out["back"]["d_less"] - 0.75) < 1e-12
    assert out["back"]["d_greater"] == 0.0
    assert out["back"]["n_buckets"] == 4
    assert out["zero"]["d_two_sided"] is None
    assert out["zero"]["d_greater"] is None


def test_bucket_count_ks_test_expected_col(spark):
    from openmatch_spark.operators.pipeline_aggs import bucket_count_ks_test

    # expected fractions matching the actual distribution -> D = 0
    b = spark.createDataFrame(
        [("g", "b0", 1.0, 10.0), ("g", "b1", 3.0, 30.0),
         ("g", "b2", 4.0, 40.0), ("g", "b3", 2.0, 20.0)],
        "g string, bucket string, v double, exp double",
    )
    r = bucket_count_ks_test(
        b, "v", "bucket", ["g"], expected_col="exp").collect()[0]
    assert abs(r["d_two_sided"]) < 1e-12


def test_ip_range_facets(spark):
    from openmatch_spark.operators.facets import (
        _ip_range_bounds, ip_range_facets,
    )
    import pytest

    assert _ip_range_bounds({"mask": "10.1.0.0/16"}) == (
        "10.1.0.0/16", 10 * 2**24 + 2**16, 10 * 2**24 + 2 * 2**16)
    # mask bounds snap to the network base
    assert _ip_range_bounds({"mask": "10.1.5.9/16"})[1:] == (
        10 * 2**24 + 2**16, 10 * 2**24 + 2 * 2**16)
    assert _ip_range_bounds({"from": None, "to": "0.0.0.5"}) == (
        "*..0.0.0.5", 0, 5)
    with pytest.raises(ValueError):
        _ip_range_bounds({"mask": "10.0.0.0/40"})
    with pytest.raises(ValueError):
        _ip_range_bounds({"from": "300.1.1.1", "to": None})

    run = spark.createDataFrame(
        [("q", "a"), ("q", "b"), ("q", "c"), ("q", "d")],
        "query_id string, doc_id string",
    )
    docs = spark.createDataFrame(
        [("a", "10.0.0.1"), ("b", "10.0.255.255"), ("c", "10.1.0.0"),
         ("d", "garbage"), ("e", "10.9.9.9")],   # e not in run
        "doc_id string, ip string",
    )
    out = {(r["query_id"], r["bucket"]): r["n_docs"] for r in ip_range_facets(
        run, docs, "ip",
        [{"mask": "10.0.0.0/16"}, {"from": "10.1.0.0", "to": None},
         {"mask": "192.168.0.0/24"}],
    ).collect()}
    assert out == {("q", "10.0.0.0/16"): 2, ("q", "10.1.0.0..*"): 1,
                   ("q", "192.168.0.0/24"): 0}


def test_geo_line(spark):
    from openmatch_spark.operators.geo import geo_line
    import pytest

    pts = spark.createDataFrame(
        [("a", 3, 10.0, 20.0), ("a", 1, -5.5, 30.25), ("a", 2, 0.0, 0.0),
         ("b", 1, 1.0, 2.0),
         ("b", 2, None, 2.0),        # null coordinate -> dropped
         ("c", None, 9.0, 9.0)],     # null sort -> dropped, group vanishes
        "g string, s int, lat double, lon double",
    )
    out = {r["g"]: r for r in
           geo_line(pts, "lat", "lon", "s", ["g"]).collect()}
    assert out["a"]["line"] == (
        "LINESTRING (30.25 -5.50, 0.00 0.00, 20.00 10.00)")
    assert out["a"]["n_points"] == 3 and out["a"]["complete"] is True
    assert out["b"]["line"] == "LINESTRING (2.00 1.00)"
    assert "c" not in out

    # size cap keeps the SMALLEST sort values and flags incomplete
    capped = geo_line(pts, "lat", "lon", "s", ["g"], size=2).collect()
    a = next(r for r in capped if r["g"] == "a")
    assert a["line"] == "LINESTRING (30.25 -5.50, 0.00 0.00)"
    assert a["n_points"] == 2 and a["complete"] is False
    with pytest.raises(ValueError):
        geo_line(pts, "lat", "lon", "s", ["g"], size=0)


def test_date_histogram_offset_and_tz(spark):
    from openmatch_spark.operators.facets import date_histogram_facets
    import pytest

    run = spark.createDataFrame(
        [("q", "a"), ("q", "b"), ("q", "c")],
        "query_id string, doc_id string",
    )
    docs = spark.createDataFrame(
        [("a", "2024-01-01 05:00:00"),   # before the +6h boundary
         ("b", "2024-01-01 07:00:00"),   # after it
         ("c", "2024-01-01 23:00:00")],  # UTC day 1 but +03:00 day 2
        "doc_id string, warc_ts string",
    )
    plain = {r["bucket"]: r["n_docs"] for r in date_histogram_facets(
        run, docs, "warc_ts", "day").collect()}
    assert plain == {"2024-01-01 00:00:00": 3}
    off = {r["bucket"]: r["n_docs"] for r in date_histogram_facets(
        run, docs, "warc_ts", "day", offset="+6h").collect()}
    assert off == {"2023-12-31 06:00:00": 1, "2024-01-01 06:00:00": 2}
    tz = {r["bucket"]: r["n_docs"] for r in date_histogram_facets(
        run, docs, "warc_ts", "day", time_zone="+03:00").collect()}
    assert tz == {"2024-01-01 00:00:00": 2, "2024-01-02 00:00:00": 1}
    neg = {r["bucket"]: r["n_docs"] for r in date_histogram_facets(
        run, docs, "warc_ts", "hour", offset="-30m").collect()}
    assert neg == {"2024-01-01 04:30:00": 1, "2024-01-01 06:30:00": 1,
                   "2024-01-01 22:30:00": 1}
    with pytest.raises(ValueError, match="offset"):
        date_histogram_facets(run, docs, "warc_ts", "day", offset="6x")
