"""t_test hit aggregation, rate / geo_distance / date_range bucket
aggregations, and the distance_feature query fold."""

import math

import pytest

# ------------------------------------------------------------- hit_t_test


def _ab(spark):
    run = spark.createDataFrame(
        [("q1", str(i)) for i in range(4)] + [("solo", "9")],
        "query_id string, doc_id string",
    )
    docs = spark.createDataFrame(
        [("0", 3.0, 1.0), ("1", 5.0, 2.0), ("2", 7.0, 3.0),
         ("3", None, 4.0), ("9", 1.0, 1.0)],
        "doc_id string, a double, b double",
    )
    return run, docs


def test_t_test_paired(spark):
    from openmatch_spark.query import hit_t_test

    run, docs = _ab(spark)
    out = {r["query_id"]: r
           for r in hit_t_test(run, docs, "a", "b", mode="paired").collect()}
    r = out["q1"]
    # NULL-a row dropped; d = 2,3,4 -> t = 3 / (1/sqrt(3)) = 3*sqrt(3)
    assert (r["n_a"], r["n_b"], r["df"]) == (3, 3, 2.0)
    assert abs(r["t_stat"] - 3.0 * math.sqrt(3.0)) < 1e-12
    # single pair -> degenerate, NULL t
    assert out["solo"]["t_stat"] is None


def test_t_test_unpaired_modes(spark):
    from openmatch_spark.query import hit_t_test

    run = spark.createDataFrame(
        [("q1", str(i)) for i in range(4)], "query_id string, doc_id string"
    )
    docs = spark.createDataFrame(
        [("0", 1.0, 2.0), ("1", 2.0, 4.0), ("2", 3.0, 6.0),
         ("3", None, 8.0)],
        "doc_id string, a double, b double",
    )
    pooled = hit_t_test(run, docs, "a", "b", mode="homoscedastic").collect()[0]
    # a = 1,2,3 (m=2, v=1); b = 2,4,6,8 (m=5, v=20/3)
    sp2 = (2 * 1.0 + 3 * 20.0 / 3.0) / 5.0
    exp_t = (2.0 - 5.0) / math.sqrt(sp2 * (1 / 3 + 1 / 4))
    assert (pooled["n_a"], pooled["n_b"], pooled["df"]) == (3, 4, 5.0)
    assert abs(pooled["t_stat"] - exp_t) < 1e-12
    welch = hit_t_test(run, docs, "a", "b").collect()[0]  # default mode
    se2 = 1.0 / 3 + (20.0 / 3) / 4
    assert abs(welch["t_stat"] - (2.0 - 5.0) / math.sqrt(se2)) < 1e-12
    exp_df = se2 * se2 / ((1.0 / 3) ** 2 / 2 + ((20.0 / 3) / 4) ** 2 / 3)
    assert abs(welch["df"] - exp_df) < 1e-12
    with pytest.raises(ValueError):
        hit_t_test(run, docs, "a", "b", mode="welch")


# ------------------------------------------------------------ bucket_rate


def test_bucket_rate_calendar_spans(spark):
    from openmatch_spark.operators.pipeline_aggs import bucket_rate

    b = spark.createDataFrame(
        [("2024-01-01 00:00:00", 62.0), ("2024-02-01 00:00:00", 58.0)],
        "bucket string, n double",
    )
    # month buckets -> per-day rate divides by the TRUE month length
    # (31 for Jan, 29 for leap-year Feb)
    out = {r["bucket"]: r["rate"] for r in
           bucket_rate(b, "n", "bucket", "month", "day").collect()}
    assert out["2024-01-01 00:00:00"] == 2.0
    assert out["2024-02-01 00:00:00"] == 2.0
    # per-month rate of a month bucket is identity
    idm = {r["bucket"]: r["rate"] for r in
           bucket_rate(b, "n", "bucket", "month", "month").collect()}
    assert idm["2024-01-01 00:00:00"] == 62.0
    # week bucket -> per-day rate divides by 7
    wk = spark.createDataFrame(
        [("2024-01-01 00:00:00", 14.0)], "bucket string, n double"
    )
    assert bucket_rate(wk, "n", "bucket", "week", "day").collect()[0][
        "rate"] == 2.0
    # year bucket -> per-quarter rate divides by 4
    yr = spark.createDataFrame(
        [("2024-01-01 00:00:00", 8.0)], "bucket string, n double"
    )
    assert bucket_rate(yr, "n", "bucket", "year", "quarter").collect()[0][
        "rate"] == 2.0
    with pytest.raises(ValueError):
        bucket_rate(b, "n", "bucket", "fortnight", "day")
    with pytest.raises(ValueError):
        bucket_rate(b, "n", "bucket", "month", "furlong")


# ----------------------------------------------------- geo_distance rings


def test_geo_distance_facets_rings(spark):
    from openmatch_spark.operators.geo import geo_distance_facets

    pts = spark.createDataFrame(
        # ~0 km, ~111 km north, ~1113 km north, NULL coords
        [("g1", 0.0, 0.0), ("g1", 1.0, 0.0), ("g2", 10.0, 0.0),
         ("g2", None, None)],
        "grp string, lat double, lon double",
    )
    out = {(r["grp"], r["bucket"]): r["n_docs"] for r in geo_distance_facets(
        pts, "lat", "lon", 0.0, 0.0,
        [(None, 500.0), (500.0, None)], group_cols=["grp"],
    ).collect()}
    # every requested ring present per group, zeros included, NULLs ignored
    assert out == {
        ("g1", "[*,500)"): 2, ("g1", "[500,*)"): 0,
        ("g2", "[*,500)"): 0, ("g2", "[500,*)"): 1,
    }
    # overlapping rings double-count (ES allows overlap)
    ov = {r["bucket"]: r["n_docs"] for r in geo_distance_facets(
        pts.where("grp = 'g1'"), "lat", "lon", 0.0, 0.0,
        [(0.0, 500.0), (0.0, None)],
    ).collect()}
    assert ov == {"[0,500)": 2, "[0,*)": 2}
    with pytest.raises(ValueError):
        geo_distance_facets(pts, "lat", "lon", 0.0, 0.0, [])


# -------------------------------------------------------- date_range agg


def test_date_range_facets(spark):
    from openmatch_spark.operators.facets import date_range_facets

    run = spark.createDataFrame(
        [("q1", "a"), ("q1", "b"), ("q1", "c"), ("q2", "a")],
        "query_id string, doc_id string",
    )
    docs = spark.createDataFrame(
        [("a", "2024-01-15 00:00:00"), ("b", "2024-03-01 00:00:00"),
         ("c", None)],
        "doc_id string, ts string",
    )
    ranges = [
        (None, "2024-03-01 00:00:00"),                       # a only ('to' exclusive)
        ("2024-01-01 00:00:00", "2024-06-01 00:00:00"),      # a and b
        ("2024-06-01 00:00:00", None),                       # empty
    ]
    out = {(r["query_id"], r["bucket"]): r["n_docs"]
           for r in date_range_facets(run, docs, "ts", ranges).collect()}
    assert out[("q1", "*..2024-03-01 00:00:00")] == 1
    assert out[("q1", "2024-01-01 00:00:00..2024-06-01 00:00:00")] == 2
    assert out[("q1", "2024-06-01 00:00:00..*")] == 0
    # q2's single hit; all three requested ranges still present
    assert out[("q2", "*..2024-03-01 00:00:00")] == 1
    assert len([k for k in out if k[0] == "q2"]) == 3
    with pytest.raises(ValueError):
        date_range_facets(run, docs, "ts", [])


# -------------------------------------------------- distance_feature fold


def test_distance_feature_numeric_and_missing(spark):
    from openmatch_spark.query import distance_feature_rescore

    run = spark.createDataFrame(
        [("q1", "a", 1.0), ("q1", "b", 1.0), ("q1", "c", 1.0)],
        "query_id string, doc_id string, score double",
    )
    docs = spark.createDataFrame(
        [("a", 100.0), ("b", 110.0)], "doc_id string, ts double"
    )
    out = {r["doc_id"]: (r["score"], r["rank"])
           for r in distance_feature_rescore(
               run, docs, "ts", origin=100.0, pivot=10.0, boost=2.0
           ).collect()}
    # a at distance 0: +2.0; b at 10: +2*10/20 = +1.0; c missing: +0
    assert out["a"] == (3.0, 1)
    assert out["b"] == (2.0, 2)
    assert out["c"] == (1.0, 3)


def test_distance_feature_geo(spark):
    from openmatch_spark.query import distance_feature_rescore

    run = spark.createDataFrame(
        [("q1", "a", 1.0), ("q1", "b", 1.0)],
        "query_id string, doc_id string, score double",
    )
    docs = spark.createDataFrame(
        [("a", 0.0, 0.0), ("b", None, 0.0)],
        "doc_id string, lat double, lon double",
    )
    out = {r["doc_id"]: r["score"] for r in distance_feature_rescore(
        run, docs, field="", origin=0.0, pivot=100.0, boost=5.0,
        lat_lon=("lat", "lon"), geo_origin=(0.0, 0.0),
    ).collect()}
    assert out["a"] == 6.0  # zero distance -> full boost
    assert out["b"] == 1.0  # NULL coordinate -> no boost
    with pytest.raises(ValueError):
        distance_feature_rescore(run, docs, "ts", 0.0, 10.0,
                                 lat_lon=("lat", "lon"))
    with pytest.raises(ValueError):
        distance_feature_rescore(run, docs, "ts", 0.0, 0.0)
