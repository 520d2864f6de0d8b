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
