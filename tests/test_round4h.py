"""Round-4 additions: ES pipeline aggregations (derivative, cumulative
sum, moving window, serial diff, bucket script/selector/sort)."""

import pytest

from openmatch_spark.operators.pipeline_aggs import (
    bucket_script,
    bucket_selector,
    bucket_sort,
    cumulative_sum,
    derivative,
    moving_fn,
    serial_diff,
)


@pytest.fixture(scope="module")
def buckets(spark):
    # two parents; q1's monthly hit counts 4, 1, 3, 2; q2 has one bucket
    return spark.createDataFrame(
        [
            ("q1", "2024-01", 4),
            ("q1", "2024-02", 1),
            ("q1", "2024-03", 3),
            ("q1", "2024-04", 2),
            ("q2", "2024-02", 7),
        ],
        "query_id string, bucket string, n long",
    )


def _by_bucket(df, parent="q1"):
    rows = df.where(df.query_id == parent).collect()
    return {r["bucket"]: r for r in sorted(rows, key=lambda r: r["bucket"])}


def test_derivative_first_bucket_null(buckets):
    out = _by_bucket(derivative(buckets, "n", "bucket", ["query_id"], "d"))
    assert out["2024-01"]["d"] is None
    assert out["2024-02"]["d"] == -3.0
    assert out["2024-03"]["d"] == 2.0
    assert out["2024-04"]["d"] == -1.0


def test_derivative_partitions_do_not_leak(buckets):
    out = derivative(buckets, "n", "bucket", ["query_id"], "d")
    q2 = out.where(out.query_id == "q2").collect()
    assert len(q2) == 1 and q2[0]["d"] is None  # not diffed against q1


def test_cumulative_sum_inclusive(buckets):
    out = _by_bucket(cumulative_sum(buckets, "n", "bucket", ["query_id"], "c"))
    assert [out[b]["c"] for b in sorted(out)] == [4.0, 5.0, 8.0, 10.0]


def test_serial_diff_lag2(buckets):
    out = _by_bucket(
        serial_diff(buckets, "n", "bucket", ["query_id"], lag=2, out_col="s")
    )
    assert out["2024-01"]["s"] is None and out["2024-02"]["s"] is None
    assert out["2024-03"]["s"] == -1.0  # 3 - 4
    assert out["2024-04"]["s"] == 1.0   # 2 - 1


def test_moving_fn_excludes_current_at_shift0(buckets):
    out = _by_bucket(
        moving_fn(buckets, "n", "bucket", ["query_id"],
                  fn="avg", window=2, shift=0, out_col="m")
    )
    # window = the two buckets strictly before the current one
    assert out["2024-01"]["m"] is None
    assert out["2024-02"]["m"] == 4.0          # [4]
    assert out["2024-03"]["m"] == 2.5          # [4, 1]
    assert out["2024-04"]["m"] == 2.0          # [1, 3]


def test_moving_fn_shift1_includes_current(buckets):
    out = _by_bucket(
        moving_fn(buckets, "n", "bucket", ["query_id"],
                  fn="max", window=2, shift=1, out_col="m")
    )
    assert out["2024-01"]["m"] == 4.0          # [4]
    assert out["2024-02"]["m"] == 4.0          # [4, 1]
    assert out["2024-03"]["m"] == 3.0          # [1, 3]
    assert out["2024-04"]["m"] == 3.0          # [3, 2]


def test_moving_fn_rejects_bad_args(buckets):
    with pytest.raises(ValueError):
        moving_fn(buckets, "n", "bucket", ["query_id"], fn="median")
    with pytest.raises(ValueError):
        moving_fn(buckets, "n", "bucket", ["query_id"], window=0)


def test_bucket_script_and_selector(buckets):
    scripted = bucket_script(buckets, "ratio", "n / 4.0")
    kept = bucket_selector(scripted, "ratio >= 0.75")
    got = {(r["query_id"], r["bucket"]) for r in kept.collect()}
    assert got == {("q1", "2024-01"), ("q1", "2024-03"), ("q2", "2024-02")}


def test_bucket_sort_slice_and_position(buckets):
    out = bucket_sort(
        buckets, ["query_id"],
        sort=[("n", "desc"), ("bucket", "asc")],
        size=2, pos_col="pos",
    )
    q1 = {r["pos"]: r["bucket"] for r in out.where(out.query_id == "q1").collect()}
    assert q1 == {1: "2024-01", 2: "2024-03"}


def test_bucket_sort_from_pages(buckets):
    page2 = bucket_sort(
        buckets, ["query_id"],
        sort=[("n", "desc"), ("bucket", "asc")],
        size=2, from_=2,
    )
    q1 = [r["bucket"] for r in page2.where(page2.query_id == "q1").collect()]
    assert sorted(q1) == ["2024-02", "2024-04"]
    # pos_col omitted -> helper column dropped
    assert "_pos" not in page2.columns


def test_bucket_sort_validates(buckets):
    with pytest.raises(ValueError):
        bucket_sort(buckets, ["query_id"], sort=[])
    with pytest.raises(ValueError):
        bucket_sort(buckets, ["query_id"], sort=[("n", "down")])
    with pytest.raises(ValueError):
        bucket_sort(buckets, ["query_id"], sort=[("n", "desc")], from_=-1)
