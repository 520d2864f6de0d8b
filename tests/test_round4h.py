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


import pyspark.sql.functions as F

from openmatch_spark.operators.facets import composite_facets


@pytest.fixture(scope="module")
def comp_docs(spark):
    rows = [("en", "a", 100), ("en", "a", 120), ("en", "b", 700),
            ("de", "a", 50), ("de", "c", 1400), ("fr", None, 10),
            ("en", "c", 900), ("de", "b", 300), ("en", "d", 20),
            ("zh", "a", 600)]
    return spark.createDataFrame(rows, "lang string, source string, n_chars long")


def _sources():
    return [
        ("lang", "lang"),
        ("source", "source"),
        ("cb", (F.floor(F.col("n_chars") / 500) * 500).cast("long")),
    ]


def test_composite_walk_is_exhaustive_and_disjoint(comp_docs):
    # walk in pages of 3; union of pages == one-shot full enumeration
    full = composite_facets(comp_docs, _sources(), size=100).collect()
    # 10 rows -> 1 null-source dropped (ES missing_bucket=false), the two
    # ("en","a") rows share chars-bucket 0 -> 8 distinct buckets
    assert len(full) == 8
    seen, after = [], None
    while True:
        page = composite_facets(comp_docs, _sources(), size=3, after=after).collect()
        if not page:
            break
        seen.extend(page)
        last = page[-1]
        after = {"lang": last["lang"], "source": last["source"], "cb": last["cb"]}
    assert [tuple(r) for r in seen] == [tuple(r) for r in full]
    keys = [(r["lang"], r["source"], r["cb"]) for r in seen]
    assert len(set(keys)) == len(keys)
    assert keys == sorted(keys)


def test_composite_after_is_strictly_greater(comp_docs):
    full = composite_facets(comp_docs, _sources(), size=100).collect()
    mid = full[3]
    after = {"lang": mid["lang"], "source": mid["source"], "cb": mid["cb"]}
    rest = composite_facets(comp_docs, _sources(), size=100, after=after).collect()
    assert [tuple(r) for r in rest] == [tuple(r) for r in full[4:]]


def test_composite_counts(comp_docs):
    full = {(r["lang"], r["source"], r["cb"]): r["n_docs"]
            for r in composite_facets(comp_docs, _sources(), size=100).collect()}
    assert full[("en", "a", 0)] == 2
    assert full[("de", "c", 1000)] == 1


def test_composite_validates(comp_docs):
    with pytest.raises(ValueError):
        composite_facets(comp_docs, _sources(), size=0)
    with pytest.raises(ValueError):
        composite_facets(comp_docs, [], size=5)
    with pytest.raises(ValueError):
        composite_facets(comp_docs, _sources(), size=5, after={"lang": "en"})
