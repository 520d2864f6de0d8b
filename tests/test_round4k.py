"""Sibling pipeline aggregations (stats/min/max/sum/avg_bucket,
percentiles_bucket, normalize) and the string_stats / MAD / boxplot hit
metric aggregations."""

import math

import pytest

# ---------------------------------------------------- sibling bucket aggs


def _buckets(spark):
    # two parents; q1 has a tie at the max (b1 and b3 both 4.0)
    return spark.createDataFrame(
        [
            ("q1", "b1", 4.0), ("q1", "b2", 1.0), ("q1", "b3", 4.0),
            ("q2", "b1", 2.0),
        ],
        "query_id string, bucket string, n_docs double",
    )


def test_sibling_bucket_stats(spark):
    from openmatch_spark.operators.pipeline_aggs import sibling_bucket_agg

    out = {
        r["query_id"]: r
        for r in sibling_bucket_agg(
            _buckets(spark), "n_docs", "bucket", ["query_id"], fn="stats"
        ).collect()
    }
    r = out["q1"]
    assert (r["n"], r["min"], r["max"], r["avg"], r["sum"]) == (
        3, 1.0, 4.0, 3.0, 9.0
    )
    r2 = out["q2"]
    assert (r2["n"], r2["min"], r2["max"]) == (1, 2.0, 2.0)


def test_sibling_bucket_extremes_report_tied_keys(spark):
    from openmatch_spark.operators.pipeline_aggs import sibling_bucket_agg

    mx = {
        r["query_id"]: (r["value"], r["keys"])
        for r in sibling_bucket_agg(
            _buckets(spark), "n_docs", "bucket", ["query_id"], fn="max"
        ).collect()
    }
    # both buckets attaining the max, ascending, comma-joined
    assert mx["q1"] == (4.0, "b1,b3")
    assert mx["q2"] == (2.0, "b1")
    mn = {
        r["query_id"]: (r["value"], r["keys"])
        for r in sibling_bucket_agg(
            _buckets(spark), "n_docs", "bucket", ["query_id"], fn="min"
        ).collect()
    }
    assert mn["q1"] == (1.0, "b2")


def test_sibling_bucket_scalar_fns_and_validation(spark):
    from openmatch_spark.operators.pipeline_aggs import sibling_bucket_agg

    b = _buckets(spark)
    s = {r["query_id"]: r["value"] for r in sibling_bucket_agg(
        b, "n_docs", "bucket", ["query_id"], fn="sum").collect()}
    assert s == {"q1": 9.0, "q2": 2.0}
    a = {r["query_id"]: r["value"] for r in sibling_bucket_agg(
        b, "n_docs", "bucket", ["query_id"], fn="avg").collect()}
    assert a == {"q1": 3.0, "q2": 2.0}
    with pytest.raises(ValueError):
        sibling_bucket_agg(b, "n_docs", "bucket", ["query_id"], fn="median")


def test_percentiles_bucket_linear_interpolation(spark):
    from openmatch_spark.operators.pipeline_aggs import percentiles_bucket

    b = spark.createDataFrame(
        [("q1", "b%d" % i, float(v)) for i, v in enumerate([1, 2, 3, 4])],
        "query_id string, bucket string, n_docs double",
    )
    out = {
        r["percent"]: r["value"]
        for r in percentiles_bucket(
            b, "n_docs", ["query_id"], percents=(0.0, 50.0, 75.0, 100.0)
        ).collect()
    }
    # linear interpolation at (n-1)*p: p50 of 1..4 = 2.5, p75 = 3.25
    assert out == {0.0: 1.0, 50.0: 2.5, 75.0: 3.25, 100.0: 4.0}
    with pytest.raises(ValueError):
        percentiles_bucket(b, "n_docs", ["query_id"], percents=())
    with pytest.raises(ValueError):
        percentiles_bucket(b, "n_docs", ["query_id"], percents=(101.0,))


def test_normalize_buckets_all_methods(spark):
    from openmatch_spark.operators.pipeline_aggs import normalize_buckets

    b = spark.createDataFrame(
        [("q1", "b1", 1.0), ("q1", "b2", 3.0),
         ("flat", "b1", 5.0), ("flat", "b2", 5.0)],
        "query_id string, bucket string, n_docs double",
    )

    def run(method):
        out = normalize_buckets(b, "n_docs", ["query_id"], method=method)
        return {(r["query_id"], r["bucket"]): r["normalized"]
                for r in out.collect()}

    r01 = run("rescale_0_1")
    assert r01[("q1", "b1")] == 0.0 and r01[("q1", "b2")] == 1.0
    # degenerate span -> NULL, not a division error
    assert r01[("flat", "b1")] is None
    r100 = run("rescale_0_100")
    assert r100[("q1", "b2")] == 100.0
    ps = run("percent_of_sum")
    assert ps[("q1", "b1")] == 0.25 and ps[("flat", "b1")] == 0.5
    mean = run("mean")
    assert mean[("q1", "b1")] == -0.5 and mean[("q1", "b2")] == 0.5
    z = run("z-score")
    assert abs(z[("q1", "b2")] - 1.0) < 1e-12  # (3-2)/1
    assert z[("flat", "b1")] is None  # zero stddev -> NULL
    sm = run("softmax")
    e1, e3 = math.exp(1.0), math.exp(3.0)
    assert abs(sm[("q1", "b2")] - e3 / (e1 + e3)) < 1e-12
    with pytest.raises(ValueError):
        normalize_buckets(b, "n_docs", ["query_id"], method="nope")


# --------------------------------------------- string_stats / MAD / boxplot


def _run_docs(spark):
    run = spark.createDataFrame(
        [("q1", "a"), ("q1", "b"), ("q1", "c"), ("q2", "d")],
        "query_id string, doc_id string",
    )
    docs = spark.createDataFrame(
        [("a", "aab", 10.0), ("b", "ab", 20.0), ("c", None, 300.0),
         ("d", None, 1.0), ("x", "unhit", 7.0)],
        "doc_id string, txt string, val double",
    )
    return run, docs


def test_hit_string_stats(spark):
    from openmatch_spark.query import hit_string_stats

    run, docs = _run_docs(spark)
    out = {r["query_id"]: r
           for r in hit_string_stats(run, docs, "txt").collect()}
    r = out["q1"]
    # two non-NULL strings: 'aab' (3) and 'ab' (2)
    assert (r["n"], r["min_length"], r["max_length"]) == (2, 2, 3)
    assert abs(r["avg_length"] - 2.5) < 1e-12
    # pooled chars a,a,b,a,b -> p(a)=3/5, p(b)=2/5
    exp = -(0.6 * math.log2(0.6) + 0.4 * math.log2(0.4))
    assert abs(r["entropy"] - exp) < 1e-12
    # all-NULL query keeps its row with n=0, NULL stats (ES omits; one
    # flat schema instead)
    r2 = out["q2"]
    assert r2["n"] == 0 and r2["min_length"] is None
    assert r2["entropy"] is None


def test_hit_median_absolute_deviation(spark):
    from openmatch_spark.query import hit_median_absolute_deviation

    run, docs = _run_docs(spark)
    out = {r["query_id"]: r["mad"]
           for r in hit_median_absolute_deviation(run, docs, "val").collect()}
    # q1 values 10,20,300: median 20, |x-med| = 10,0,280 -> median 10
    assert out["q1"] == 10.0
    assert out["q2"] == 0.0


def test_hit_boxplot_whiskers_clamp_to_observations(spark):
    from openmatch_spark.query import hit_boxplot

    run = spark.createDataFrame(
        [("q1", str(i)) for i in range(5)], "query_id string, doc_id string"
    )
    docs = spark.createDataFrame(
        [("0", 1.0), ("1", 2.0), ("2", 3.0), ("3", 4.0), ("4", 100.0)],
        "doc_id string, val double",
    )
    r = hit_boxplot(run, docs, "val").collect()[0]
    assert (r["min"], r["max"]) == (1.0, 100.0)
    assert (r["q1"], r["q2"], r["q3"]) == (2.0, 3.0, 4.0)
    # IQR = 2; fences [-1, 7]; whiskers clamp to actual data: 1 and 4
    # (the 100.0 outlier is outside the upper fence)
    assert (r["lower"], r["upper"]) == (1.0, 4.0)
