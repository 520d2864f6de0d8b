"""ES metric-aggregation family beside the ranked run: extended_stats,
weighted_avg, value_count, missing, filters, matrix_stats
(query/aggregates.py). Hand-computed expectations over tiny hit sets,
exercising the semantics the oracle entries can't isolate: NULL-skip
weighted_avg, zero-count filter buckets, hits absent from the attribute
table, constant-field correlation, n<2 sampling variants."""

import math

import pytest

from openmatch_spark.query import (
    hit_extended_stats,
    hit_filters,
    hit_missing,
    hit_value_count,
    hit_weighted_avg,
    matrix_stats,
)


@pytest.fixture(scope="module")
def run(spark):
    return spark.createDataFrame(
        [("q1", "a"), ("q1", "b"), ("q1", "c"), ("q2", "a"), ("q2", "z")],
        "query_id string, doc_id string",
    )


@pytest.fixture(scope="module")
def docs(spark):
    # doc z is deliberately ABSENT (hit hydration edge); doc c has NULL v,
    # doc b has NULL w and NULL lang
    return spark.createDataFrame(
        [("a", 1.0, 2.0, "en"), ("b", 3.0, None, None), ("c", None, 4.0, "de")],
        "doc_id string, v double, w double, lang string",
    )


def test_extended_stats_population_and_sampling(spark, run, docs):
    rows = {r["query_id"]: r for r in
            hit_extended_stats(run, docs, ["v"]).collect()}
    q1 = rows["q1"]  # values {1, 3}; c's NULL excluded
    assert q1["n"] == 2 and q1["min"] == 1.0 and q1["max"] == 3.0
    assert q1["avg"] == 2.0 and q1["sum"] == 4.0
    assert q1["sum_of_squares"] == 10.0
    assert q1["variance"] == 1.0              # population
    assert q1["variance_sampling"] == 2.0     # n/(n-1) rescale
    assert q1["std_deviation"] == 1.0
    assert abs(q1["std_deviation_sampling"] - math.sqrt(2)) < 1e-12
    assert q1["std_upper"] == 4.0 and q1["std_lower"] == 0.0  # avg ± 2σ
    q2 = rows["q2"]  # single value 1.0 (z absent from docs)
    assert q2["n"] == 1 and q2["variance"] == 0.0
    assert q2["variance_sampling"] is None    # undefined at n=1, not NaN
    assert q2["std_deviation_sampling"] is None


def test_weighted_avg_skip_and_missing_defaults(spark, run, docs):
    # ES skip semantics: a NULL value (or weight) drops the hit entirely
    skip = {r["query_id"]: r["weighted_avg"] for r in
            hit_weighted_avg(run, docs, "v", "w").collect()}
    assert skip["q1"] == 1.0  # only a=(1,2) valid: 2/2
    assert skip["q2"] == 1.0
    # missing defaults substitute instead of skipping
    subst = {r["query_id"]: r["weighted_avg"] for r in
             hit_weighted_avg(run, docs, "v", "w",
                              value_missing=0.0, weight_missing=1.0).collect()}
    # q1: a=(1,2) b=(3,->1) c=(->0,4): (2+3+0)/(2+1+4)
    assert abs(subst["q1"] - 5.0 / 7.0) < 1e-12


def test_value_count_and_missing_complement(spark, run, docs):
    vc = {(r["query_id"], r["facet"]): r["value_count"] for r in
          hit_value_count(run, docs, ["v", "lang"]).collect()}
    miss = {(r["query_id"], r["facet"]): r["n_missing"] for r in
            hit_missing(run, docs, ["v", "lang"]).collect()}
    assert vc[("q1", "v")] == 2 and miss[("q1", "v")] == 1
    assert vc[("q1", "lang")] == 2 and miss[("q1", "lang")] == 1
    # q2 hits {a, z}; z is absent from the attribute table -> missing
    assert vc[("q2", "v")] == 1 and miss[("q2", "v")] == 1
    # complement invariant: value_count + missing == hit count
    for qid, n in (("q1", 3), ("q2", 2)):
        for facet in ("v", "lang"):
            assert vc[(qid, facet)] + miss[(qid, facet)] == n


def test_filters_zero_buckets_and_null_predicates(spark, run, docs):
    out = {(r["query_id"], r["facet"]): r["n"] for r in
           hit_filters(run, docs, {"big": "v >= 3", "en": "lang = 'en'"})
           .collect()}
    # every named bucket appears for every query, zeros included
    assert set(out) == {("q1", "big"), ("q1", "en"), ("q2", "big"), ("q2", "en")}
    assert out[("q1", "big")] == 1  # b only; c's NULL v folds to false
    assert out[("q1", "en")] == 1   # b's NULL lang folds to false
    assert out[("q2", "big")] == 0  # zero-count bucket still emitted


def test_matrix_stats_moments_and_constant_field(spark):
    docs = spark.createDataFrame(
        [("a", 1.0, 2.0), ("b", 2.0, 4.0), ("c", 3.0, 6.0),
         ("d", 5.0, 5.0), ("e", None, 9.0)],
        "doc_id string, x double, y double",
    )
    run = spark.createDataFrame(
        [("q1", d) for d in "abce"] + [("q2", "a"), ("q2", "d")],
        "query_id string, doc_id string",
    )
    out = {(r["query_id"], r["field_x"], r["field_y"]): r for r in
           matrix_stats(run, docs, ["x", "y"]).collect()}
    # e has NULL x -> ES row-drop: the WHOLE hit leaves the matrix, so q1
    # reduces to {a,b,c}: x={1,2,3}, y={2,4,6}
    d_xy = out[("q1", "x", "y")]
    assert d_xy["n"] == 3
    assert abs(d_xy["covariance"] - 4.0 / 3.0) < 1e-12
    assert abs(d_xy["correlation"] - 1.0) < 1e-12
    assert d_xy["skewness_x"] == 0.0
    assert abs(d_xy["kurtosis_x"] - (-1.5)) < 1e-12  # excess, 2-pt-ish flat
    # symmetric covariance, and mean_x tracks the row's x field
    assert out[("q1", "y", "x")]["covariance"] == d_xy["covariance"]
    assert out[("q1", "y", "x")]["mean_x"] == 4.0
    # diagonal: covariance == population variance, correlation exactly 1
    assert abs(out[("q1", "x", "x")]["covariance"] - 2.0 / 3.0) < 1e-12
    assert out[("q1", "x", "x")]["correlation"] == 1.0


def test_matrix_stats_constant_field_null_correlation(spark):
    docs = spark.createDataFrame(
        [("a", 1.0, 7.0), ("b", 2.0, 7.0)],
        "doc_id string, x double, y double",
    )
    run = spark.createDataFrame(
        [("q1", "a"), ("q1", "b")], "query_id string, doc_id string"
    )
    out = {(r["field_x"], r["field_y"]): r for r in
           matrix_stats(run, docs, ["x", "y"]).collect()}
    # y is constant: correlation must be NULL (never NaN), skewness/kurtosis
    # of y undefined, covariance well-defined (0)
    assert out[("x", "y")]["correlation"] is None
    assert out[("x", "y")]["covariance"] == 0.0
    assert out[("y", "y")]["correlation"] is None
    assert out[("y", "x")]["skewness_x"] is None
    assert out[("y", "x")]["kurtosis_x"] is None


def test_validation_errors(spark, run, docs):
    with pytest.raises(ValueError):
        hit_extended_stats(run, docs, [])
    with pytest.raises(ValueError):
        hit_filters(run, docs, {})
    with pytest.raises(ValueError):
        matrix_stats(run, docs, ["v"])


# ---------------------------------------------------------------- bucket aggs

@pytest.fixture(scope="module")
def fdocs(spark):
    return spark.createDataFrame(
        [("a", "en", "s1", 100.0), ("b", "en", "s1", 500.0),
         ("c", "de", "s2", 500.0), ("d", None, "s1", 50.0)],
        "doc_id string, lang string, source string, n double",
    )


@pytest.fixture(scope="module")
def frun(spark):
    return spark.createDataFrame(
        [("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3), ("q1", "d", 4),
         ("q2", "a", 1)],
        "query_id string, doc_id string, rank int",
    )


def test_adjacency_matrix_pairs_and_empty_omission(spark, frun, fdocs):
    from openmatch_spark.operators.facets import adjacency_matrix_facets

    out = {(r["query_id"], r["key"]): r["n_docs"] for r in
           adjacency_matrix_facets(
               frun, fdocs,
               {"en": "lang='en'", "big": "n>=400", "s1": "source='s1'"}
           ).collect()}
    assert out[("q1", "s1")] == 3          # d's NULL lang doesn't block s1
    assert out[("q1", "big&en")] == 1      # sorted-name pair key
    assert out[("q1", "en&s1")] == 2
    assert ("q1", "big&s1") in out and out[("q1", "big&s1")] == 1
    assert ("q2", "big") not in out        # empty buckets omitted
    assert ("q2", "big&en") not in out


def test_adjacency_matrix_separator_guard(spark, frun, fdocs):
    from openmatch_spark.operators.facets import adjacency_matrix_facets

    with pytest.raises(ValueError):
        adjacency_matrix_facets(frun, fdocs, {"a&b": "n>0"})


def test_multi_terms_excludes_null_components(spark, frun, fdocs):
    from openmatch_spark.operators.facets import multi_terms_facets

    rows = multi_terms_facets(frun, fdocs, ["lang", "source"], size=2).collect()
    got = {(r["query_id"], r["pos"]): (r["key"], r["n_docs"]) for r in rows}
    assert got[("q1", 1)] == ("en|s1", 2)  # d (NULL lang) excluded entirely
    assert got[("q1", 2)] == ("de|s2", 1)


def test_rare_terms_tail_only(spark, frun, fdocs):
    from openmatch_spark.operators.facets import rare_terms_facets

    rows = rare_terms_facets(frun, fdocs, ["lang", "source"]).collect()
    got = {(r["query_id"], r["facet"], r["value"]) for r in rows}
    # en (2 docs) and s1 (3 docs) are head; NULL lang excluded
    assert got == {("q1", "lang", "de"), ("q1", "source", "s2"),
                   ("q2", "lang", "en"), ("q2", "source", "s1")}


def test_diversified_sample_caps_per_value(spark, frun, fdocs):
    from openmatch_spark.operators.facets import diversified_sample

    rows = diversified_sample(frun, fdocs, "source",
                              shard_size=2, max_docs_per_value=1).collect()
    got = [(r["query_id"], r["doc_id"], r["sample_rank"])
           for r in sorted(rows, key=lambda r: (r["query_id"], r["sample_rank"]))]
    # q1: a (s1, rank 1) then c (s2, rank 3); b and d lose the s1 slot
    assert got == [("q1", "a", 1), ("q1", "c", 2), ("q2", "a", 1)]


def test_diversified_sample_absent_doc_competes_as_null(spark, fdocs):
    from openmatch_spark.operators.facets import diversified_sample

    run = spark.createDataFrame(
        [("q1", "zz", 1), ("q1", "a", 2)],  # zz absent from the attr table
        "query_id string, doc_id string, rank int",
    )
    rows = diversified_sample(run, fdocs, "source",
                              shard_size=5, max_docs_per_value=1).collect()
    # zz hydrates to the NULL bucket and still competes (rank 1 survives)
    assert {(r["doc_id"], r["sample_rank"]) for r in rows} == {("zz", 1), ("a", 2)}


# ------------------------------------------- percentile_ranks / top_metrics

def test_percentile_ranks_exact_and_null_exclusion(spark, run, docs):
    from openmatch_spark.query import hit_percentile_ranks

    out = {(r["query_id"], r["value"]): r["percent"] for r in
           hit_percentile_ranks(run, docs, "v", (1.0, 2.0, 3.0)).collect()}
    # q1 non-null v = {1, 3} (c's NULL excluded from num AND den)
    assert out[("q1", 1.0)] == 50.0
    assert out[("q1", 2.0)] == 50.0
    assert out[("q1", 3.0)] == 100.0
    # q2 = {1} (z absent from docs)
    assert out[("q2", 1.0)] == 100.0


def test_percentile_ranks_all_null_group(spark):
    from openmatch_spark.query import hit_percentile_ranks

    run = spark.createDataFrame([("q1", "a")], "query_id string, doc_id string")
    docs = spark.createDataFrame([("a", None)], "doc_id string, v double")
    rows = hit_percentile_ranks(run, docs, "v", (5.0,)).collect()
    assert len(rows) == 1 and rows[0]["percent"] is None


def test_top_metrics_sort_ties_and_nulls_last(spark):
    from openmatch_spark.query import top_metrics

    run = spark.createDataFrame(
        [("q1", d) for d in "abcd"], "query_id string, doc_id string"
    )
    docs = spark.createDataFrame(
        [("a", 5.0, "en"), ("b", 9.0, "de"), ("c", 9.0, "fr"), ("d", None, "xx")],
        "doc_id string, s double, lang string",
    )
    rows = top_metrics(run, docs, "s", ["lang"], ascending=False, size=3).collect()
    got = [(r["pos"], r["sort_value"], r["lang"])
           for r in sorted(rows, key=lambda r: r["pos"])]
    # ties break doc_id ASC (b before c); NULL sort value only fills the tail
    assert got == [(1, 9.0, "de"), (2, 9.0, "fr"), (3, 5.0, "en")]


def test_geo_bounds_and_centroid_null_skip(spark):
    from openmatch_spark.operators.geo import geo_bounds, geo_centroid

    pts = spark.createDataFrame(
        [("g", 10.0, 20.0), ("g", -5.0, 40.0), ("g", None, 99.0), ("h", None, None)],
        "k string, lat double, lon double",
    )
    b = {r["k"]: r for r in geo_bounds(pts, "lat", "lon", ["k"]).collect()}
    # the half-NULL row must not leak its lon into the box
    assert (b["g"]["top"], b["g"]["left"], b["g"]["bottom"], b["g"]["right"]) == \
        (10.0, 20.0, -5.0, 40.0)
    assert b["g"]["n_points"] == 2
    assert b["h"]["top"] is None and b["h"]["n_points"] == 0
    c = {r["k"]: r for r in geo_centroid(pts, "lat", "lon", ["k"]).collect()}
    assert c["g"]["lat"] == 2.5 and c["g"]["lon"] == 30.0 and c["g"]["count"] == 2
    assert c["h"]["lat"] is None and c["h"]["count"] == 0


# ------------------------------------------------------- match_phrase_prefix

def test_phrase_prefix_occurrences_and_guards(spark, tmp_path):
    from openmatch_spark.index import build_index, load_index
    from openmatch_spark.index.positions import build_positions
    from openmatch_spark.query import search_phrase_prefix

    d = str(tmp_path / "ppidx")
    docs = spark.createDataFrame(
        [("d1", "spark streams data fast"),
         ("d2", "spark strategy wins the data game"),
         ("d3", "streams spark no phrase here"),        # wrong order
         ("d4", "spark stronghold spark streams twice spark streams"),
         ("d5", "totally unrelated text")],
        "url string, text string",
    )
    build_index(spark, docs, d, num_shards=2)
    build_positions(spark, docs, d)
    idx = load_index(spark, d)
    q = spark.createDataFrame(
        [("q1", "spark str"), ("q2", "data ga"),
         ("q3", "spark zzz"), ("q4", "xx yy")],
        "query_id string, text string",
    )
    rows = search_phrase_prefix(idx, q, k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r["phrase_freq"]
    # three expansions of "str" but d3's "streams spark" is out of order;
    # d4 counts stronghold + streams + streams = 3 occurrences
    assert by_q["q1"] == {"d1": 1, "d2": 1, "d4": 3}
    assert by_q["q2"] == {"d2": 1}
    assert "q3" not in by_q          # no expansion of zzz
    assert "q4" not in by_q          # OOV exact token
    # a single-token phrase_prefix is search_prefix's job
    one = spark.createDataFrame([("q", "spar")], "query_id string, text string")
    with pytest.raises(ValueError):
        search_phrase_prefix(idx, one)


# --------------------------------------------- histogram densification

def test_histogram_min_doc_count_zero_fills_gaps(spark):
    from openmatch_spark.operators.facets import histogram_facets

    run = spark.createDataFrame(
        [("q1", "a"), ("q1", "b")], "query_id string, doc_id string"
    )
    docs = spark.createDataFrame(
        [("a", 10.0), ("b", 310.0)], "doc_id string, v double"
    )
    rows = histogram_facets(run, docs, {"v": 100.0}, min_doc_count=0).collect()
    got = {r["bucket_lo"]: r["n_docs"] for r in rows}
    # gap buckets 100 and 200 appear with zero counts
    assert got == {0.0: 1, 100.0: 0, 200.0: 0, 300.0: 1}


def test_histogram_extended_bounds_and_guards(spark):
    from openmatch_spark.operators.facets import histogram_facets

    run = spark.createDataFrame([("q1", "a")], "query_id string, doc_id string")
    docs = spark.createDataFrame([("a", 150.0)], "doc_id string, v double")
    rows = histogram_facets(
        run, docs, {"v": 100.0},
        min_doc_count=0, extended_bounds={"v": (0.0, 350.0)},
    ).collect()
    got = {r["bucket_lo"]: r["n_docs"] for r in rows}
    # bounds snap to bucket edges: 0..300 forced, datum at 100
    assert got == {0.0: 0, 100.0: 1, 200.0: 0, 300.0: 0}
    with pytest.raises(ValueError):
        histogram_facets(run, docs, {"v": 100.0},
                         min_doc_count=1, extended_bounds={"v": (0, 1)})


def test_histogram_min_doc_count_filter_and_fractional_width(spark):
    from openmatch_spark.operators.facets import histogram_facets

    run = spark.createDataFrame(
        [("q1", d) for d in "abc"], "query_id string, doc_id string"
    )
    docs = spark.createDataFrame(
        [("a", 0.1), ("b", 0.2), ("c", 0.95)], "doc_id string, v double"
    )
    # min_doc_count=2 keeps only the first bucket (2 docs)
    rows = histogram_facets(run, docs, {"v": 0.3}, min_doc_count=2).collect()
    assert len(rows) == 1 and rows[0]["n_docs"] == 2
    # fractional width densified: grid keys must land on the count keys
    dense = histogram_facets(run, docs, {"v": 0.3}, min_doc_count=0).collect()
    assert sum(r["n_docs"] for r in dense) == 3
    assert len(dense) == 4  # ordinals 0..3 for values in [0, 0.95]


# ------------------------------------------------------------ function_score

def test_function_score_modes_and_neutral(spark):
    import math

    from openmatch_spark.query import function_score

    run = spark.createDataFrame(
        [("q1", "a", 2.0), ("q1", "b", 1.0), ("q1", "c", 3.0)],
        "query_id string, doc_id string, score double",
    )
    docs = spark.createDataFrame(
        [("a", "en", 100.0), ("b", "de", None), ("c", "en", None)],
        "doc_id string, lang string, views double",
    )
    out = {r["doc_id"]: r["score"] for r in function_score(
        run, docs,
        [{"kind": "weight", "weight": 2.0, "filter": "lang='en'"},
         {"kind": "field_value_factor", "field": "views", "factor": 0.1,
          "modifier": "log1p", "missing": 10.0}],
        score_mode="sum", boost_mode="multiply",
    ).collect()}
    assert abs(out["a"] - 2 * (2 + math.log1p(10.0))) < 1e-12
    assert abs(out["b"] - math.log1p(1.0)) < 1e-12        # weight not matching
    assert abs(out["c"] - 3 * (2 + math.log1p(1.0))) < 1e-12
    # no matching function -> neutral 1 regardless of score_mode
    neutral = {r["doc_id"]: r["score"] for r in function_score(
        run, docs, [{"kind": "weight", "weight": 5.0, "filter": "lang='xx'"}],
        score_mode="multiply", boost_mode="multiply",
    ).collect()}
    assert neutral == {"a": 2.0, "b": 1.0, "c": 3.0}
    # boost_mode variants on a fixed fs=2 (weight matching everywhere)
    fns = [{"kind": "weight", "weight": 2.0}]
    for mode, expect_a in (("sum", 4.0), ("replace", 2.0), ("avg", 2.0),
                           ("max", 2.0), ("min", 2.0)):
        got = {r["doc_id"]: r["score"] for r in
               function_score(run, docs, fns, boost_mode=mode).collect()}
        assert got["a"] == expect_a, mode
    # score_mode first / max / min over two weights
    two = [{"kind": "weight", "weight": 3.0}, {"kind": "weight", "weight": 5.0}]
    for mode, fs in (("first", 3.0), ("max", 5.0), ("min", 3.0),
                     ("avg", 4.0), ("multiply", 15.0), ("sum", 8.0)):
        got = {r["doc_id"]: r["score"] for r in
               function_score(run, docs, two, score_mode=mode,
                              boost_mode="replace").collect()}
        assert got["a"] == fs, mode


def test_function_score_random_and_decay(spark):
    from openmatch_spark.query import function_score

    run = spark.createDataFrame(
        [("q1", "a", 1.0), ("q1", "b", 1.0)],
        "query_id string, doc_id string, score double",
    )
    docs = spark.createDataFrame(
        [("a", 10.0), ("b", 110.0)], "doc_id string, age double"
    )
    # random: deterministic in [0,1), distinct per doc, stable across runs
    r1 = {r["doc_id"]: r["score"] for r in function_score(
        run, docs, [{"kind": "random_score", "seed": 7}],
        boost_mode="replace").collect()}
    r2 = {r["doc_id"]: r["score"] for r in function_score(
        run, docs, [{"kind": "random_score", "seed": 7}],
        boost_mode="replace").collect()}
    assert r1 == r2 and all(0.0 <= v < 1.0 for v in r1.values())
    assert r1["a"] != r1["b"]
    # decay inside the combiner: doc AT scale distance scores decay=0.5
    d = {r["doc_id"]: r["score"] for r in function_score(
        run, docs,
        [{"kind": "decay", "decay_kind": "gauss", "field": "age",
          "origin": 10.0, "scale": 100.0, "decay": 0.5}],
        boost_mode="replace").collect()}
    assert d["a"] == 1.0 and abs(d["b"] - 0.5) < 1e-12
    with pytest.raises(ValueError):
        function_score(run, docs, [], score_mode="sum")
    with pytest.raises(ValueError):
        function_score(run, docs, [{"kind": "weight"}], score_mode="nope")


# ------------------------------------------------- significance heuristics

def test_significance_heuristics_hand_checked(spark):
    from openmatch_spark.query.significant import significant_terms

    docs = spark.createDataFrame(
        [("a", "apple banana"), ("b", "apple cherry"),
         ("c", "apple banana"), ("d", "durian")],
        "doc_id string, text string",
    )
    run = spark.createDataFrame(
        [("q1", "a"), ("q1", "c")], "query_id string, doc_id string"
    )

    def scores(h):
        return {r["term"]: r["score"] for r in
                significant_terms(run, docs, n=5, min_doc_count=2,
                                  heuristic=h).collect()}

    # apple: f11=2 f10=1 f01=0 f00=1 (fg 2/2, bg 3/4)
    assert abs(scores("lift")["apple"] - 4.0 / 3.0) < 1e-12
    assert abs(scores("jlh")["apple"] - 0.25 * 4.0 / 3.0) < 1e-12
    assert abs(scores("chi_square")["apple"] - 16.0 / 12.0) < 1e-12
    assert abs(scores("percentage")["apple"] - 2.0 / 3.0) < 1e-12
    # banana: perfectly associated balanced 2x2 -> exactly 1 bit of MI
    mi = scores("mutual_information")
    assert abs(mi["banana"] - 1.0) < 1e-12
    import math
    expect_apple = (0.5 * math.log2(0.5 / 0.375)
                    + 0.25 * math.log2(0.25 / 0.375)
                    + 0.25 * math.log2(0.25 / 0.125))
    assert abs(mi["apple"] - expect_apple) < 1e-12
    with pytest.raises(ValueError):
        significant_terms(run, docs, heuristic="gnd")


# -------------------------------------------------------- auto_date_histogram

def test_auto_date_histogram_picks_finest_fitting_rung(spark):
    from datetime import datetime, timedelta

    from openmatch_spark.operators.facets import auto_date_histogram_facets

    base = datetime(2024, 3, 1)
    docs = spark.createDataFrame(
        [("d%02d" % i, base + timedelta(hours=i * 5)) for i in range(24)]
        + [("dn", None)],
        "doc_id string, ts timestamp",
    )
    run = spark.createDataFrame(
        [("q1", "d%02d" % i) for i in range(24)]
        + [("q2", "d00"), ("q2", "d01"), ("q2", "dn")],
        "query_id string, doc_id string",
    )
    rows = auto_date_histogram_facets(run, docs, "ts", target_buckets=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # q1: 24 distinct hours (>10) but 5 days -> 'day'; counts 5+5+5+5+4
    assert {r["interval"] for r in by_q["q1"]} == {"day"}
    assert sorted(r["n_docs"] for r in by_q["q1"]) == [4, 5, 5, 5, 5]
    # q2: 2 hits -> finest rung fits; NULL-ts hit dropped (ES missing rule)
    assert {r["interval"] for r in by_q["q2"]} == {"minute"}
    assert sum(r["n_docs"] for r in by_q["q2"]) == 2
    with pytest.raises(ValueError):
        auto_date_histogram_facets(run, docs, "ts", target_buckets=0)


# ----------------------------------------------------- span_first / span_not

def test_span_first_and_span_not(spark, tmp_path):
    from openmatch_spark.index import build_index, load_index
    from openmatch_spark.index.positions import build_positions
    from openmatch_spark.query import search_span_first, search_span_not

    d = str(tmp_path / "spanidx")
    docs = spark.createDataFrame(
        [("d1", "java tutorial free java download"),
         ("d2", "free java runtime"),
         ("d3", "java in the lead position here"),
         ("d4", "trailing mention of java only at the end java")],
        "url string, text string",
    )
    build_index(spark, docs, d, num_shards=2)
    build_positions(spark, docs, d)
    idx = load_index(spark, d)
    q = spark.createDataFrame([("q1", "java")], "query_id string, text string")

    sf = {r["doc_id"]: r["first_pos"] for r in
          search_span_first(idx, q, end=2, k=10).collect()}
    # d4's javas sit at 3 and 8 — outside the first 2 positions
    assert sf == {"d1": 0, "d2": 1, "d3": 0}

    ex = spark.createDataFrame([("q1", "free")], "query_id string, text string")
    sn = {r["doc_id"]: r["kept_occurrences"] for r in
          search_span_not(idx, q, ex, pre=1, post=0, k=10).collect()}
    # d1: java@0 survives, java@3 killed by free@2 (pre window);
    # d2: its only java is adjacent to free -> doc absent entirely
    assert sn == {"d1": 1, "d3": 1, "d4": 2}
    # no exclude rows for the query -> all occurrences survive
    no_ex = spark.createDataFrame([], "query_id string, text string")
    all_kept = {r["doc_id"]: r["kept_occurrences"] for r in
                search_span_not(idx, q, no_ex, pre=1, post=1, k=10).collect()}
    assert all_kept == {"d1": 2, "d2": 1, "d3": 1, "d4": 2}
    with pytest.raises(ValueError):
        search_span_first(idx, q, end=0)
    with pytest.raises(ValueError):
        search_span_not(idx, q, ex, pre=-1)


# ---------------------------------------------------------------- terms_set

def test_terms_set_per_doc_threshold(spark, tmp_path):
    from openmatch_spark.index import build_index, load_index
    from openmatch_spark.query import search_terms_set

    d = str(tmp_path / "tsidx")
    docs = spark.createDataFrame(
        [("d1", "red green blue"), ("d2", "red green"),
         ("d3", "red yellow thing"), ("d4", "unrelated words"),
         ("d5", "red green blue extra")],
        "url string, text string",
    )
    build_index(spark, docs, d, num_shards=2)
    idx = load_index(spark, d)
    msm = spark.createDataFrame(
        [("d1", 3), ("d2", 2), ("d3", 2), ("d4", 1), ("d5", None)],
        "doc_id string, msm int",
    )
    q = spark.createDataFrame(
        [("q1", "red green blue")], "query_id string, text string"
    )
    rows = {r["doc_id"]: (r["n_matched"], r["msm_required"]) for r in
            search_terms_set(idx, q, msm, "msm", k=10).collect()}
    # d3 matches 1 < 2 -> out; d4 matches 0 -> never a candidate;
    # d5 has NULL msm -> the field is the contract, out
    assert rows == {"d1": (3, 3), "d2": (2, 2)}
    # msm clamps up to 1: a 0/negative threshold behaves like 1
    msm0 = spark.createDataFrame([("d3", 0)], "doc_id string, msm int")
    rows0 = {r["doc_id"] for r in
             search_terms_set(idx, q, msm0, "msm", k=10).collect()}
    assert rows0 == {"d3"}


# --------------------------------------------------- pinned / rank_feature

def test_search_pinned_order_and_missing_doc(spark):
    from openmatch_spark.query import search_pinned

    run = spark.createDataFrame(
        [("q1", "a", 3.0), ("q1", "b", 2.0), ("q1", "c", 1.0)],
        "query_id string, doc_id string, score double",
    )
    pins = spark.createDataFrame(
        [("q1", "c", 1), ("q1", "zz", 2)],
        "query_id string, doc_id string, pin_order int",
    )
    rows = [(r["doc_id"], r["rank"], r["pinned"], r["score"]) for r in
            search_pinned(run, pins).orderBy("rank").collect()]
    # pinned block first in pin order (c even though lowest-scored, then
    # the id-fetched zz with NULL score), organic tail deduped
    assert rows == [("c", 1, True, 1.0), ("zz", 2, True, None),
                    ("a", 3, False, 3.0), ("b", 4, False, 2.0)]


def test_rank_feature_functions(spark):
    from openmatch_spark.query import function_score

    run = spark.createDataFrame(
        [("q1", "a", 1.0), ("q1", "b", 1.0), ("q1", "c", 1.0)],
        "query_id string, doc_id string, score double",
    )
    docs = spark.createDataFrame(
        [("a", 4.0), ("b", None), ("c", 12.0)], "doc_id string, pr double"
    )

    def rf(spec):
        return {r["doc_id"]: r["score"] for r in function_score(
            run, docs, [spec], boost_mode="replace").collect()}

    sat = rf({"kind": "rank_feature", "field": "pr",
              "function": "saturation", "pivot": 4.0})
    assert sat == {"a": 0.5, "b": 0.0, "c": 0.75}  # NULL feature -> 0
    sig = rf({"kind": "rank_feature", "field": "pr",
              "function": "sigmoid", "pivot": 4.0, "exponent": 2.0})
    assert abs(sig["c"] - 144.0 / 160.0) < 1e-12
    import math
    log = rf({"kind": "rank_feature", "field": "pr",
              "function": "log", "scaling_factor": 1.0})
    assert abs(log["c"] - math.log(13.0)) < 1e-12
    with pytest.raises(ValueError):
        rf({"kind": "rank_feature", "field": "pr",
            "function": "saturation", "pivot": 0.0})
    with pytest.raises(ValueError):
        rf({"kind": "rank_feature", "field": "pr", "function": "nope"})
