"""frequent_item_sets: level-wise apriori over (field, value) items."""

import pytest

import pyspark.sql.functions as F


def _df(spark):
    rows = [
        ("d1", "a", True), ("d2", "a", True), ("d3", "a", True),
        ("d4", "a", False), ("d5", None, False),
    ]
    # encode the fixture as two fields: f (a / NULL) and g (x / y)
    return spark.createDataFrame(
        [("d1", "a", "x"), ("d2", "a", "x"), ("d3", "a", "x"),
         ("d4", "a", "y"), ("d5", None, "y")],
        "doc_id string, f string, g string",
    )


def test_frequent_item_sets_apriori(spark):
    from openmatch_spark.operators.itemsets import frequent_item_sets

    # items: f:a in d1-d4 (4); g:x in d1-d3 (3); g:y in d4,d5 (2)
    # thr = 0.5 * 5 = 2.5 -> L1 = {f:a, g:x}; pairs: (f:a, g:x) = 3 OK,
    # (f:a, g:y) = 1 (g:y not even in L1)
    out = {r["items"]: (r["set_size"], r["doc_count"], r["support"],
                        r["rank"])
           for r in frequent_item_sets(
               _df(spark), {"f": "f", "g": "g"}, minimum_support=0.5,
           ).collect()}
    assert out == {
        "f:a": (1, 4, 0.8, 1),
        "f:a,g:x": (2, 3, 0.6, 2),   # ties at 3 break items ASC
        "g:x": (1, 3, 0.6, 3),
    }


def test_frequent_item_sets_min_set_size_and_validation(spark):
    from openmatch_spark.operators.itemsets import frequent_item_sets

    only_pairs = frequent_item_sets(
        _df(spark), {"f": "f", "g": "g"}, minimum_support=0.5,
        minimum_set_size=2,
    ).collect()
    assert [(r["items"], r["rank"]) for r in only_pairs] == [("f:a,g:x", 1)]
    # a threshold nothing clears -> empty, no error
    assert frequent_item_sets(
        _df(spark), {"f": "f"}, minimum_support=0.99).count() == 0
    with pytest.raises(ValueError):
        frequent_item_sets(_df(spark), {})
    with pytest.raises(ValueError):
        frequent_item_sets(_df(spark), {"f": "f"}, minimum_support=0.0)
    with pytest.raises(ValueError):
        frequent_item_sets(_df(spark), {"f": "f"}, minimum_set_size=3,
                           max_set_size=2)


def test_frequent_item_sets_three_levels(spark):
    from openmatch_spark.operators.itemsets import frequent_item_sets

    # every doc carries all three items -> the triple survives
    df = spark.createDataFrame(
        [(str(i), "a", "b", "c") for i in range(4)],
        "doc_id string, f string, g string, h string",
    )
    out = {r["items"]: r["doc_count"] for r in frequent_item_sets(
        df, {"f": "f", "g": "g", "h": "h"}, minimum_support=0.9,
    ).collect()}
    assert out["f:a,g:b,h:c"] == 4
    assert len(out) == 7  # 3 singles + 3 pairs + 1 triple
